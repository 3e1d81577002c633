"""wandb logging hook for the FSS driver — counterpart of the reference's
wandb usage in utils/train_trav_fss_v1.py:240-241,443-456.

wandb is optional (not in the base image): WandbHook degrades to a no-op
when the package is missing or cfg.use_wandb is false, so drivers can call
it unconditionally. Rank-0 only, like the reference's logger.
"""

from typing import Optional


class WandbHook:
    def __init__(self, cfg, enabled: Optional[bool] = None, rank: int = 0,
                 project: str = "dformer-tpu", logger=None):
        want = cfg.get("use_wandb", False) if enabled is None else enabled
        self._run = None
        if not want or rank != 0:
            return
        try:
            import wandb

            self._run = wandb.init(
                project=cfg.get("wandb_project", project),
                name=cfg.get("wandb_run_name"),
                config={k: v for k, v in dict(cfg).items()
                        if isinstance(v, (int, float, str, bool, list))})
        except Exception as e:  # package missing / offline init failure
            if logger:
                logger.info(f"wandb disabled: {e}")

    def log(self, metrics: dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_fss_eval(self, epoch: int, metrics):
        """Reference metric dict shape (train_trav_fss_v1.py:443-456), with
        per-class series logged as individual scalars — wandb stringifies a
        list logged under one key, which silently breaks the series."""
        if self._run is None:
            return
        ious, miou = metrics.compute_iou()
        acc, macc = metrics.compute_pixel_acc()
        f1, mf1 = metrics.compute_f1()
        payload = {"epoch": epoch, "mIoU": miou, "mean Acc": macc,
                   "mean F1": mf1}
        for c, (i, a, f) in enumerate(zip(ious, acc, f1)):
            payload[f"IoU_cls_{c}"] = float(i)
            payload[f"Acc_cls_{c}"] = float(a)
            payload[f"F1_cls_{c}"] = float(f)
        self.log(payload)

    def finish(self):
        if self._run is not None:
            self._run.finish()
