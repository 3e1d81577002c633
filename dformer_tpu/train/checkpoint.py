"""Checkpoint save/restore with the reference's retention policy.

Mirrors Engine.save_and_link_checkpoint / restore_checkpoint (reference
utils/engine/engine.py:101-186): save {model, optimizer, epoch, iteration}
when val mIoU improves, keep the best 5 by metric with filenames
`epoch-{E}_miou_{M}`, delete the worst; resume restores params/opt/epoch+1.

Storage is orbax (async-capable, TPU-native) writing one directory per
checkpoint.
"""

import json
import os
import os.path as osp
import re
import shutil
from typing import Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


_NAME_RE = re.compile(r"epoch-(\d+)_miou_([0-9.]+)$")


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5, logger=None):
        self.dir = directory
        self.keep = keep
        self.logger = logger
        os.makedirs(directory, exist_ok=True)
        if _HAS_ORBAX:
            self._ckptr = ocp.StandardCheckpointer()

    def _log(self, msg):
        if self.logger:
            self.logger.info(msg)

    def _existing(self):
        out = []
        for name in os.listdir(self.dir):
            m = _NAME_RE.match(name)
            if m:
                out.append((float(m.group(2)), int(m.group(1)), name))
        return sorted(out)

    def save(self, state, epoch: int, miou: float, extra: Optional[dict] = None):
        name = f"epoch-{epoch}_miou_{round(miou, 2)}"
        path = osp.abspath(osp.join(self.dir, name))
        tree = dict(
            params=jax.device_get(state.params),
            batch_stats=jax.device_get(state.batch_stats),
            opt_state=jax.device_get(state.opt_state),
            step=int(state.step),
        )
        # EVERY process must call save — orbax coordinates the multihost
        # write itself (primary host writes, the rest join its barriers), so
        # a rank gate at the caller would deadlock. Host-side extras (meta
        # json, retention) are process-0 only.
        if _HAS_ORBAX:
            self._ckptr.save(path, tree, force=True)
            self._ckptr.wait_until_finished()
        elif jax.process_index() == 0:  # pragma: no cover
            np.save(path + ".npy", tree, allow_pickle=True)
        if jax.process_index() == 0:
            with open(osp.join(self.dir, name + ".meta.json"), "w") as f:
                json.dump(dict(epoch=epoch, miou=miou, **(extra or {})), f)
        self._log(f"saved checkpoint {name}")

        existing = self._existing() if jax.process_index() == 0 else []
        while len(existing) > self.keep:
            worst = existing.pop(0)
            victim = osp.join(self.dir, worst[2])
            shutil.rmtree(victim, ignore_errors=True)
            meta = victim + ".meta.json"
            if osp.exists(meta):
                os.remove(meta)
            self._log(f"removed worst checkpoint {worst[2]}")
        return path

    def latest(self) -> Optional[Tuple[str, int]]:
        """(path, epoch) of the NEWEST checkpoint by epoch, or None.

        Retention keeps the best-`keep` by metric, but resume must continue
        from the most recent epoch — resuming from best-by-metric would
        silently retrain epochs."""
        existing = self._existing()
        if not existing:
            return None
        newest = max(existing, key=lambda t: t[1])
        return osp.join(self.dir, newest[2]), newest[1]

    def best(self) -> Optional[Tuple[str, int, float]]:
        """(path, epoch, miou) of the best checkpoint by metric, or None."""
        existing = self._existing()
        if not existing:
            return None
        b = existing[-1]
        return osp.join(self.dir, b[2]), b[1], b[0]

    def restore(self, state, path: Optional[str] = None):
        """Restore into a template TrainState; returns (state, epoch+1)."""
        if path is None:
            found = self.latest()
            if found is None:
                return state, 0
            path, epoch = found
        else:
            m = _NAME_RE.search(osp.basename(path))
            epoch = int(m.group(1)) if m else 0
        template = dict(
            params=jax.device_get(state.params),
            batch_stats=jax.device_get(state.batch_stats),
            opt_state=jax.device_get(state.opt_state),
            step=int(state.step),
        )
        if _HAS_ORBAX:
            tree = self._ckptr.restore(osp.abspath(path), template)
        else:  # pragma: no cover
            tree = np.load(path + ".npy", allow_pickle=True).item()
        new_state = state.replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jax.numpy.asarray(tree["step"]))
        self._log(f"restored checkpoint {path} (resume at epoch {epoch + 1})")
        return new_state, epoch + 1
