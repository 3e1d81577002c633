"""Config system.

Keeps the reference's public surface — a dotted module path (e.g.
`local_configs.NYUDepthv2.DFormer_Large`) whose attribute `C` is an
attribute-dict with the same field names (reference:
local_configs/_base_/__init__.py:9-16 and utils/train.py:117) — but
construction is pure: no mkdir / timestamp side effects at import
(the reference creates log dirs on import, NYUDepthv2/DFormer_Large.py:40-53;
here directories are created lazily by the runtime engine).
"""

import copy
import time
from importlib import import_module


class AttrDict(dict):
    """EasyDict-compatible: attribute access + recursive dict wrapping."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, AttrDict):
            v = AttrDict(v)
        elif isinstance(v, (list, tuple)):
            v = type(v)(AttrDict(i) if isinstance(i, dict) else i for i in v)
        super().__setitem__(k, v)

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __delattr__(self, k):
        del self[k]

    def copy(self):
        return copy.deepcopy(self)


def load_config(path: str) -> AttrDict:
    """Load `C` from a dotted config module path (reference utils/train.py:117)."""
    module = import_module(path)
    return getattr(module, "C").copy()


def finalize_run_dirs(cfg: AttrDict, create: bool = True) -> AttrDict:
    """Resolve timestamped log/tb/checkpoint dirs (the side effect the
    reference performs at config import, done here explicitly)."""
    import os
    import os.path as osp

    stamp = time.strftime("%Y%m%d-%H%M%S", time.localtime())
    base = cfg.get("log_dir_base",
                   osp.abspath(f"checkpoints/{cfg.dataset_name}_{cfg.backbone}"))
    cfg.log_dir = f"{base}_{stamp}"
    cfg.tb_dir = osp.join(cfg.log_dir, "tb")
    cfg.checkpoint_dir = osp.join(cfg.log_dir, "checkpoint")
    exp_time = time.strftime("%Y_%m_%d_%H_%M_%S", time.localtime())
    cfg.log_file = osp.join(cfg.log_dir, f"log_{exp_time}.log")
    cfg.val_log_file = osp.join(cfg.log_dir, f"val_{exp_time}.log")
    if create:
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        os.makedirs(cfg.tb_dir, exist_ok=True)
    return cfg
