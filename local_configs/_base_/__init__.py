"""Root config base (reference surface: local_configs/_base_/__init__.py).

Unlike the reference's shared-mutable-global `C` cascade, each config module
here builds a fresh AttrDict — importing two configs can't cross-pollute —
while exposing the same dotted-path + `C` attribute surface.
"""

import os
import os.path as osp

from dformer_tpu.config import AttrDict


def base_config() -> AttrDict:
    C = AttrDict()
    C.seed = 8964
    C.root_dir = os.environ.get("DFORMER_DATA_ROOT", "datasets")
    C.abs_dir = osp.realpath(".")
    return C
