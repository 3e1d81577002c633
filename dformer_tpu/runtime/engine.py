"""Runtime engine: process/mesh bring-up, seeding, state registry, checkpoint
orchestration — the TPU-native counterpart of the reference Engine
(utils/engine/engine.py:36-199).

Differences by design:
  * NCCL process-group init (engine.py:57-66) becomes
    `jax.distributed.initialize` (multi-host) + a jax.sharding.Mesh; on a
    single host with N chips no process launcher is needed at all.
  * CUDA determinism knobs (utils/train.py:90-111) reduce to one PRNG seed:
    JAX is deterministic given the key threading.
  * checkpoint save/restore delegates to train/checkpoint.py (orbax).
"""

import os
from typing import Optional

import jax
import numpy as np

from dformer_tpu.config import AttrDict, finalize_run_dirs
from dformer_tpu.runtime.logger import get_logger


class Engine:
    def __init__(self, cfg: AttrDict, make_dirs: bool = True,
                 distributed: Optional[bool] = None):
        self.cfg = cfg
        # Multi-host bring-up: follow torchrun-style env vars if present
        # (the reference reads WORLD_SIZE, engine.py:53-54).
        world = int(os.environ.get("WORLD_SIZE", "1"))
        self.distributed = distributed if distributed is not None else world > 1
        if self.distributed and world > 1 and jax.process_count() == 1:
            jax.distributed.initialize()
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.rank = self.process_index
        self.world_size = self.process_count

        if make_dirs and self.rank == 0:
            finalize_run_dirs(cfg, create=True)
        self.logger = get_logger(cfg.get("log_dir"), cfg.get("log_file"),
                                 rank=self.rank)
        self.seed = int(cfg.get("seed", 8964))
        np.random.seed(self.seed)
        self.state = AttrDict(epoch=0, iteration=0)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is not None:
            self.logger.error(
                f"exit with exception {exc_type.__name__}: {exc_val}")
        return False

    def data_shard(self):
        """(rank, world) for host-local data sharding (replaces
        DistributedSampler, dataloader.py:160-163)."""
        return (self.process_index, self.process_count)
