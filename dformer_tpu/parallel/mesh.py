"""Device mesh + sharding rules.

The reference's parallelism is single-axis data parallel over NCCL DDP
(SURVEY.md §2.10). TPU-native equivalent: a 1-D (or 2-D, with a trivial
model axis reserved for future TP) `jax.sharding.Mesh` over ICI; the train
step is jitted with batch inputs sharded over the 'data' axis and params
replicated. XLA GSPMD then:
  * computes global batch statistics in BatchNorm (SyncBN for free),
  * inserts the gradient all-reduce in the backward pass (DDP equivalent),
  * psums the metric confusion hists,
so no hand-written collectives are needed on the hot path.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data_axis: str = "data",
              model_axis: Optional[str] = None, model_size: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    if model_axis is None:
        return Mesh(devices.reshape(n), (data_axis,))
    assert n % model_size == 0
    return Mesh(devices.reshape(n // model_size, model_size),
                (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for arrays of any rank."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, data_axis: str = "data") -> dict:
    """Device-put a numpy batch dict with the batch axis sharded."""
    sh = batch_sharding(mesh, data_axis)
    return {k: (jax.device_put(v, sh) if hasattr(v, "shape") else v)
            for k, v in batch.items()}
