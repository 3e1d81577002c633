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


def make_local_mesh(data_axis: str = "data") -> Mesh:
    """Mesh over THIS host's devices only — for per-host work like sharded
    evaluation under multi-host training (each host evaluates its own slice
    of the val set; hists merge host-level via
    Metrics.merge_across_processes)."""
    devices = np.array(jax.local_devices())
    return Mesh(devices, (data_axis,))


def commit_global(arr, mesh: Mesh, data_axis: str = "data"):
    """Commit a host-local numpy batch as a GLOBAL batch-sharded array.

    Single-process: plain device_put (the local array IS the global batch).
    Multi-host: each host passes its own batch_size//world slice and the
    result is the concatenated global batch (replacing the reference's
    DistributedSampler + per-rank split, dataloader.py:160-163); a naive
    device_put of a host-local array would NOT form a global array.
    """
    sh = batch_sharding(mesh, data_axis)
    if jax.process_count() == 1:
        return jax.device_put(arr, sh)
    return jax.make_array_from_process_local_data(sh, np.asarray(arr))
