"""DFormer-TPU: a TPU-native JAX/XLA/Pallas framework for RGB-X semantic
segmentation with the capabilities of the reference PyTorch DFormer stack
(Originofamonia/DFormer; see SURVEY.md).

Layer map (bottom-up):
  - ops/      pure jnp/lax primitives (resize, pooling, norms, losses, metrics)
  - kernels/  Pallas TPU kernels for the hot ops
  - models/   Flax modules: DFormer encoder family, decoder heads, assembly
  - data/     host decode + device-side augmentation pipeline
  - parallel/ device mesh + sharding rules (DP over ICI)
  - train/    train step, optimizer grouping, LR schedules, checkpointing
  - eval/     single-scale / multi-scale+flip / sliding-window evaluation
  - runtime/  engine (distributed init, logging, state)
  - configs   (top-level `local_configs/` package mirrors the reference surface)
"""

__version__ = "0.1.0"
