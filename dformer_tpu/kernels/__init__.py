"""Pallas TPU kernels. Import from the submodules directly
(dformer_tpu.kernels.fused_mlp) — re-exporting the
functions here would shadow the submodule names."""
