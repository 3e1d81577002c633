"""Test config: force CPU backend with 8 virtual devices so mesh/sharding
paths are exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must be set before jax initializes its backend. Force CPU: the ambient
# environment may point JAX_PLATFORMS at a real accelerator.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
