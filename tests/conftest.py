"""Test config: force the CPU backend with 8 virtual devices so mesh/sharding
paths are exercised without TPU hardware (SURVEY.md §4 test strategy).

Note: the environment's sitecustomize registers the 'axon' TPU plugin and
programmatically sets jax_platforms, so the JAX_PLATFORMS env var alone is
not enough — we override the config after import, before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch fp32; keep matmuls/convs exact.
jax.config.update("jax_default_matmul_precision", "highest")
