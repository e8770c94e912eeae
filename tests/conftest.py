"""Test configuration: run JAX on 8 virtual CPU devices.

Must set env vars before the first jax import anywhere in the test process —
conftest.py is imported by pytest before test modules, so this is the place.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Tests compare float32 math against torch/closed-form grids.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon TPU plugin pre-sets jax.config.jax_platforms to "axon,cpu", which
# OVERRIDES the JAX_PLATFORMS env var — force the CPU platform explicitly or
# the whole suite silently runs single-device on the tunneled TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
