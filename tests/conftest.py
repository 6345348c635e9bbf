"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

The reference has no tests at all (SURVEY.md §4); our strategy is unit-level
numerical parity against torch primitives plus multi-device sharding tests on
a virtual CPU mesh — a capability the torch reference lacks entirely.
"""

import os

# Overwrite, not setdefault: the image presets JAX_PLATFORMS=axon (TPU tunnel),
# and TPU matmuls run bf16-by-default which breaks fp32 parity tolerances.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# torch (OpenMP) + jax threadpools deadlock on the single-core host otherwise.
os.environ.setdefault("OMP_NUM_THREADS", "1")

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which beats the env var — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
