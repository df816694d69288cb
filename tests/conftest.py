"""Hermetic CPU test setup.

The reference's tests need a GPU (SURVEY.md §4); here everything runs on CPU
with 8 virtual devices so sharding tests work on any machine (and in CI).

Note: this environment's sitecustomize force-registers the axon TPU backend
and overwrites JAX_PLATFORMS, so the env var alone is not enough — we must
also flip jax_platforms after import, before any device is touched.
"""

import os

# must be set before jax import (virtual CPU mesh for sharding tests)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 tests compare against torch fp32 oracles bit-tight; never let a
# backend relax matmul precision under us
jax.config.update("jax_default_matmul_precision", "highest")
