"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run without TPUs (the 'fake backend' per SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
