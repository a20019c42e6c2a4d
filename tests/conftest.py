"""Test harness: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a host-device mesh) and float64 enabled for the oracle path.

The image's sitecustomize registers an `axon` tunneled-TPU backend in every
interpreter and pins jax_platforms="axon,cpu" via jax.config.update — which
overrides the JAX_PLATFORMS env var. Tests must run on local CPU (the tunnel
compiles each program remotely, minutes per test), so the config flag is
re-pointed at "cpu" here, before any array is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
