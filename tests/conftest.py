"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise real multi-device code paths without TPU hardware.

Containers with an axon TPU tunnel import jax and register the TPU
backend from sitecustomize at interpreter start — BEFORE this file runs —
and that registration pins jax's platform config to the env's
JAX_PLATFORMS=axon, so setting the env var here is too late for the
config (it still matters for subprocesses). `jax.config.update` wins over
both as long as no backend has been used yet, and XLA_FLAGS is read at
first backend initialization, which also hasn't happened yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (env above must precede any fresh jax import)

jax.config.update("jax_platforms", "cpu")
