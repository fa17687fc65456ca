"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests use
``--xla_force_host_platform_device_count=8`` exactly as recommended for
validating `Mesh`/`shard_map` programs without real chips.

Note: this image pre-imports jax from a sitecustomize hook (the axon TPU
tunnel), so ``JAX_PLATFORMS`` env mutation here is too late — we must go
through ``jax.config.update``. ``XLA_FLAGS`` is still read lazily at
backend-init time, so the env mutation works as long as no computation ran.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
