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
# silence XLA:CPU AOT-loader feature-mismatch warnings (the persistent
# cache below stores +prefer-no-scatter/-gather pseudo-features that the
# host detector never reports; the load is benign and verified)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# OPT-IN persistent XLA compilation cache (PYPHYSIM_XLA_CACHE=1): warm
# re-runs of the compile-heavy solver tests get several times faster —
# but it is NOT on by default, because this jax build's XLA:CPU AOT
# loader intermittently SEGFAULTS deserializing large cached
# executables (observed repeatedly on the Jacobi-eigh scan program,
# crash inside compilation_cache.get_executable_and_time; the loader
# itself warns about compile-vs-host machine-feature mismatches).
# Stability of the default `pytest tests/` run outranks its speed.
if os.environ.get("PYPHYSIM_XLA_CACHE") == "1":
    _worker = os.environ.get("PYTEST_XDIST_WORKER", "gw0")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"pyphysim_tpu_test_xla_cache_{_worker}"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
