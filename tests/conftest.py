"""Test harness config: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (the driver
validates the real-chip path separately)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# No persistent compilation cache under pytest: driver tests set
# jax_compilation_cache_dir process-globally (per-tmp_path dirs that
# pytest later deletes), and after ~190 accumulated executables the
# cache WRITE segfaulted the suite inside jax's compression layer —
# reproduced twice at test_stage2_pa_group_env_value_parity (VERDICT r4
# item 2).  Tests compile in-process; the cache only helps across
# processes, so disabling it here loses nothing.
jax.config.update("jax_enable_compilation_cache", False)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    The full fast suite accumulates hundreds of XLA:CPU executables in
    one process; at ~item 192 the NEXT backend compile segfaulted inside
    backend_compile_and_load, twice, deterministically, while the same
    test passes standalone and its whole file passes alone (VERDICT r4
    item 2 — first attributed to the compilation-cache write, but the
    crash persists with the persistent cache disabled, one frame deeper
    in the compiler).  Bounding per-process executable accumulation is
    the state reset that matches the evidence; cross-module executor
    reuse just recompiles."""
    yield
    jax.clear_caches()
    gc.collect()
