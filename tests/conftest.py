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
