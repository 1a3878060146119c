"""Test configuration: force an 8-virtual-device CPU backend.

The ambient environment points JAX at the remote TPU (JAX_PLATFORMS=axon),
where per-op eager dispatch is a network round trip.  Tests are correctness
tests and always run on the local CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

A pytest plugin imports jax before this conftest runs, so the env var alone
is latched too late — use jax.config.update, which works until the backend
is actually initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8

# Persistent XLA compile cache (local-only, .gitignored): XLA-CPU compiles
# of the big fused/scan graphs dominate suite wall time on this 1-core box,
# and tests that build fresh make_chunk_step/make_fused_chunk_step closures
# recompile IDENTICAL HLO (the in-memory jit cache is per-function-object).
# The persistent cache dedups by HLO hash — across tests and across runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
