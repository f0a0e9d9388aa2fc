"""Test harness: force CPU with an 8-device virtual mesh.

Tests never touch the real TPU (slow tunnel compiles); multi-chip sharding
is validated on the virtual host mesh, as the driver does via
`__graft_entry__.dryrun_multichip`.
"""

import os

# Force CPU: the environment's sitecustomize pre-sets JAX_PLATFORMS=axon
# (remote TPU tunnel), which would route every eager test op over the wire.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's in-process collective rendezvous aborts the whole process if a
# device thread arrives > timeout late (default 40 s, env-flag only — see
# parallel/dryrun.py). 8 virtual devices timeshare this host's single
# core, so heavy sharded steps need the headroom.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# sitecustomize's PJRT registration overrides jax_platforms via
# jax.config.update (which beats env vars) — override it back, or every
# eager op dispatches over the remote TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: env vars don't take effect in this image
# (sitecustomize initializes jax first); config.update does. Repeat suite
# runs then skip XLA:CPU recompilation entirely.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# x64 on: finite-difference oracles need f64; production code pins f32/bf16
# dtypes explicitly so this only affects test-side math.
jax.config.update("jax_enable_x64", True)
# This JAX build lowers fp32 matmuls to bf16 by default even on CPU; tests
# compare against fp32 references, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# XLA:CPU JIT-loads ~6 anonymous mappings per compiled executable and
# jax's jit caches pin every one of them; a full suite run accumulates
# past vm.max_map_count (65530 here), after which the next mmap inside
# backend.deserialize_executable fails unchecked and the process
# SIGSEGVs (observed deterministically at ~91% of the suite; per-test
# map counts: 35k -> 64.7k -> crash). Shed executables before the
# cliff — the persistent compile cache makes re-acquiring them cheap.
_MAP_GUARD_THRESHOLD = 30_000


@pytest.fixture(autouse=True)
def _mmap_guard():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:  # non-Linux: limit doesn't apply
        return
    if n > _MAP_GUARD_THRESHOLD:
        import gc

        jax.clear_caches()
        gc.collect()
