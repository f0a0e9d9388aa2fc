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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

# sitecustomize's PJRT registration overrides jax_platforms via
# jax.config.update (which beats env vars) — override it back, or every
# eager op dispatches over the remote TPU tunnel.
jax.config.update("jax_platforms", "cpu")

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
