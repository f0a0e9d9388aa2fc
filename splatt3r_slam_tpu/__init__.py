"""splatt3r_slam_tpu — TPU-native real-time dense monocular SLAM + 3DGS.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Looong01/Splatt3R-SLAM (MASt3R-SLAM tracking/optimization + Splatt3R
feed-forward Gaussian splatting), built TPU-first:

- compute path: jit-compiled pure functions, static shapes, bf16 matmuls
  on the MXU, Pallas kernels for the gather-/composite-heavy hot ops;
- runtime: single host process with async dispatch replacing the
  reference's 3-process shared-CUDA-memory pipeline;
- scaling: `jax.sharding.Mesh` + shard_map for the data-parallel trainer
  and multi-chip frontend/backend split.

Layer map mirrors SURVEY.md §1 (reference layers L0-L7).
"""

__version__ = "0.1.0"

# jax's persistent-compile-cache writes are not atomic; a concurrent
# reader segfaults on a half-written entry (see utils/cache_atomic.py).
# Install the temp+rename fix for every entry point importing this pkg.
from splatt3r_slam_tpu.utils.cache_atomic import (  # noqa: E402
    install_atomic_cache_writes as _install_atomic_cache_writes,
)

_install_atomic_cache_writes()
