"""Device mesh construction for data/fsdp-parallel training.

Replaces the reference's Lightning DDP-over-NCCL trainer backend
(`splatt3r_core/main.py:381-430`) with `jax.sharding.Mesh` + NamedSharding:
gradients are all-reduced over ICI by XLA-inserted collectives; parameters
can additionally be sharded over an `fsdp` axis (reduce_scatter/all_gather
riding ICI), which DDP cannot do.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, fsdp: int = 1,
              devices=None) -> Mesh:
    """(dp, fsdp) mesh. fsdp=1 → pure data parallel (DDP-equivalent)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, axis_names=("dp", "fsdp"))


def param_sharding(mesh: Mesh, params):
    """Shard the largest axis of big params over `fsdp`; replicate rest."""
    fsdp = mesh.shape["fsdp"]

    def spec(x):
        if fsdp == 1 or x.ndim == 0 or x.size < 2**16:
            return NamedSharding(mesh, P())
        # shard the largest divisible axis
        ax = int(np.argmax(x.shape))
        if x.shape[ax] % fsdp == 0:
            parts = [None] * x.ndim
            parts[ax] = "fsdp"
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(("dp", "fsdp")))
