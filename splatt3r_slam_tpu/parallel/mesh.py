"""Device mesh construction for data/fsdp/tensor-parallel training.

Replaces the reference's Lightning DDP-over-NCCL trainer backend
(`splatt3r_core/main.py:381-430`) with `jax.sharding.Mesh` + NamedSharding:
gradients are all-reduced over ICI by XLA-inserted collectives; parameters
can additionally be sharded over an `fsdp` axis (reduce_scatter/all_gather
riding ICI) and transformer weights over a `tp` axis (Megatron-style
column/row parallelism: qkv/fc1 split on the output feature dim, proj/fc2
on the input dim so GSPMD inserts one psum per block) — neither of which
DDP can express.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, fsdp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """(dp, fsdp, tp) mesh. fsdp=tp=1 → pure data parallel (DDP-equiv)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (fsdp * tp) == 0, \
        f"{n} devices not divisible by fsdp={fsdp} * tp={tp}"
    arr = np.asarray(devices).reshape(n // (fsdp * tp), fsdp, tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


# (path-suffix, axis-from-the-right) tensor-parallel rules for the
# two-view transformer: column-parallel on outputs, row-parallel on the
# matching inputs. Scanned blocks carry a leading depth axis, hence
# right-relative axes.
_TP_RULES = (
    (("attn", "qkv", "kernel"), 0),     # (.., in, 3C) -> split 3C
    (("attn", "proj", "kernel"), 1),    # (.., C, C)  -> split input C
    (("projq", "kernel"), 0),
    (("projk", "kernel"), 0),
    (("projv", "kernel"), 0),
    (("xattn", "proj", "kernel"), 1),
    (("mlp", "fc1", "kernel"), 0),      # (.., C, 4C) -> split 4C
    (("mlp", "fc2", "kernel"), 1),      # (.., 4C, C) -> split input
)


def _tp_axis(path_keys):
    for suffix, ax in _TP_RULES:
        if tuple(path_keys[-len(suffix):]) == suffix:
            return ax
    return None


def param_sharding(mesh: Mesh, params):
    """fsdp: shard the largest axis of big params; tp: Megatron-style
    split of transformer projections; replicate the rest."""
    fsdp = mesh.shape["fsdp"]
    tp = mesh.shape.get("tp", 1)

    def spec(path, x):
        if x.ndim == 0:
            return NamedSharding(mesh, P())
        keys = [getattr(p, "key", str(p)) for p in path]
        parts = [None] * x.ndim
        used = None
        if tp > 1:
            # tp rules apply regardless of size (a split small matmul is
            # harmless; skipping it silently would leave tp meshes un-
            # exercised on scaled-down configs)
            ax_r = _tp_axis(keys)
            if ax_r is not None:
                ax = x.ndim - 1 - ax_r
                if x.shape[ax] % tp == 0:
                    parts[ax] = "tp"
                    used = ax
        if fsdp > 1 and x.size >= 2**16:
            order = np.argsort(x.shape)[::-1]
            for ax in order:
                ax = int(ax)
                if ax != used and x.shape[ax] % fsdp == 0:
                    parts[ax] = "fsdp"
                    break
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh):
    """Batch over dp+fsdp; replicated over tp (activations inside the
    transformer get tp-sharded by GSPMD propagation from the weights)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))
