"""Micro-benchmark: sequential vs batched per-view head application.

The fused tracking step applies two GaussianHeads (view1/view2, distinct
weights) to same-shaped hook tokens (SURVEY §3.2 — reference runs
`_downstream_head(1)` and `_downstream_head(2)` back-to-back,
`splatt3r_slam/splatt3r_utils.py:441-448`). Inside one XLA program those
are two independent subgraphs that the TPU executes serially; most of
their convs are row-starved (B=1 at 24x32..192x256 spatial), so stacking
the two views on a leading axis (vmap over stacked params → one
batch-grouped conv per layer instead of two half-occupancy ones) may buy
real MXU utilization.

Measures device time by chained dispatch (N calls, one 1-element fetch —
`block_until_ready` is a no-op over the axon tunnel, see
.claude/skills/verify). Prints JSON {seq_ms, batched_ms, speedup}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("BENCH_CPU"):
    # sitecustomize pins JAX_PLATFORMS=axon; config.update is the only
    # effective override in this image (.claude/skills/verify)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from splatt3r_slam_tpu.models.heads import GaussianHead


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tracking"
    h = int(os.environ.get("BENCH_H", 384))
    w = int(os.environ.get("BENCH_W", 512))
    p = 16
    n = (h // p) * (w // p)
    head = GaussianHead(dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)

    def hooks(seed):
        r = np.random.default_rng(seed)
        return [
            jnp.asarray(r.normal(size=(1, n, c)).astype(np.float32) * 0.1)
            for c in (1024, 768, 768, 768)
        ]

    hk1, hk2 = hooks(1), hooks(2)
    p1 = head.init(jax.random.PRNGKey(0), hk1, (h, w), mode)["params"]
    p2 = head.init(jax.random.PRNGKey(1), hk1, (h, w), mode)["params"]

    # pre-stacked (leading 2) params — built once at load time in the
    # production design, so the stack is NOT in the measured path
    ps = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), p1, p2)
    hks = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), hk1, hk2)

    @jax.jit
    def seq(p1, p2, hk1, hk2):
        r1 = head.apply({"params": p1}, hk1, (h, w), mode)
        r2 = head.apply({"params": p2}, hk2, (h, w), mode)
        return r1["pts3d"] if "pts3d" in r1 else r1["scales"], \
            r2["pts3d"] if "pts3d" in r2 else r2["scales"]

    @jax.jit
    def batched(ps, hks):
        out = jax.vmap(
            lambda pp, hh: head.apply({"params": pp}, hh, (h, w), mode)
        )(ps, hks)
        k = "pts3d" if "pts3d" in out else "scales"
        return out[k]

    def timeit(fn, args, iters=30):
        out = fn(*args)  # compile
        first = jax.tree_util.tree_leaves(out)[0]
        np.asarray(first.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        np.asarray(first.ravel()[:1])
        return (time.perf_counter() - t0) / iters * 1e3

    t_seq = timeit(seq, (p1, p2, hk1, hk2))
    t_bat = timeit(batched, (ps, hks))
    # correctness: batched == sequential per view
    r1, r2 = seq(p1, p2, hk1, hk2)
    rb = batched(ps, hks)
    d1 = float(jnp.abs(rb[0] - r1[0]).max())
    d2 = float(jnp.abs(rb[1] - r2[0]).max())
    print(json.dumps({
        "mode": mode,
        "backend": jax.default_backend(),
        "seq_ms": round(t_seq, 3),
        "batched_ms": round(t_bat, 3),
        "speedup": round(t_seq / t_bat, 3),
        "max_abs_diff": max(d1, d2),
    }))


if __name__ == "__main__":
    main()
