"""Benchmark XLA tile rasterizer vs Pallas compositing kernel on real TPU.

Verdict r1 item 5: decide the production default with numbers at
production-scale Gaussian counts (SLAM pool is ~4.2M; two-view render is
~393k at 512x384). Run:  python scripts/bench_rasterizer.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from splatt3r_slam_tpu.splat.rasterizer import render_tiles  # noqa: E402
from splatt3r_slam_tpu.splat.pallas_rasterizer import (  # noqa: E402
    render_tiles_pallas,
)

HW = (384, 512)


def make_scene(g, seed=0):
    rng = np.random.default_rng(seed)
    # camera at origin looking +z; gaussians in a frustum-ish box
    means = np.stack(
        [
            rng.uniform(-2.0, 2.0, g),
            rng.uniform(-1.5, 1.5, g),
            rng.uniform(0.5, 6.0, g),
        ],
        axis=-1,
    ).astype(np.float32)
    s = rng.uniform(0.003, 0.02, (g, 1)).astype(np.float32)
    cov = np.zeros((g, 6), np.float32)
    cov[:, 0] = s[:, 0] ** 2
    cov[:, 3] = s[:, 0] ** 2
    cov[:, 5] = s[:, 0] ** 2
    colors = rng.uniform(0, 1, (g, 3)).astype(np.float32)
    opa = rng.uniform(0.3, 1.0, g).astype(np.float32)
    view = np.eye(4, dtype=np.float32)
    K = np.array(
        [[500.0, 0, HW[1] / 2], [0, 500.0, HW[0] / 2], [0, 0, 1]], np.float32
    )
    return (
        jnp.asarray(means),
        jnp.asarray(cov),
        jnp.asarray(colors),
        jnp.asarray(opa),
        jnp.asarray(view),
        jnp.asarray(K),
    )


def timeit(fn, *args, iters=20, **kw):
    # Chained-dispatch timing: N dispatches, one sync — measures device
    # time, which is what a continuously-rendering viewer pays. (Per-call
    # dispatch+fetch adds ~140 ms of axon tunnel round-trip per frame,
    # an environment artifact, not a kernel cost. block_until_ready is
    # lazy on axon; the tiny fetch is the only reliable barrier, and the
    # same device stream serializes all queued work before it.)
    import jax

    out = fn(*args, **kw)
    np.asarray(jax.numpy.ravel(out)[:1])  # compile + run
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(iters)]
    np.asarray(jax.numpy.ravel(outs[-1])[:1])
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    results = {}
    for g in (400_000, 1_000_000, 4_000_000):
        scene = make_scene(g)
        row = {}
        try:
            ms, img_x = timeit(
                render_tiles, *scene, HW, tpg_side=4, k_max=512,
                iters=5,
            )
            row["xla_ms"] = round(ms, 2)
        except Exception as e:  # OOM etc.
            row["xla_ms"] = f"ERR {type(e).__name__}"
            img_x = None
        try:
            ms, img_p = timeit(
                render_tiles_pallas, *scene, HW, tpg_side=4,
                iters=5,
            )
            row["pallas_ms"] = round(ms, 2)
        except Exception as e:
            row["pallas_ms"] = f"ERR {type(e).__name__}"
            img_p = None
        if img_x is not None and img_p is not None:
            row["max_abs_diff"] = float(
                jnp.max(jnp.abs(img_x - img_p))
            )
        results[g] = row
        print(g, row, file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
