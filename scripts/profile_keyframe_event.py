#!/usr/bin/env python
"""Per-stage timing of the KEYFRAME EVENT path (VERDICT r1, task 4).

The tracking path is profiled by scripts/profile_stages.py; this script
times what a new keyframe costs on top of it, component by component:

  - keyframes.append (pointmap copy into the ring buffer)
  - engine.match_symmetric for 1 edge (batched symmetric decode + match)
  - FactorGraph.add_factors (above + gating + edge-state append)
  - pose-graph solve at realistic edge counts (the staged bucketed GN)
  - retrieval.update (ASMK query+add)
  - gaussians_to_world + pool append

Each timing uses chained dispatch with one tiny fetch (block_until_ready
is a no-op over the axon tunnel).

Usage: python scripts/profile_keyframe_event.py [--tiny] [--kfs N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    import jax.numpy as jnp

    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "ravel")][0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, iters=5, warmup=1):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--kfs", type=int, default=8,
                    help="keyframes to build up before timing")
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from splatt3r_slam_tpu import config as cfgmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgmod.load_config(os.path.join(root, "config", "base.yaml"))

    import jax.numpy as jnp

    from splatt3r_slam_tpu.backend import FactorGraph
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.retrieval import RetrievalDatabase
    from splatt3r_slam_tpu.runtime.frame import create_frame
    from splatt3r_slam_tpu.runtime.inference import InferenceEngine
    from splatt3r_slam_tpu.runtime.system import SLAMSystem
    from splatt3r_slam_tpu.splat import GaussianAccumulator

    if args.tiny:
        cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
        h, w = 48, 64
    else:
        cfg = TwoViewConfig()
        h, w = 384, 512

    from main import load_model_params

    class _A:
        checkpoint = None
        seed = 0

    model, params = load_model_params(_A(), cfg, h, w)
    engine = InferenceEngine(model, params, h, w)

    system = SLAMSystem(engine, h, w)
    if args.tiny:
        retrieval = RetrievalDatabase(feat_dim=cfg.enc_embed_dim,
                                      proj_dim=cfg.enc_embed_dim,
                                      n_words=1024, nfeat=64)
    else:
        retrieval = RetrievalDatabase()
    system.backend = FactorGraph(engine, system.keyframes,
                                 retrieval=retrieval)
    system.gaussian_module = GaussianAccumulator(spatial_stride=4)

    # build up a keyframe graph: force a keyframe every frame
    rng = np.random.default_rng(0)
    small = rng.random((h // 8 + args.kfs, w // 8 + args.kfs, 3)
                       ).astype(np.float32)
    base = np.kron(small, np.ones((8, 8, 1), np.float32))

    from splatt3r_slam_tpu.runtime.frame import Mode

    cfgmod.config["tracking"]["min_match_frac"] = 0.0
    frames = []
    for i in range(args.kfs):
        img = np.ascontiguousarray(base[4 * i : 4 * i + h,
                                        6 * i : 6 * i + w])
        f = create_frame(i, img, img_size=w)
        frames.append(f)
        system.process_frame(f, force_keyframe=(i > 0))
        if system.mode == Mode.RELOC and i > 0:
            # random weights: GN fails -> RELOC skips the keyframe
            # branch; run the event path explicitly (as bench_system's
            # cadence mode does) so the graph still grows
            system.mode = Mode.TRACKING
            system.keyframes.append(f)
            system._dispatch_backend(len(system.keyframes) - 1)
            system._append_gaussians(f, len(system.keyframes) - 1)
            system.keyframes.release_older_transients()
    print(f"built {len(system.keyframes)} keyframes, "
          f"{len(system.backend.ii)} edges", flush=True)

    fg = system.backend
    kfN = len(system.keyframes) - 1
    kf_a, kf_b = system.keyframes[kfN - 1], system.keyframes[kfN]
    for kf in (kf_a, kf_b):
        engine.ensure_encoded(kf)

    res = {"kfs": len(system.keyframes), "edges": len(fg.ii)}

    res["match_symmetric_1edge_ms"] = timeit(
        lambda: engine.match_symmetric(kf_a.feat, kf_a.pos,
                                       kf_b.feat, kf_b.pos))

    def add_remove():
        n0 = len(fg.ii)
        fg.add_factors([kfN - 1], [kfN], 0.0)
        # pop the edge again so state stays fixed across iters
        for name in ("ii", "jj", "idx_ii2jj", "idx_jj2ii",
                     "valid_match_j", "valid_match_i",
                     "Q_ii2jj", "Q_jj2ii"):
            del getattr(fg, name)[n0:]
        return fg.Q_ii2jj[-1]

    res["add_factors_1edge_ms"] = timeit(add_remove)

    res["solve_ms"] = timeit(lambda: (fg.solve(),
                                      system.keyframes[kfN].T_WC)[1])

    res["retrieval_update_ms"] = timeit(
        lambda: (retrieval.update(kf_b, add_after_query=False, k=3,
                                  min_thresh=5e-3), kf_b.feat)[1])

    engine.ensure_gaussians(frames[-1])
    res["gaussians_to_world_ms"] = timeit(
        lambda: system.gaussian_module.gaussians_to_world(frames[-1]))

    def pool_append():
        out = system.gaussian_module.gaussians_to_world(frames[-1])
        system.pool.append_chunk(*out, kfN)
        return system.pool.data

    res["gs_to_world_plus_pool_append_ms"] = timeit(pool_append)

    res["keyframes_append_ms"] = timeit(
        lambda: (system.keyframes.append(frames[-1]),
                 system.keyframes.pop_last(),
                 frames[-1].X_canon)[2])

    total = (res["add_factors_1edge_ms"] + res["solve_ms"]
             + res["retrieval_update_ms"]
             + res["gs_to_world_plus_pool_append_ms"]
             + res["keyframes_append_ms"])
    res["kf_event_sum_ms"] = round(total, 1)
    res = {k: (round(v, 1) if isinstance(v, float) else v)
           for k, v in res.items()}
    print(json.dumps(res, indent=1))
    path = "logs/profile_keyframe_event.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
