"""Long-horizon soak run: memory + FPS stability over many frames.

Exercises the three long-horizon mechanisms (SURVEY §5 long-context row)
under forced keyframe churn:
- factor-graph sliding window (`local_opt.max_edges` eviction,
  `backend/factor_graph._enforce_max_edges` — fixes the reference's
  unbounded edge growth, global_opt.py:89-96),
- gaussian-pool drop-oldest-half FIFO eviction (reference
  frame.py:421-434),
- keyframe-buffer behavior approaching/exceeding the reference's 512
  capacity (warn-and-continue past the cap).

Reports per-third FPS (flat = no leak-driven slowdown), device memory
stats where the backend exposes them, and the eviction counters.

Usage:
  python scripts/soak.py --frames 1500 --kf-every 5            # TPU, full
  python scripts/soak.py --frames 300 --kf-every 5 --tiny ...  # CPU CI
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def device_mem_mb():
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return round(stats["bytes_in_use"] / 2**20, 1)
    except Exception:
        pass
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1500)
    ap.add_argument("--kf-every", type=int, default=5)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--kf-capacity", type=int, default=512,
                    help="keyframe buffer capacity (shrink to exercise "
                         "the over-capacity path in CI)")
    ap.add_argument("--max-edges", type=int, default=512)
    ap.add_argument("--max-gaussians", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from splatt3r_slam_tpu import config as cfgmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgmod.load_config(os.path.join(root, "config", "base.yaml"))
    # pinned cadence; no data-driven keyframes / reloc (random weights)
    cfgmod.config["tracking"]["match_frac_thresh"] = -1.0
    cfgmod.config["tracking"]["min_match_frac"] = 0.0
    cfgmod.config["local_opt"]["max_edges"] = args.max_edges

    from splatt3r_slam_tpu.backend import FactorGraph
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.runtime.frame import (
        FramePrefetcher, GaussianPool, Mode, create_frame,
    )
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
    system.keyframes.buffer = args.kf_capacity
    system.backend = FactorGraph(engine, system.keyframes)
    system.gaussian_module = GaussianAccumulator(
        spatial_stride=4, min_confidence=0.0, max_scale=1e9,
        depth_max_percentile=1.0, depth_min=-1e9,
    )
    system.pool = GaussianPool(max_gaussians=args.max_gaussians)

    # endless panning crops over a textured torus (wraps, so any frame
    # count costs O(1) host memory)
    rng = np.random.default_rng(0)
    small = rng.random(((h + 8) // 8 + 32, (w + 8) // 8 + 32, 3)).astype(
        np.float32)
    base = np.kron(small, np.ones((8, 8, 1), np.float32))
    BH, BW = base.shape[0] - h, base.shape[1] - w

    def frame_img(i):
        y = (17 * i) % BH
        x = (23 * i) % BW
        return np.ascontiguousarray(base[y : y + h, x : x + w])

    n = args.frames
    prefetch = FramePrefetcher(
        lambda i: create_frame(i, frame_img(i), img_size=w), n)

    thirds = []
    t0 = time.time()
    t_start = t0
    mem0 = None
    pool_evictions = 0
    prev_pool_n = 0
    over_capacity_frames = 0
    try:
        for i in range(n):
            frame = prefetch.get(i)
            force = i > 0 and i % args.kf_every == 0
            system.process_frame(frame, force_keyframe=force)
            if system.mode == Mode.RELOC:
                # random weights: GN failures flip to RELOC; stay in
                # TRACKING (the soak measures the long-horizon buffers,
                # not reloc)
                system.mode = Mode.TRACKING
                if force:
                    system.keyframes.append(frame)
                    system._dispatch_backend(len(system.keyframes) - 1)
                    system._append_gaussians(frame,
                                             len(system.keyframes) - 1)
                    system.keyframes.release_older_transients()
            if int(system.pool.n) < prev_pool_n:
                pool_evictions += 1
            prev_pool_n = int(system.pool.n)
            if len(system.keyframes) > args.kf_capacity:
                over_capacity_frames += 1
            if i == 10:
                mem0 = device_mem_mb()  # post-warmup baseline
            if (i + 1) % (n // 3) == 0 and len(thirds) < 3:
                now = time.time()
                thirds.append({
                    "fps": round((n // 3) / (now - t0), 3),
                    "mem_mb": device_mem_mb(),
                    "keyframes": len(system.keyframes),
                    "edges": len(system.backend.ii),
                    "gaussians": int(system.pool.n),
                })
                t0 = now
    finally:
        prefetch.close()

    out = {
        "frames": n,
        "kf_every": args.kf_every,
        "kf_capacity": args.kf_capacity,
        "max_edges": args.max_edges,
        "max_gaussians": args.max_gaussians,
        "tiny": bool(args.tiny),
        "wall_s": round(time.time() - t_start, 1),
        "thirds": thirds,
        "mem_mb_post_warmup": mem0,
        "pool_evictions": pool_evictions,
        "keyframes_final": len(system.keyframes),
        "edges_final": len(system.backend.ii),
        "gaussians_final": int(system.pool.n),
        "over_capacity_frames": over_capacity_frames,
    }
    s = json.dumps(out)
    print(s)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
