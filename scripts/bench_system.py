"""System-level benchmark: full SLAM loop FPS including keyframe events.

bench.py measures the steady-state tracking step (the driver headline).
This script runs SLAMSystem.run end-to-end — keyframe creation, backend
add_factors (batched symmetric decode) + pose-graph GN, gaussian
accumulation — on a synthetic panning sequence with the full-size model,
and reports overall FPS plus keyframe statistics.

Usage: python scripts/bench_system.py [--frames N] [--tiny]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SyntheticDataset:
    """Panning crops over a textured base image (no disk IO)."""

    save_results = False

    def __init__(self, n, h, w, seed=0):
        rng = np.random.default_rng(seed)
        # smooth texture: random low-freq field upsampled; base sized so
        # every crop stays fully inside (frames must keep (h, w) exactly)
        sh = (h + 4 * n + 8) // 8 + 1
        sw = (w + 6 * n + 8) // 8 + 1
        small = rng.random((sh, sw, 3)).astype(np.float32)
        base = np.kron(small, np.ones((8, 8, 1), np.float32))
        self.frames = [
            np.ascontiguousarray(base[4 * i : 4 * i + h, 6 * i : 6 * i + w])
            for i in range(n)
        ]
        assert all(f.shape == (h, w, 3) for f in self.frames)

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i):
        return float(i), self.frames[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from splatt3r_slam_tpu import config as cfgmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgmod.load_config(os.path.join(root, "config", "base.yaml"))

    import jax.numpy as jnp

    from splatt3r_slam_tpu.backend import FactorGraph
    from splatt3r_slam_tpu.models import TwoViewConfig
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
    system.backend = FactorGraph(engine, system.keyframes)
    system.gaussian_module = GaussianAccumulator(spatial_stride=4)

    from splatt3r_slam_tpu.runtime.frame import Mode, create_frame

    n = args.frames
    ds = SyntheticDataset(n, h, w)

    def drive(sysm, dataset):
        """Frame loop that re-bootstraps instead of staying in RELOC:
        random weights produce garbage geometry, so GN failures (→ RELOC,
        reference-faithful) would otherwise dominate timing. Rebootstrap
        (mono inference + fresh keyframe, the INIT path) keeps the
        tracking + keyframe critical paths under measurement."""
        import time

        relocs = 0
        t0 = time.time()
        for i in range(len(dataset)):
            _, img = dataset[i]
            frame = create_frame(i, img, img_size=w)
            sysm.process_frame(frame)
            if sysm.mode == Mode.RELOC:
                relocs += 1
                sysm.mode = Mode.INIT
                sysm.process_frame(frame)
        dt = time.time() - t0
        return len(dataset) / dt, relocs

    # warmup: pays all compiles; freed before the timed run (its gaussian
    # pool + keyframes would otherwise occupy HBM alongside the real run)
    import gc

    warm = SLAMSystem(engine, h, w)
    warm.backend = FactorGraph(engine, warm.keyframes)
    warm.gaussian_module = GaussianAccumulator(spatial_stride=4)
    drive(warm, SyntheticDataset(6, h, w))
    del warm
    gc.collect()

    fps, relocs = drive(system, ds)
    print(json.dumps({
        "metric": "system_fps_512x384" if not args.tiny else "system_fps_tiny",
        "value": round(fps, 3),
        "unit": "frames/s",
        "frames": n,
        "keyframes": len(system.keyframes),
        "reboots": relocs,
        "gaussians": int(system.pool.n),
        "backend_edges": len(system.backend.ii),
    }))


if __name__ == "__main__":
    main()
