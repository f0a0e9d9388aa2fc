"""Benchmark: end-to-end frontend tracking FPS at production resolution.

Runs the full per-frame SLAM tracking step (encoder on the new frame,
asymmetric decoder+heads pass, iterative-projection matching, Sim(3) GN
pose solve, pointmap fusion, keyframe logic) on synthetic 512x384 frames
with the full ViT-L model (random weights — identical FLOPs/shape to the
checkpoint) and reports steady-state FPS.

Baseline: the driver target of 15 FPS end-to-end on one v5e chip
(BASELINE.md "Build targets"); the reference publishes no numbers
(SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: repeated bench runs (and the driver's)
# skip the multi-minute first compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _accel_probe(timeout_s=180.0):
    """True iff the accelerator backend initializes within timeout_s.

    Probed in a SUBPROCESS: when the axon tunnel is down, in-process
    backend init blocks for ~40 min before raising UNAVAILABLE — a
    bounded probe keeps the driver's bench run from hanging."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.default_backend(); print('ACCEL_OK')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return "ACCEL_OK" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    import jax

    # persistent compile cache: env vars do NOT take effect in this image
    # (sitecustomize initializes jax first) — config.update does
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu") \
            and not _accel_probe():
        # tunnel down: fall back to CPU so the driver still records a
        # metric line instead of hanging on backend init.
        jax.config.update("jax_platforms", "cpu")
    try:
        backend = jax.default_backend()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    on_accel = backend not in ("cpu",)

    from splatt3r_slam_tpu import config as cfgmod

    root = os.path.dirname(os.path.abspath(__file__))
    cfgmod.load_config(os.path.join(root, "config", "base.yaml"))

    from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig
    from splatt3r_slam_tpu.runtime.frame import create_frame
    from splatt3r_slam_tpu.runtime.inference import InferenceEngine
    from splatt3r_slam_tpu.runtime.system import SLAMSystem
    import jax.numpy as jnp

    if on_accel:
        # ViT-L, bf16 transformer + bf16 DPT trunks; BENCH_HEAD_DTYPE
        # overrides for same-session precision A/Bs (tunnel throughput
        # varies across sessions — only same-session comparisons are valid)
        cfg = TwoViewConfig()
        hd = os.environ.get("BENCH_HEAD_DTYPE")
        if hd:
            cfg = cfg._replace(head_dtype=hd)
        h, w = 384, 512
        n_frames = 40
    else:
        # CPU fallback (dev machines): tiny model, same code path
        cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
        h, w = 48, 64
        n_frames = 10

    model = Splatt3RModel(cfg)
    img0 = jnp.zeros((1, h, w, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0)
    )["params"]
    rng = np.random.default_rng(0)

    def fill(path, s):
        name = getattr(path[-1], "key", "")
        if name == "scale":
            return jnp.ones(s.shape, s.dtype)
        if name == "bias":
            return jnp.zeros(s.shape, s.dtype)
        fan_in = int(np.prod(s.shape[:-1])) or 1
        return jnp.asarray(
            rng.standard_normal(s.shape, dtype=np.float32) / np.sqrt(fan_in),
            s.dtype,
        )

    params = jax.tree_util.tree_map_with_path(fill, shapes)
    params = jax.device_put(params)

    engine = InferenceEngine(model, params, h, w)

    # synthetic panning sequence at native camera resolution
    base = rng.random((h + 200, w + 200, 3)).astype(np.float32)
    frames = []
    for i in range(n_frames):
        crop = base[2 * i : 2 * i + h, 3 * i : 3 * i + w]
        frames.append(crop)

    # fused frontend: one device dispatch + one 4-float pull per frame
    # (the full TRACKING critical path of SURVEY.md §3.2)
    from splatt3r_slam_tpu.runtime.fused import (
        KFState, MatchingParams, make_fused_track_step,
    )
    from splatt3r_slam_tpu.tracking import TrackingConfig

    tcfg = TrackingConfig()
    mcfg = MatchingParams.from_config(cfgmod.config)
    step = make_fused_track_step(model, h, w, tcfg, mcfg)

    # ingest (resize+upload) prefetched on a worker thread, as in the
    # production loops (FramePrefetcher in system.run / main.py)
    from splatt3r_slam_tpu.runtime.frame import FramePrefetcher

    prefetch = FramePrefetcher(
        lambda i: create_frame(i, frames[i], img_size=w), n_frames
    )

    kf_frame = prefetch.get(0)
    X, C = engine.inference_mono(kf_frame)
    kf = KFState(
        feat=kf_frame.feat, pos=kf_frame.pos, X=X, C=C,
        N_fused=jnp.asarray(1.0), T_WC=kf_frame.T_WC,
    )

    def track_step(i, kf, get_frame):
        f = get_frame(i)
        out, flags = step(params, f.img, kf, f.T_WC, None)
        return out["kf"], flags

    for i in range(1, 3):  # warmup: pays all compiles
        kf, flags = track_step(i, kf, prefetch.get)
        np.asarray(flags)

    # 1-frame-lag pipeline: dispatch frame t, then consume frame t-1's
    # flags — the host round-trip overlaps device compute, so steady-state
    # FPS is bounded by device time, not link latency.
    # Variance robustness (VERDICT r2 item 1): THREE measured passes over
    # the sequence; the reported value is the MEDIAN pass so one noisy
    # remote-tunnel pass cannot define the round. Spread is printed on
    # stderr for the log.
    def one_pass(kf, get_frame):
        t0 = time.perf_counter()
        n_timed = 0
        prev_flags = None
        for i in range(3, n_frames):
            kf, flags = track_step(i, kf, get_frame)
            try:
                flags.copy_to_host_async()
            except Exception:
                pass
            if prev_flags is not None:
                np.asarray(prev_flags)  # decision for frame i-1
            prev_flags = flags
            n_timed += 1
        np.asarray(prev_flags)
        return n_timed / (time.perf_counter() - t0), kf

    passes = []
    for p in range(3):
        if p > 0:
            # fresh sequential prefetcher per pass; warmup frames 0-2
            # replay un-timed to restore the pipeline state
            prefetch.close()
            prefetch = FramePrefetcher(
                lambda i: create_frame(i, frames[i], img_size=w), n_frames
            )
            for i in range(3):
                if i == 0:
                    prefetch.get(0)
                else:
                    kf, flags = track_step(i, kf, prefetch.get)
                    np.asarray(flags)
        fps_i, kf = one_pass(kf, prefetch.get)
        passes.append(fps_i)
    fps = float(np.median(passes))
    print(
        "bench passes (FPS): "
        + ", ".join(f"{p:.2f}" for p in passes)
        + f"  -> p50 {fps:.2f}, spread {max(passes) - min(passes):.2f}",
        file=sys.stderr,
    )

    baseline_fps = 15.0
    print(json.dumps({
        "metric": "tracking_fps_512x384" if on_accel else "tracking_fps_tiny_cpu",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
