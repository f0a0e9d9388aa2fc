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


def oracle_trajectory(n, w, plane_d=2.0, blackout=None):
    """Shared with the CI twin — see `runtime/oracle.py pan_trajectory`
    (and the kidnapped-camera `reloc_pan_trajectory` when an occlusion
    window is benchmarked)."""
    from splatt3r_slam_tpu.runtime.oracle import (
        pan_trajectory,
        reloc_pan_trajectory,
    )

    if blackout:
        return reloc_pan_trajectory(n, w, blackout, plane_d=plane_d)
    return pan_trajectory(n, w, plane_d)


def run_oracle_closed_loop(args, engine, cfg, h, w, cfgmod):
    """Closed-loop benchmark: the REAL SLAMSystem state machine end to
    end — INIT → TRACKING with data-driven keyframing, backend
    add_factors + pose-graph GN on every keyframe event, RELOC if the
    gate ever trips — with exact plane-scene geometry standing in for
    the (unavailable) released weights. The wrapped engine still pays
    every real network dispatch. Produces FPS *and* a Sim3-aligned ATE.
    Spec: reference `main.py:367-536` frame loop; eval protocol
    `scripts/eval_tum.sh:33-52`."""
    import time

    import numpy as np

    from splatt3r_slam_tpu.backend import FactorGraph
    from splatt3r_slam_tpu.lie import sim3
    from splatt3r_slam_tpu.runtime.evaluate import umeyama_alignment
    from splatt3r_slam_tpu.runtime.frame import Mode, create_frame
    from splatt3r_slam_tpu.runtime.oracle import PlaneSceneOracle
    from splatt3r_slam_tpu.runtime.system import SLAMSystem

    n = args.frames
    ds = SyntheticDataset(n, h, w)
    poses = oracle_trajectory(
        n, w, blackout=tuple(args.blackout) if args.blackout else None)

    # fused mode keeps the production matching subgrid (match_stride 2 by
    # default): the oracle emits subgrid correspondence indices that the
    # fused step and the staged backend solves consume unchanged. The
    # modular mode consumes full-res analytic indices (stride pinned to 1
    # in main()).
    stride = (int(cfgmod.config["matching"].get("match_stride", 1))
              if args.fused else 1)

    blackout = tuple(args.blackout) if args.blackout else None

    def build():
        oracle = PlaneSceneOracle(h, w, float(w),
                                  plane_n=(0.12, 0.08, 1.0), plane_d=2.0,
                                  inner=engine, stride=stride,
                                  noise=args.noise,
                                  conf_noise=args.conf_noise,
                                  blackout=blackout)
        sysm = SLAMSystem(oracle, h, w, fused=args.fused)
        retrieval = None
        if args.retrieval:
            from splatt3r_slam_tpu.retrieval import RetrievalDatabase

            retrieval = RetrievalDatabase(
                feat_dim=cfg.enc_embed_dim,
                proj_dim=min(cfg.enc_embed_dim, 1024),
                **({"n_words": 256, "nfeat": 16} if args.tiny else {}),
            )
        if blackout:
            # closed-loop reloc validation: ideal (GT-overlap-ranked)
            # retrieval so the RELOC machinery is exercised
            # deterministically; a real database passed as inner still
            # pays its full per-event query cost
            from splatt3r_slam_tpu.runtime.oracle import OracleRetrieval

            retrieval = OracleRetrieval(oracle, inner=retrieval)
        sysm.backend = FactorGraph(oracle, sysm.keyframes,
                                   retrieval=retrieval)
        return oracle, sysm

    def instrument(sysm, sink):
        import time as _t

        inner = sysm._run_backend_task

        def timed(kf_idx, is_reloc_frame=None):
            ts = _t.time()
            try:
                return inner(kf_idx, is_reloc_frame)
            finally:
                sink.append((kf_idx, _t.time() - ts))

        sysm._run_backend_task = timed

    def drive(oracle, sysm, collect=None, drain_s=None):
        relocs, reloc_ok, was_reloc = 0, 0, False
        t0 = time.time()
        for i in range(n):
            oracle.register(i, poses[i])
            frame = create_frame(i, ds[i][1], img_size=w)
            tf0 = time.time()
            pre_mode = sysm.mode
            _, flag = sysm.process_frame(frame)
            # in RELOC mode the flag is reloc success, not a keyframe —
            # only TRACKING/INIT frames count as keyframe events
            new_kf = bool(flag) and pre_mode != Mode.RELOC
            if pre_mode == Mode.RELOC and flag:
                reloc_ok += 1
            in_reloc = sysm.mode == Mode.RELOC
            if in_reloc and not was_reloc:
                relocs += 1  # next frame runs the real reloc path
            was_reloc = in_reloc
            if collect is not None:
                collect.append((time.time() - tf0, bool(new_kf)))
        td0 = time.time()
        if not bool(cfgmod.config.get("single_thread", True)):
            sysm._drain_backend()
            sysm._stop = True
        if drain_s is not None:
            drain_s[0] = time.time() - td0
        # loop FPS = reference semantics (main.py:533-535 measures the
        # frame loop; the backend runs concurrently and is never drained
        # into the FPS print) — same convention as the cadence bench.
        # Wall FPS incl. the final queue drain is reported separately.
        return (n / (td0 - t0), n / (time.time() - t0), relocs,
                reloc_ok)

    # warmup run pays every compile (incl. backend edge buckets grown to
    # the full keyframe count); timed run then measures steady state
    import gc

    oracle_w, warm = build()
    if args.prewarm:
        # foreground: the full backend shape ladder (incl. edge buckets
        # the warmup trajectory never happens to hit) lands in the
        # compile caches before anything is timed
        warm.prewarm(background=False)
    drive(oracle_w, warm)
    del warm, oracle_w
    gc.collect()

    times, task_times, drain_s = [], [], [0.0]
    oracle, sysm = build()
    instrument(sysm, task_times)
    fps, wall_fps, relocs, reloc_ok = drive(oracle, sysm, collect=times,
                                            drain_s=drain_s)

    est = np.stack([np.asarray(sim3.matrix(kf.T_WC))[:3, 3]
                    for kf in sysm.keyframes])
    gt = np.stack([oracle.gt[kf.frame_id][:3, 3] for kf in sysm.keyframes])
    s, R, t = umeyama_alignment(est, gt)
    err = (s * (R @ est.T)).T + t - gt
    ate = float(np.sqrt((err ** 2).sum(axis=1).mean()))

    track_t = [dt for dt, kf in times if not kf]
    kf_t = [dt for dt, kf in times if kf]
    base = "closed_loop_fused" if args.fused else "closed_loop"
    out = {
        "metric": f"{base}_fps_512x384" if not args.tiny
        else f"{base}_fps_tiny",
        "value": round(fps, 3),
        "wall_fps_incl_drain": round(wall_fps, 3),
        "unit": "frames/s",
        "mode": "oracle_closed_loop",
        "frontend": "fused" if args.fused else "modular",
        "match_stride": stride,
        "frames": n,
        "keyframes": len(sysm.keyframes),
        "relocs": relocs,
        "reloc_successes": reloc_ok,
        "noise": args.noise,
        "conf_noise": args.conf_noise,
        "blackout": list(blackout) if blackout else None,
        "backend_edges": len(sysm.backend.ii),
        "ate_rmse_m": round(ate, 6),
        "threaded": bool(not cfgmod.config.get("single_thread", True)),
        "retrieval": bool(args.retrieval),
        "t_track_p50_ms": round(1e3 * float(np.median(track_t)), 1)
        if track_t else None,
        "t_kf_event_p50_ms": round(1e3 * float(np.median(kf_t)), 1)
        if kf_t else None,
        "t_drain_s": round(drain_s[0], 2),
        "backend_task_ms": [[int(k), round(1e3 * t, 1)]
                            for k, t in task_times],
        "frame_ms": [round(1e3 * t, 1) for t, _ in times],
        "note": "real network dispatches at full device cost; outputs "
                "replaced by exact plane geometry (runtime/oracle.py) so "
                "keyframing/GN/backend run genuinely closed-loop; FPS is "
                "a conservative bound (adds oracle host math + "
                "host->device transfers"
                + ("; fused single-dispatch frontend at the production "
                   "matching stride — the headline code path"
                   if args.fused else
                   "; modular frontend, not the fused single-dispatch "
                   "one") + ")",
    }
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cadence", type=int, default=0,
                    help="realistic-cadence mode: force a keyframe every "
                         "K frames and disable data-driven keyframing/"
                         "reloc (random weights would otherwise keyframe "
                         "or reloc every frame); measures the BASELINE "
                         "full-loop config")
    ap.add_argument("--threaded", action="store_true",
                    help="single_thread: false (backend on worker thread)")
    ap.add_argument("--retrieval", action="store_true",
                    help="enable loop-closure retrieval in the backend")
    ap.add_argument("--render-stride", type=int, default=0,
                    help="render the current view every R frames")
    ap.add_argument("--lag", action="store_true",
                    help="tracking.pipeline_lag=1 (overlap flag fetch)")
    ap.add_argument("--oracle", action="store_true",
                    help="closed-loop mode (VERDICT r03 weak-2): wrap the "
                         "real engine in the analytic PlaneSceneOracle so "
                         "the frontend GN succeeds, keyframing is "
                         "data-driven, and the backend optimizes real "
                         "edges — NO cadence replay. Every network "
                         "dispatch still runs at full device cost; only "
                         "its outputs are replaced by exact geometry, so "
                         "the FPS is a conservative bound on the real "
                         "closed loop and the run also yields an ATE.")
    ap.add_argument("--cold", action="store_true",
                    help="skip the warmup drive: the timed run pays "
                         "first-compile costs exactly as a production "
                         "cold start (pair with a fresh "
                         "BENCH_CACHE_DIR and optionally --prewarm)")
    ap.add_argument("--prewarm", action="store_true",
                    help="start the production background prewarm "
                         "(SLAMSystem.prewarm) before the frame loop — "
                         "the backend shape ladder compiles while "
                         "frames stream")
    ap.add_argument("--fused", action="store_true",
                    help="with --oracle: run the closed loop on the FUSED "
                         "single-dispatch frontend (the production/"
                         "headline path) at the production matching "
                         "stride — oracle geometry is injected INSIDE "
                         "the fused step behind a runtime predicate, so "
                         "the full network+matcher device cost is paid "
                         "(VERDICT r04 item 1)")
    ap.add_argument("--match-stride", type=int, default=0,
                    help="override matching.match_stride (0 = config "
                         "default; with --oracle --fused, 1 gives the "
                         "eval-profile reference-exact full-res matching "
                         "closed loop)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="with --oracle: depth-proportional pointmap "
                         "noise sigma (0.01 ~ MASt3R-like 1%% depth "
                         "error)")
    ap.add_argument("--conf-noise", type=float, default=0.0,
                    help="with --oracle: lognormal sigma on confidences")
    ap.add_argument("--blackout", type=int, nargs=2, default=None,
                    metavar=("A", "B"),
                    help="with --oracle: occlusion window [A, B) of frame "
                         "ids — forces a real tracking loss and exercises "
                         "closed-loop relocalization (pair with "
                         "--retrieval)")
    ap.add_argument("--reloc-events", type=int, default=0,
                    help="after the frame loop, time N full relocalization "
                         "events (mono inference + retrieval query + "
                         "add_factors + pose-graph solve); implies "
                         "--retrieval")
    args = ap.parse_args()
    if args.reloc_events and args.oracle:
        ap.error("--oracle and --reloc-events do not compose: reloc "
                 "events are timed under forced conditions the oracle "
                 "loop would silently ignore")
    if args.oracle and args.cadence:
        ap.error("--oracle and --cadence do not compose: cadence mode "
                 "disables data-driven keyframing, which would degenerate "
                 "the oracle run to a single INIT keyframe")
    if args.fused and not args.oracle:
        ap.error("--fused is an --oracle mode (the non-oracle bench "
                 "already uses the fused frontend)")
    if args.reloc_events:
        args.retrieval = True

    import jax

    # persistent compile cache: env vars do NOT take effect in this image
    # (sitecustomize initializes jax first) — config.update does.
    # BENCH_CACHE_DIR overrides for cold-cache experiments (--cold).
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from splatt3r_slam_tpu import config as cfgmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgmod.load_config(os.path.join(root, "config", "base.yaml"))
    if args.cadence:
        # pin the keyframe cadence: no data-driven keyframes, no reloc
        cfgmod.config["tracking"]["match_frac_thresh"] = -1.0
        cfgmod.config["tracking"]["min_match_frac"] = 0.0
    if args.match_stride:
        cfgmod.config["matching"]["match_stride"] = int(args.match_stride)
    if args.oracle and not args.fused:
        # the MODULAR tracker consumes full-resolution analytic indices;
        # the TPU subgrid fast path would misread them. The fused mode
        # instead keeps the production stride — the oracle emits subgrid
        # indices directly (PlaneSceneOracle(stride=...)).
        cfgmod.config["matching"]["match_stride"] = 1
    if args.threaded:
        cfgmod.config["single_thread"] = False
    if args.lag:
        cfgmod.config["tracking"]["pipeline_lag"] = 1

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

    if args.oracle:
        run_oracle_closed_loop(args, engine, cfg, h, w, cfgmod)
        return

    def build_system():
        sysm = SLAMSystem(engine, h, w)
        retrieval = None
        if args.retrieval:
            from splatt3r_slam_tpu.retrieval import RetrievalDatabase

            retrieval = RetrievalDatabase(
                feat_dim=cfg.enc_embed_dim,
                proj_dim=min(cfg.enc_embed_dim, 1024),
                **({"n_words": 256, "nfeat": 16} if args.tiny else {}),
            )
        sysm.backend = FactorGraph(engine, sysm.keyframes,
                                   retrieval=retrieval)
        # gaussian accumulation is tied to the render path in the
        # reference (main.py:468 `if enable_gs_viz or render_gaussians`):
        # BASELINE config 3 ("full SLAM loop") runs without it; config 4
        # ("gaussian rendering path") turns it on via --render-stride
        if args.render_stride:
            sysm.gaussian_module = GaussianAccumulator(spatial_stride=4)
        return sysm

    system = build_system()

    def instrument_tasks(sysm, sink):
        """Record per-backend-task wall time (worker thread included)."""
        import time as _t

        inner = sysm._run_backend_task

        def timed(kf_idx, is_reloc_frame=None):
            ts = _t.time()
            try:
                return inner(kf_idx, is_reloc_frame)
            finally:
                sink.append((kf_idx, _t.time() - ts))

        sysm._run_backend_task = timed

    from splatt3r_slam_tpu.runtime.frame import Mode, create_frame
    from splatt3r_slam_tpu.runtime.system import should_append_gaussians

    n = args.frames
    ds = SyntheticDataset(n, h, w)

    from splatt3r_slam_tpu.runtime.frame import FramePrefetcher
    from splatt3r_slam_tpu.splat.decoder import render_frame

    def drive(sysm, dataset, collect=None):
        """Frame loop. Default mode re-bootstraps instead of staying in
        RELOC: random weights produce garbage geometry, so GN failures
        (→ RELOC, reference-faithful) would otherwise dominate timing.
        --cadence K instead forces a keyframe every K frames (reloc and
        data-driven keyframing disabled via config above) — the
        BASELINE measurement config: full loop with keyframing +
        matching + global optimization at a realistic TUM-like rate."""
        import time

        nloc = len(dataset)
        prefetch = FramePrefetcher(
            lambda k: create_frame(k, dataset[k][1], img_size=w), nloc)
        pending_render = [None]
        relocs = 0
        t0 = time.time()
        try:
            for i in range(nloc):
                tg0 = time.time()
                frame = prefetch.get(i)
                if collect is not None:
                    get_waits.append(time.time() - tg0)
                tf0 = time.time()
                force = bool(args.cadence) and i > 0 and \
                    i % args.cadence == 0
                sysm.process_frame(frame, force_keyframe=force)
                if sysm.mode == Mode.RELOC:
                    relocs += 1
                    if args.cadence:
                        # random weights: GN 'fail' flips to RELOC and
                        # skips the keyframe branch; stay in TRACKING and,
                        # on forced-keyframe frames, run the event path
                        # explicitly so its cost IS measured (mirrors the
                        # new_kf branch of process_frame)
                        sysm.mode = Mode.TRACKING
                        if force:
                            sysm.keyframes.append(frame)
                            sysm._dispatch_backend(len(sysm.keyframes) - 1)
                            sysm._append_gaussians(
                                frame, len(sysm.keyframes) - 1)
                            sysm.keyframes.release_older_transients()
                        elif sysm.gaussian_module is not None and \
                                should_append_gaussians(
                                frame, False, sysm.last_gs_frame_id,
                                sysm.last_gs_T_WC):
                            # production policy appends gaussians every
                            # ~min_frame_gap tracked frames too
                            # (main.py:457-476) — measure that cost
                            sysm._append_gaussians(
                                frame, len(sysm.keyframes) - 1)
                    else:
                        sysm.mode = Mode.INIT
                        sysm.process_frame(frame)
                if args.render_stride and i % args.render_stride == 0:
                    sysm.engine.ensure_gaussians(frame)
                    kf = sysm.keyframes.last_keyframe()
                    img_r = render_frame(frame,
                                         kf if kf is not None else frame)
                    if img_r is not None:
                        # 1-render-lag sync: fetch the PREVIOUS render
                        # while this one computes (a real PNG exporter
                        # thread overlaps exactly this way); each fresh
                        # sync otherwise costs a ~35 ms tunnel round-trip
                        prev_r, pending_render[0] = \
                            pending_render[0], img_r
                        if prev_r is not None:
                            np.asarray(prev_r.ravel()[:1])
                if collect is not None:
                    collect.append((time.time() - tf0, force))
        finally:
            prefetch.close()
        td0 = time.time()
        if pending_render[0] is not None:
            np.asarray(pending_render[0].ravel()[:1])
        if not bool(cfgmod.config.get("single_thread", True)):
            sysm._drain_backend()
            sysm._stop = True
        drain_s[0] = time.time() - td0
        dt = time.time() - t0
        # loop FPS = reference semantics (main.py:533-535 measures the
        # frame loop; the backend runs concurrently and is never drained
        # into the FPS print). The final drain is reported separately
        # (t_drain_s + wall_fps_incl_drain) — it can be dominated by a
        # one-off bucket compile when retrieval adds a never-seen edge
        # count (multi-second through the remote tunnel).
        loop_fps[0] = nloc / max(dt - drain_s[0], 1e-9)
        return nloc / dt, relocs

    # warmup: pays all compiles; freed before the timed run (its gaussian
    # pool + keyframes would otherwise occupy HBM alongside the real run).
    # In cadence mode the warmup drives the FULL length: bucket sizes
    # (edge lists, pool chunks, dense-solve dims) grow with keyframe
    # count, and any bucket first reached mid-timed-run would charge its
    # multi-second tunnel compile to steady-state FPS.
    import gc

    if not args.cold:
        warm = build_system()
        n_warm = n if args.cadence else 6
        get_waits, drain_s, loop_fps = [], [0.0], [0.0]
        drive(warm, SyntheticDataset(n_warm, h, w))
        del warm
        gc.collect()

    times, get_waits, drain_s, loop_fps = [], [], [0.0], [0.0]
    task_times = []
    instrument_tasks(system, task_times)
    if args.prewarm:
        system.prewarm()
    fps, relocs = drive(system, ds, collect=times)
    out = {
        "metric": "system_fps_512x384" if not args.tiny else "system_fps_tiny",
        "value": round(loop_fps[0], 3),
        "wall_fps_incl_drain": round(fps, 3),
        "unit": "frames/s",
        "frames": n,
        "keyframes": len(system.keyframes),
        "reboots": relocs,
        "gaussians": int(system.pool.n),
        "backend_edges": len(system.backend.ii),
        "cold": bool(args.cold),
        "prewarm": bool(args.prewarm),
    }
    if args.cadence:
        track_t = [t for t, f in times if not f]
        kf_t = [t for t, f in times if f]
        out.update({
            "mode": "cadence",
            "cadence": args.cadence,
            "threaded": bool(args.threaded),
            "retrieval": bool(args.retrieval),
            "render_stride": args.render_stride,
            "t_track_mean_ms": round(1e3 * float(np.mean(track_t)), 1)
            if track_t else None,
            # medians are robust to one-off compile outliers (first use
            # of a program variant mid-run costs seconds on the tunnel)
            "t_track_p50_ms": round(1e3 * float(np.median(track_t)), 1)
            if track_t else None,
            "t_kf_event_mean_ms": round(1e3 * float(np.mean(kf_t)), 1)
            if kf_t else None,
            "t_kf_event_p50_ms": round(1e3 * float(np.median(kf_t)), 1)
            if kf_t else None,
            "fps_p50_with_renders": round(
                1.0 / max(float(np.median(track_t)), 1e-9), 2)
            if track_t else None,
            # steady-state cycle: (cadence-1) tracked frames + 1 keyframe
            # event, p50 costs (robust to one-off compile outliers)
            "fps_effective_p50": round(args.cadence / max(
                (args.cadence - 1) * float(np.median(track_t))
                + float(np.median(kf_t)), 1e-9), 2)
            if track_t and kf_t else None,
            "t_get_wait_p50_ms": round(
                1e3 * float(np.median(get_waits)), 1) if get_waits else None,
            "t_get_wait_sum_s": round(float(np.sum(get_waits)), 2)
            if get_waits else None,
            "t_drain_s": round(drain_s[0], 2),
            "backend_task_ms": [
                [int(k), round(1e3 * t, 1)] for k, t in task_times
            ],
            "outlier_frames": [
                [int(i), round(1e3 * t, 1)]
                for i, (t, _) in enumerate(times) if t > 1.0
            ],
            "frame_ms": [round(1e3 * t, 1) for t, _ in times],
        })

    if args.reloc_events:
        # RELOC-event cost, end to end (VERDICT r2 item 2): mono
        # inference + pointmap fusion + retrieval query + add_factors on
        # the retrieved candidates + full pose-graph solve. Random
        # weights cannot pass the production strict gate
        # (reloc.min_match_frac 0.3), which would skip add_factors'
        # solve — relax the gate so every event PAYS the full success
        # path (the expensive one); the production gate only makes
        # events cheaper (early return before the solve).
        import time as _t

        cfgmod.config["reloc"]["min_match_frac"] = 0.0
        cfgmod.config["reloc"]["strict"] = False
        cfgmod.config["retrieval"]["min_thresh"] = 0.0
        ds_r = SyntheticDataset(args.reloc_events + 1, h, w, seed=7)
        reloc_ms, successes = [], 0
        for j in range(args.reloc_events + 1):  # event 0 pays compiles
            frame = create_frame(10_000 + j, ds_r[j][1], img_size=w)
            system.mode = Mode.RELOC
            tr0 = _t.time()
            _, success = system.process_frame(frame)
            kf = system.keyframes.last_keyframe()
            if kf is not None:  # fetch = the only real sync on the tunnel
                np.asarray(kf.T_WC)
            dt = _t.time() - tr0
            if j > 0:
                reloc_ms.append(1e3 * dt)
                successes += bool(success)
        system.mode = Mode.TRACKING
        out.update({
            "reloc_events": args.reloc_events,
            "reloc_success": successes,
            "reloc_event_ms_p50": round(float(np.median(reloc_ms)), 1),
            "reloc_event_ms_mean": round(float(np.mean(reloc_ms)), 1),
            "reloc_event_ms": [round(t, 1) for t in reloc_ms],
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
