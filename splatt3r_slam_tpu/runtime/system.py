"""SLAM system: mode state machine + frame loop orchestration.

Spec: reference `main.py:54-561` — INIT → TRACKING (→ RELOC) with keyframe
appends feeding global optimization, Gaussian accumulation policy, and
per-frame render export.

The reference runs frontend/backend/viz as 3 processes over shared CUDA
memory; here a single host process drives jitted device programs and the
"backend" is invoked inline after keyframe/reloc events (the reference's
deterministic `single_thread: True` mode, `main.py:514-531`), with async
dispatch providing compute overlap. A threaded backend mode mirroring the
reference's default is provided by `single_thread=False` (backend solves
on a worker thread; device execution is still serialized by XLA streams).
"""

from __future__ import annotations

import dataclasses
import threading

import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.config import config
from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.runtime.frame import (
    Frame,
    FramePrefetcher,
    GaussianPool,
    KeyframeBuffer,
    Mode,
    create_frame,
)
from splatt3r_slam_tpu.runtime.tracker import FrameTracker


def _host_translation(frame: Frame):
    """Translation of frame.T_WC without a device sync when possible:
    the fused tracker rides it on the per-frame flags pull
    (frame.T_WC_host); pulling T_WC directly costs a ~35 ms tunnel
    round-trip on the tracking critical path."""
    if getattr(frame, "T_WC_host", None) is not None:
        return np.asarray(frame.T_WC_host)
    return np.asarray(frame.T_WC[:3])


def should_append_gaussians(frame: Frame, is_keyframe: bool,
                            last_append_frame_id, last_T_WC,
                            min_translation: float = 0.12,
                            min_frame_gap: int = 3):
    """Gaussian accumulation policy (spec: main.py:54-73): append on
    keyframes, after `min_translation` of motion, or every
    `min_frame_gap` frames."""
    if is_keyframe:
        return True
    if last_append_frame_id is None:
        return True
    if frame.frame_id - last_append_frame_id >= min_frame_gap:
        return True
    if last_T_WC is not None:
        dt = _host_translation(frame) - np.asarray(last_T_WC[:3])
        if np.linalg.norm(dt) > min_translation:
            return True
    return False


@dataclasses.dataclass
class SLAMResult:
    keyframes: KeyframeBuffer
    gaussians: GaussianPool
    n_frames: int
    fps: float


class SLAMSystem:
    """Single-process SLAM driver.

    Parameters
    ----------
    engine: InferenceEngine
    h, w: working resolution (512-crop shape)
    backend: optional FactorGraph-style object with
        `add_neighbor_edge(kf_idx)`, `solve()`, and optional retrieval.
    gaussians: optional gaussian world-accumulation module
        (splat.world.GaussianAccumulator); None disables GS export.
    """

    def __init__(self, engine, h, w, backend=None, gaussian_module=None,
                 K=None, viz_queue=None, fused=True):
        self.engine = engine
        self.h, self.w = h, w
        self.keyframes = KeyframeBuffer(h, w)
        if K is not None:
            self.keyframes.set_intrinsics(K)
        # fused single-dispatch frontend (weighted fusion, calibrated or
        # not); the modular tracker covers the alternate fusion modes
        use_fused = (
            fused
            and config["tracking"]["filtering_mode"] == "weighted_pointmap"
        )
        if use_fused:
            from splatt3r_slam_tpu.runtime.fused import FusedTracker

            self.tracker = FusedTracker(engine, self.keyframes, config)
        else:
            if fused:
                # ~5x slower than the fused single-dispatch frontend —
                # make the perf cliff behind this config knob loud
                print(
                    "[splatt3r-slam-tpu] filtering_mode="
                    f"{config['tracking']['filtering_mode']!r} has no fused "
                    "frontend; falling back to the modular tracker "
                    "(~5x slower per frame). weighted_pointmap restores "
                    "the fast path."
                )
            self.tracker = FrameTracker(engine, self.keyframes)
        self.backend = backend
        self.gaussian_module = gaussian_module
        self.pool = GaussianPool()
        self.mode = Mode.INIT
        self.current_frame = None
        # constant-position motion model: every new frame's pose is seeded
        # from the previous frame's (reference main.py:397-402). Without
        # the seed the frontend GN starts at identity, whose error grows
        # with trajectory length until the solve drops into a wrong basin.
        self._last_frame_T_WC = None
        self.last_gs_frame_id = None
        self.last_gs_T_WC = None
        self.single_thread = bool(config.get("single_thread", True))
        self._backend_lock = threading.Lock()
        self._backend_queue: list[int] = []
        self._backend_thread = None
        self._backend_busy = False
        self._backend_error: Exception | None = None
        self._stop = False
        self.viz_queue = viz_queue

    # ------------------------------------------------------------------
    def prewarm(self, background: bool = True):
        """Compile the known program ladder before the run reaches it
        (VERDICT r04 item 4: cold-cache runs stalled ~20 s mid-sequence
        on first-shape backend compiles). Frontend programs (encode +
        fused step) compile on frame 0 regardless; what this buys is the
        BACKEND ladder — decoder edge batches, the edge gate, and the
        staged solve buckets — compiled on a daemon thread while the
        first frames stream. Populated programs land in jax's in-process
        and persistent caches; a live call racing an in-flight compile
        waits on the per-program lock and pays only the remainder."""
        if self.backend is None or not hasattr(self.backend, "prewarm"):
            return None

        def _run():
            try:
                self.backend.prewarm()
            except Exception as e:  # prewarm is best-effort by design
                print(f"[prewarm] backend prewarm failed: {e!r}")

        if not background:
            _run()
            return None
        t = threading.Thread(target=_run, daemon=True, name="prewarm")
        t.start()
        return t

    # ------------------------------------------------------------------
    def _run_backend_task(self, kf_idx: int, is_reloc_frame=None):
        if self.backend is None:
            return True
        return self.backend.on_keyframe(kf_idx)

    def _dispatch_backend(self, kf_idx: int):
        if self.backend is None:
            return
        if self.single_thread:
            self._run_backend_task(kf_idx)
        else:
            with self._backend_lock:
                self._backend_queue.append(kf_idx)
            if self._backend_thread is None or \
                    not self._backend_thread.is_alive():
                self._backend_thread = threading.Thread(
                    target=self._backend_worker, daemon=True
                )
                self._backend_thread.start()

    def _backend_worker(self):
        import time

        while not self._stop:
            task = None
            with self._backend_lock:
                if self._backend_queue:
                    task = self._backend_queue.pop(0)
                    self._backend_busy = True
            if task is None:
                time.sleep(0.002)
                continue
            try:
                self._run_backend_task(task)
            except Exception as e:  # surfaced on the main thread by drain
                with self._backend_lock:
                    self._backend_error = e
                    self._backend_busy = False
                    self._backend_queue.clear()
                    self._backend_thread = None  # dispatch respawns
                return
            with self._backend_lock:
                self._backend_busy = False

    def _drain_backend(self):
        """Block until the worker is idle; re-raise any worker failure."""
        import time

        while True:
            with self._backend_lock:
                if self._backend_error is not None:
                    err, self._backend_error = self._backend_error, None
                    raise err
                if not self._backend_queue and not self._backend_busy:
                    return
                if (self._backend_queue and not self._backend_busy
                        and (self._backend_thread is None
                             or not self._backend_thread.is_alive())):
                    raise RuntimeError(
                        "backend worker died with "
                        f"{len(self._backend_queue)} pending task(s)"
                    )
            time.sleep(0.002)

    # ------------------------------------------------------------------
    def _append_gaussians(self, frame: Frame, kf_idx: int):
        if self.gaussian_module is None:
            return
        # append consumes only the self-view prediction unless the
        # accumulator opts into the cross view — half the DPT cost
        self.engine.ensure_gaussians(
            frame, need_cross=bool(self.gaussian_module.include_cross)
        )
        out = self.gaussian_module.gaussians_to_world(frame)
        if out is None:
            return
        means, cov_triu, colors, opas = out
        self.pool.append_chunk(means, cov_triu, colors, opas, kf_idx)
        self.last_gs_frame_id = frame.frame_id
        self.last_gs_T_WC = _host_translation(frame)

    # ------------------------------------------------------------------
    def process_frame(self, frame: Frame, force_keyframe: bool = False):
        """Advance the state machine by one frame. Returns (mode, new_kf).

        `force_keyframe` ORs with the tracker's on-device keyframe
        decision (host-side, no recompile) — used by benchmarks to pin a
        keyframe cadence and by callers that need an anchor frame."""
        self.current_frame = frame  # viewer picture-in-picture panel
        if self.mode != Mode.INIT and self._last_frame_T_WC is not None:
            # seed from the last frame's pose (main.py:397-402) — a device
            # array handoff, no host sync
            frame.T_WC = self._last_frame_T_WC
        if self.mode == Mode.INIT:
            X, C = self.engine.inference_mono(frame)
            frame.update_pointmap(X, C, self.tracker.filtering_mode,
                                  self.tracker.filtering_score)
            self.keyframes.append(frame)
            self._dispatch_backend(len(self.keyframes) - 1)
            self._append_gaussians(frame, len(self.keyframes) - 1)
            # keyframes keep pointmaps only (newest stays renderable)
            self.keyframes.release_older_transients()
            self.mode = Mode.TRACKING
            self._last_frame_T_WC = frame.T_WC
            return self.mode, True

        if self.mode == Mode.TRACKING:
            new_kf_dev, try_reloc = self.tracker.track(frame)
            self._last_frame_T_WC = frame.T_WC
            new_kf = new_kf_dev or force_keyframe
            if try_reloc:
                self.mode = Mode.RELOC
                return self.mode, False
            if frame.T_WC_host is None:
                # pipeline_lag=1: this frame's flags (which carry T_WC)
                # haven't been pulled yet — reuse the last consumed host
                # pose for the gaussian motion gate rather than paying a
                # blocking device pull (the 1-frame staleness is the same
                # relaxation the lag itself introduces)
                frame.T_WC_host = getattr(self.tracker, "last_T_WC_host",
                                          None)
            if should_append_gaussians(
                frame, new_kf, self.last_gs_frame_id, self.last_gs_T_WC
            ):
                self._append_gaussians(frame, len(self.keyframes) - 1)
            if new_kf:
                if not new_kf_dev:
                    # forced keyframe: the device path didn't reset the
                    # matcher warm start — drop correspondences against
                    # the OLD keyframe before tracking against the new one
                    self.tracker.reset_idx_f2k()
                self.keyframes.append(frame)
                self._dispatch_backend(len(self.keyframes) - 1)
                self.keyframes.release_older_transients()
            return self.mode, new_kf

        if self.mode == Mode.RELOC:
            X, C = self.engine.inference_mono(frame)
            frame.update_pointmap(X, C, self.tracker.filtering_mode,
                                  self.tracker.filtering_score)
            success = False
            if self.backend is not None:
                success = self.backend.relocalize(frame)
            if success:
                self.keyframes.release_older_transients()
                self.mode = Mode.TRACKING
                self.tracker.reset_idx_f2k()
                self._last_frame_T_WC = frame.T_WC
            return self.mode, success

        raise RuntimeError(f"bad mode {self.mode}")

    def run(self, dataset, max_frames=None, verbose=True):
        import time

        n = len(dataset) if max_frames is None else min(len(dataset),
                                                        max_frames)
        downsample = config["dataset"]["img_downsample"]

        img_size = max(self.h, self.w)

        def load(i):
            _, img = dataset[i]
            return create_frame(i, img, img_size=img_size,
                                downsample=downsample)

        prefetch = FramePrefetcher(load, n)
        t0 = time.time()
        fps = 0.0
        try:
            for i in range(n):
                frame = prefetch.get(i)
                if config.get("use_calib") and self.keyframes.K is not None:
                    frame.K = self.keyframes.K
                self.process_frame(frame)
                if verbose and i % 30 == 29:
                    fps = (i + 1) / (time.time() - t0)
                    print(f"frame {i + 1}/{n}  FPS: {fps:.2f}  "
                          f"mode={self.mode}")
        finally:
            prefetch.close()
        if not self.single_thread:
            self._drain_backend()
        self._stop = True
        elapsed = time.time() - t0
        return SLAMResult(self.keyframes, self.pool, n,
                          n / elapsed if elapsed > 0 else 0.0)
