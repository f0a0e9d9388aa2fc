"""Analytic plane-scene oracle engine for closed-loop validation.

Without the released checkpoint, random weights produce garbage geometry
and the frontend GN fails on every frame — the full SLAM loop can only
be exercised by replaying keyframe events at a fixed cadence (see
`scripts/bench_system.py --cadence`, VERDICT r03 weak-2). This module is
the alternative: a textured-plane scene with a known camera trajectory
whose per-pixel pointmaps and cross-frame correspondences are computed
ANALYTICALLY, so tracking, data-driven keyframe selection, and the
backend pose-graph all run closed-loop exactly as they would with real
weights (mirrors the accuracy oracle of `tests/test_synthetic_accuracy.py`).

Two uses:
- standalone (`inner=None`): a drop-in `InferenceEngine` double for
  accuracy tests — no network at all;
- wrapping the real engine (`inner=engine`): every real network dispatch
  still runs and only its OUTPUTS are replaced by oracle geometry, so a
  benchmark over the wrapper pays the true device cost of the model plus
  a small host overhead for the analytic geometry — a conservative bound
  on real closed-loop FPS (`scripts/bench_system.py --oracle`).

Frame identity travels through the pipeline inside the features: the
oracle stamps `feat[0, 0, 0] = frame_id` after encoding, and the batched
backend matcher (`match_symmetric`, which only sees stacked feature
tensors) recovers ground truth from that slot. With a real `inner` this
perturbs one scalar of one token — invisible to timing and to retrieval.

Spec (what the closed loop must reproduce): reference `main.py:367-536`
frame loop with data-driven keyframing; eval protocol
`scripts/eval_tum.sh:33-52`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_rays(h: int, w: int, focal: float) -> np.ndarray:
    """(h·w, 3) pixel-center unit-z rays, v-major."""
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5,
                       indexing="xy")
    r = np.stack(
        [(u - w / 2) / focal, (v - h / 2) / focal, np.ones_like(u)], -1
    )
    return r.reshape(-1, 3)


def pan_trajectory(n: int, w: int, plane_d: float = 2.0) -> list:
    """TUM-like smooth pan over the plane: lateral translation worth
    ~8% of the image width per frame at the plane depth plus gentle yaw
    and parallax bob, so keyframe overlap decays ~8%/frame and the
    data-driven criterion (match_frac_thresh 0.333) fires every ~6-8
    frames — the realistic TUM cadence the replay benchmarks pinned by
    hand. Shared by `scripts/bench_system.py --oracle` and the CI twin
    (`tests/test_closed_loop.py`)."""
    focal = float(w)
    px_per_frame = 0.078 * w
    poses = []
    for i in range(n):
        yaw = 0.004 * i
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [
            px_per_frame * i * plane_d / focal,
            0.05 * np.sin(0.4 * i),
            0.03 * np.sin(0.23 * i),
        ]
        poses.append(T)
    return poses


def reloc_pan_trajectory(n: int, w: int, blackout: tuple[int, int],
                         revisit_back: int = 8,
                         plane_d: float = 2.0) -> list:
    """Kidnapped-camera variant for closed-loop RELOC validation: pan as
    usual until the occlusion window, then re-emerge with the camera
    back inside the mapped region (`revisit_back` frames before the
    blackout started) and resume panning from there. Without the
    revisit, an ~8%/frame pan leaves every keyframe behind during the
    occlusion and relocalization is geometrically impossible — the
    failure mode is the scene's, not the system's."""
    base = pan_trajectory(n + revisit_back, w, plane_d)
    a, b = blackout
    out = []
    for i in range(n):
        if i >= b:
            out.append(base[max(a - revisit_back, 0) + (i - b)])
        else:
            out.append(base[i])
    return out


class PlaneSceneOracle:
    """Exact-geometry engine over the plane n·X = d.

    Mirrors `InferenceEngine`'s surface (`runtime/inference.py:50`):
    `ensure_encoded`, `ensure_gaussians`, `inference_mono`,
    `match_asymmetric`, `match_symmetric`. Ground-truth 4x4 camera poses
    are registered per frame id with `register()` before the frame is
    processed.
    """

    CONF = 10.0

    def __init__(self, h: int, w: int, focal: float | None = None,
                 plane_n=(0.0, 0.0, 1.0), plane_d: float = 2.0,
                 inner=None, stride: int = 1, noise: float = 0.0,
                 conf_noise: float = 0.0,
                 blackout: tuple[int, int] | None = None):
        self.h, self.w = int(h), int(w)
        self.N = self.h * self.w
        self.focal = float(focal if focal is not None else w)
        self.rays = make_rays(self.h, self.w, self.focal)
        n = np.asarray(plane_n, np.float64)
        self.n = n / np.linalg.norm(n)
        self.d = float(plane_d)
        self.inner = inner
        # matching-subgrid stride: when the production pipeline matches on
        # an (h/s, w/s) subgrid (config matching.match_stride), the oracle
        # emits correspondence indices on that same grid so the fused
        # frontend and the staged backend solves consume them unchanged
        self.stride = max(1, int(stride))
        self.hs, self.ws = self.h // self.stride, self.w // self.stride
        self.Ns = self.hs * self.ws
        self.gt: dict[int, np.ndarray] = {}
        # calibrated prediction noise (VERDICT r04 item 6): `noise` is a
        # depth-proportional pointmap sigma (0.01 ~ MASt3R-like 1% depth
        # error); `conf_noise` a lognormal sigma on the confidences;
        # `blackout` a [a, b) frame-id window modeling full occlusion —
        # matches invalid, geometry meaningless — which forces a real
        # tracking loss and exercises the closed-loop RELOC path
        self.noise = float(noise)
        self.conf_noise = float(conf_noise)
        self.blackout = tuple(blackout) if blackout is not None else None
        # closed-loop benchmark host-cost control: per-pose pointmap cache
        # (keyed by pose bytes; trajectories revisit the active keyframe's
        # pose every frame, so this halves the per-frame analytic work)
        self._pm_cache: dict[bytes, np.ndarray] = {}

    # -- noise model -------------------------------------------------------
    def _rng(self, fid: int, salt: int):
        seed = (0x9E3779B97F4A7C15 * (2 * int(fid) + 1) + salt) % (1 << 64)
        return np.random.default_rng(seed)

    def blacked(self, fid: int) -> bool:
        return (self.blackout is not None
                and self.blackout[0] <= int(fid) < self.blackout[1])

    def _noisy(self, X: np.ndarray, fid: int, salt: int) -> np.ndarray:
        if self.noise <= 0.0:
            return X
        rng = self._rng(fid, salt)
        sigma = self.noise * np.abs(X[:, 2:3])
        return X + rng.standard_normal(X.shape) * sigma

    def _conf(self, n: int, fid: int, salt: int) -> np.ndarray:
        C = np.full((n, 1), self.CONF, np.float32)
        if self.conf_noise > 0.0:
            rng = self._rng(fid, salt)
            C = C * np.exp(
                self.conf_noise * rng.standard_normal((n, 1))
            ).astype(np.float32)
        return C

    # -- ground truth ------------------------------------------------------
    def register(self, frame_id: int, T: np.ndarray):
        self.gt[int(frame_id)] = np.asarray(T, np.float64)

    def gt_pointmap_cam(self, T: np.ndarray) -> np.ndarray:
        """Per-pixel ray/plane intersection in camera coords, (N, 3)."""
        key = T.tobytes()
        hit = self._pm_cache.get(key)
        if hit is not None:
            return hit
        r = self.rays
        Rw = (T[:3, :3] @ r.T).T
        tstar = (self.d - self.n @ T[:3, 3]) / (Rw @ self.n)
        out = r * tstar[:, None]
        if len(self._pm_cache) > 64:
            self._pm_cache.clear()
        self._pm_cache[key] = out
        return out

    def _project(self, T_src: np.ndarray, T_dst: np.ndarray):
        """src pixels' world points in dst's image: continuous (u, v),
        in-bounds mask (N,), X in dst cam (N, 3)."""
        Xc_src = self.gt_pointmap_cam(T_src)
        Xw = (T_src[:3, :3] @ Xc_src.T).T + T_src[:3, 3]
        Xc = (T_dst[:3, :3].T @ (Xw - T_dst[:3, 3]).T).T
        z = np.maximum(Xc[:, 2], 1e-9)
        u = self.focal * Xc[:, 0] / z + self.w / 2
        v = self.focal * Xc[:, 1] / z + self.h / 2
        ok = (u >= 0) & (u < self.w) & (v >= 0) & (v < self.h) \
            & (Xc[:, 2] > 0)
        return u, v, ok, Xc

    def project_into(self, T_src: np.ndarray, T_dst: np.ndarray):
        """src pixels' world points in dst's image: (flat idx (N,),
        in-bounds mask (N,), X in dst cam (N, 3))."""
        u, v, ok, Xc = self._project(T_src, T_dst)
        ui = np.clip(np.floor(u).astype(np.int64), 0, self.w - 1)
        vi = np.clip(np.floor(v).astype(np.int64), 0, self.h - 1)
        return vi * self.w + ui, ok, Xc

    def project_into_sub(self, T_src: np.ndarray, T_dst: np.ndarray):
        """Subgrid variant: src SUBGRID pixels' points located on dst's
        (hs, ws) matching subgrid. Returns (flat sub idx (Ns,),
        mask (Ns,), X in dst cam (Ns, 3)). Subgrid sample (i, j) is the
        full-res pixel (s*i, s*j); the match index is the NEAREST dst
        subgrid sample (round), mirroring the quantization the full-res
        path gets from floor()."""
        s = self.stride
        u, v, ok, Xc = self._project(T_src, T_dst)

        def sub(a):
            return np.ascontiguousarray(
                a.reshape(self.h, self.w, -1)[::s, ::s]
            ).reshape(self.Ns, -1)

        u_s, v_s = sub(u)[:, 0], sub(v)[:, 0]
        ui = np.clip(np.rint((u_s - 0.5) / s).astype(np.int64),
                     0, self.ws - 1)
        vi = np.clip(np.rint((v_s - 0.5) / s).astype(np.int64),
                     0, self.hs - 1)
        return vi * self.ws + ui, sub(ok)[:, 0], sub(Xc)

    # -- InferenceEngine surface --------------------------------------------
    # passthroughs so the fused frontend (FusedTracker) can build its
    # device program around the wrapped REAL model
    @property
    def model(self):
        return self.inner.model

    @property
    def params(self):
        return self.inner.params

    def _stamp(self, frame):
        # frame identity rides in the feature dtype; bf16 features can
        # only represent integers exactly up to 256 — a silently rounded
        # id would corrupt ground-truth recovery in match_symmetric
        fid = float(frame.frame_id)
        # representability check on HOST dtypes (ml_dtypes covers bf16);
        # a device-scalar roundtrip here would sync the tunnel per frame
        if float(np.array(fid, np.dtype(frame.feat.dtype))) != fid:
            raise ValueError(
                f"frame_id {frame.frame_id} not exactly representable in "
                f"feature dtype {frame.feat.dtype}; cap the oracle run "
                "length (e.g. --frames <= 256 for bfloat16 features)"
            )
        frame.feat = frame.feat.at[0, 0, 0].set(fid)

    def ensure_encoded(self, frame):
        if frame.feat is not None:
            return
        if self.inner is not None:
            self.inner.ensure_encoded(frame)
        else:
            frame.feat = jnp.zeros((1, 1, 1), jnp.float32)
            frame.pos = jnp.zeros((1, 1, 2), jnp.float32)
        self._stamp(frame)

    def ensure_gaussians(self, frame, need_cross: bool = True):
        if self.inner is not None:
            self.inner.ensure_gaussians(frame, need_cross)

    def inference_mono(self, frame):
        self.ensure_encoded(frame)
        if self.inner is not None:
            self.inner.inference_mono(frame)  # real cost; output replaced
        fid = frame.frame_id
        if self.blacked(fid):
            # occluded: geometry is a meaningless constant-depth sheet
            X = (self.rays * self.d).astype(np.float32)
        else:
            X = self._noisy(self.gt_pointmap_cam(self.gt[fid]), fid, 0)
        C = self._conf(self.N, fid, 1)
        return jnp.asarray(X, jnp.float32), jnp.asarray(C)

    def match_asymmetric(self, frame, keyframe, idx_i2j_init=None):
        self.ensure_encoded(frame)
        self.ensure_encoded(keyframe)
        if self.inner is not None:
            self.inner.match_asymmetric(frame, keyframe, idx_i2j_init)
        fid, kid = frame.frame_id, keyframe.frame_id
        Tf = self.gt[fid]
        Tk = self.gt[kid]
        # per keyframe pixel: its match in the frame + its GT position in
        # the frame's camera (the decoder's cross-prediction)
        idx, ok, Xkf = self.project_into(Tk, Tf)
        if self.blacked(fid) or self.blacked(kid):
            ok = np.zeros_like(ok)
        Xff = self._noisy(self.gt_pointmap_cam(Tf), fid, 0)
        Xkf = self._noisy(Xkf, fid, 2)
        ones = np.full((self.N, 1), self.CONF, np.float32)
        return (
            jnp.asarray(idx[None], jnp.int32),
            jnp.asarray(ok[None, :, None]),
            jnp.asarray(Xff, jnp.float32), jnp.asarray(self._conf(self.N, fid, 1)),
            jnp.asarray(ones),
            jnp.asarray(Xkf, jnp.float32), jnp.asarray(self._conf(self.N, fid, 3)),
            jnp.asarray(ones),
        )

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j):
        if self.inner is not None:
            self.inner.match_symmetric(feat_i, pos_i, feat_j, pos_j)
        # slice on device, pull E scalars — not the (E, P, C) tensors
        # (a ~12 MB/event fetch over a remote tunnel otherwise)
        ids_i = np.rint(np.asarray(feat_i[:, 0, 0])).astype(int)
        ids_j = np.rint(np.asarray(feat_j[:, 0, 0])).astype(int)
        proj = (self.project_into_sub if self.stride > 1
                else self.project_into)
        E, N = len(ids_i), (self.Ns if self.stride > 1 else self.N)
        idx_i2j = np.zeros((E, N), np.int64)
        idx_j2i = np.zeros((E, N), np.int64)
        valid_j = np.zeros((E, N, 1), bool)
        valid_i = np.zeros((E, N, 1), bool)
        for e, (fi, fj) in enumerate(zip(ids_i, ids_j)):
            Ti, Tj = self.gt[fi], self.gt[fj]
            idx_i2j[e], valid_j[e, :, 0], _ = proj(Tj, Ti)
            idx_j2i[e], valid_i[e, :, 0], _ = proj(Ti, Tj)
            if self.blacked(fi) or self.blacked(fj):
                valid_j[e] = False
                valid_i[e] = False
        Q = jnp.full((E, N, 1), self.CONF)
        return (jnp.asarray(idx_i2j, jnp.int32),
                jnp.asarray(idx_j2i, jnp.int32),
                jnp.asarray(valid_j), jnp.asarray(valid_i), Q, Q, Q, Q)

    def match_oneway(self, feat_i, pos_i, feat_j, pos_j):
        """One direction of a (i, j) edge — the backend's
        `add_neighbor_edge_from_tracking` complement. Same return
        contract as `InferenceEngine.match_oneway`: rows are j's subgrid
        pixels located in i's image."""
        if self.inner is not None:
            self.inner.match_oneway(feat_i, pos_i, feat_j, pos_j)
        fi = int(np.rint(np.asarray(feat_i[0, 0, 0])))
        fj = int(np.rint(np.asarray(feat_j[0, 0, 0])))
        proj = (self.project_into_sub if self.stride > 1
                else self.project_into)
        idx, ok, _ = proj(self.gt[fj], self.gt[fi])
        if self.blacked(fi) or self.blacked(fj):
            ok = np.zeros_like(ok)
        Q = jnp.full((len(idx),), self.CONF)
        return jnp.asarray(idx, jnp.int32), jnp.asarray(ok), Q

    def fused_inputs(self, frame_id: int, kf_frame_id: int) -> dict:
        """Per-frame oracle inputs for the fused single-dispatch tracking
        step (`runtime/fused.py` with_oracle=True). The geometry itself
        (exact pointmaps, cross-prediction, subgrid matches) is generated
        ON DEVICE inside the step (`fused._oracle_geometry`) from the two
        GT poses — per frame the host ships a few dozen floats, not
        megabytes of pointmaps (the v5e closed loop is transfer-bound
        over the remote tunnel otherwise). `on` is a RUNTIME scalar
        predicate: the step selects oracle-vs-network values with
        `jnp.where(on, ...)`, so XLA must still execute the full
        network + matcher — the benchmark pays every production device
        cost. Pointmap noise rides a per-frame `fold_in(fid)` device
        RNG; `conf_noise` applies only to the modular/mono paths."""
        fid = int(frame_id)
        blk = self.blacked(fid) or self.blacked(int(kf_frame_id))
        out = {
            "on": jnp.float32(1.0),
            "T_f": jnp.asarray(self.gt[fid], jnp.float32),
            "T_k": jnp.asarray(self.gt[int(kf_frame_id)], jnp.float32),
            "plane_n": jnp.asarray(self.n, jnp.float32),
            "plane_d": jnp.float32(self.d),
            "focal": jnp.float32(self.focal),
            "fid": jnp.int32(fid),
            "ok": jnp.float32(0.0 if blk else 1.0),
        }
        if self.noise > 0.0:
            out["sigma"] = jnp.float32(self.noise)
        return out


class OracleRetrieval:
    """Retrieval-database double for closed-loop reloc validation.

    Candidates are ranked by TRUE view overlap (fraction of the
    keyframe's pixels visible in the query frame, from GT poses) —
    modeling an ideal retrieval so the reloc path's REAL machinery
    (strict add_factors gate, pose seed from the top candidate,
    pose-graph solve; `backend/factor_graph.py::relocalize`, spec
    `main.py:76-119`) is exercised deterministically. Pass the real
    `RetrievalDatabase` as `inner` to also pay its full device+host
    query cost per event (same wrapping pattern as PlaneSceneOracle).

    Mirrors `RetrievalDatabase.update/add_to_database`: update returns
    keyframe indices, which here equal add-order positions (every
    keyframe event adds exactly one entry, in order)."""

    def __init__(self, oracle: PlaneSceneOracle, inner=None,
                 min_overlap: float = 0.25):
        self.oracle = oracle
        self.inner = inner
        self.min_overlap = float(min_overlap)
        self.fids: list[int] = []

    def update(self, frame, add_after_query=True, k=3, min_thresh=0.0):
        if self.inner is not None:
            self.inner.update(frame, add_after_query=add_after_query,
                              k=k, min_thresh=min_thresh)
        Tq = self.oracle.gt[int(frame.frame_id)]
        scores = []
        for kf_idx, fid in enumerate(self.fids):
            _, ok, _ = self.oracle.project_into(self.oracle.gt[fid], Tq)
            scores.append((float(ok.mean()), kf_idx))
        top = [i for s, i in sorted(scores, reverse=True)[:int(k)]
               if s >= self.min_overlap]
        if add_after_query:
            self.add_to_database(frame)
        return top

    def add_to_database(self, frame):
        if self.inner is not None:
            self.inner.add_to_database(frame)
        self.fids.append(int(frame.frame_id))
