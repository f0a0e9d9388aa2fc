"""Factor graph over keyframe pairs + backend driver.

Spec: reference `splatt3r_slam/global_opt.py:12-213` (edge creation from
symmetric matching with bidirectional match-fraction gating, two-way edge
preparation, GN solves writing poses back) and the backend loop
`main.py:122-190` (neighbor edge + retrieval edges per new keyframe,
relocalization path `main.py:76-119`).

TPU adaptations: edge state lives in preallocated host-numpy buffers and
is shipped to the solver as bucket-padded device arrays (static shapes ⇒
one compile per bucket size); gating fractions are computed by one jitted
reduction per add_factors call.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.config import config
from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.ops import pose_graph
from splatt3r_slam_tpu.runtime.frame import Frame, KeyframeBuffer


def _bucket(n: int, buckets=(8, 16, 32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@jax.jit
def _edge_gate_jit(idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij,
                   Q_conf):
    """Post-match edge gating as ONE device program.

    Eagerly this is ~20 dispatch round-trips per add_factors call
    (gathers, sqrt, compares, means, per-edge slices — ~70 ms measured
    on a remote-TPU platform). Returns per-edge tuples (unstacked inside
    the jit: a single dispatch hands back E small arrays) plus the
    stacked (2, E) match fractions for the single host pull."""
    E = idx_i2j.shape[0]
    bidx = jnp.arange(E)[:, None]
    # Qj = sqrt(Qii[idx_i2j]·Qji); Qi = sqrt(Qjj[idx_j2i]·Qij)
    Qj = jnp.sqrt(Qii[bidx, idx_i2j] * Qji)
    Qi = jnp.sqrt(Qjj[bidx, idx_j2i] * Qij)
    vj = valid_j & (Qj > Q_conf)
    vi = valid_i & (Qi > Q_conf)
    frac = jnp.stack([vj.mean(axis=(1, 2)), vi.mean(axis=(1, 2))])
    return (
        tuple(idx_i2j), tuple(idx_j2i),
        tuple(valid_j[:, :, 0]), tuple(valid_i[:, :, 0]),
        tuple(Qj[:, :, 0]), tuple(Qi[:, :, 0]),
        frac,
    )


class FactorGraph:
    def __init__(self, engine, frames: KeyframeBuffer, K=None,
                 retrieval=None):
        self.engine = engine
        self.frames = frames
        self.cfg = config["local_opt"]
        self.K = K
        self.retrieval = retrieval

        self.ii: list[int] = []
        self.jj: list[int] = []
        # per-edge (N,) arrays stay DEVICE-resident: re-uploading the
        # (E, N) index/valid/Q matrices for every solve cost ~5 s per
        # keyframe over a remote-TPU link (~20 MB each way)
        self.idx_ii2jj: list = []
        self.idx_jj2ii: list = []
        self.valid_match_j: list = []
        self.valid_match_i: list = []
        self.Q_ii2jj: list = []
        self.Q_jj2ii: list = []

    # ------------------------------------------------------------------
    def add_factors(self, ii, jj, min_match_frac, is_reloc=False) -> bool:
        """Create edges (ii[k], jj[k]) via symmetric matching with
        bidirectional gating (spec: global_opt.py:30-99)."""
        if len(ii) == 0:
            return False
        kf_ii = [self.frames[int(i)] for i in ii]
        kf_jj = [self.frames[int(j)] for j in jj]
        for kf in kf_ii + kf_jj:
            self.engine.ensure_encoded(kf)
        feat_i = jnp.concatenate([k.feat for k in kf_ii])
        feat_j = jnp.concatenate([k.feat for k in kf_jj])
        pos_i = jnp.concatenate([k.pos for k in kf_ii])
        pos_j = jnp.concatenate([k.pos for k in kf_jj])

        (idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij
         ) = self.engine.match_symmetric(feat_i, pos_i, feat_j, pos_j)

        (idx_i2j_t, idx_j2i_t, valid_j_t, valid_i_t, Qj_t, Qi_t, frac
         ) = _edge_gate_jit(
            idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij,
            jnp.float32(self.cfg["Q_conf"]),
        )
        frac = np.asarray(frac)  # the one host pull
        frac_j, frac_i = frac[0], frac[1]

        ii_np = np.asarray(ii, np.int64)
        jj_np = np.asarray(jj, np.int64)
        invalid = np.minimum(frac_j, frac_i) < min_match_frac
        consecutive = ii_np == (jj_np - 1)
        invalid = (~consecutive) & invalid
        if invalid.any() and is_reloc:
            return False

        keep = ~invalid
        added = False
        for k in np.nonzero(keep)[0]:
            self.ii.append(int(ii_np[k]))
            self.jj.append(int(jj_np[k]))
            self.idx_ii2jj.append(idx_i2j_t[k])
            self.idx_jj2ii.append(idx_j2i_t[k])
            self.valid_match_j.append(valid_j_t[k])
            self.valid_match_i.append(valid_i_t[k])
            self.Q_ii2jj.append(Qj_t[k])
            self.Q_jj2ii.append(Qi_t[k])
            added = True
        self._enforce_max_edges()
        return added

    def _enforce_max_edges(self):
        """Sliding-window edge capacity (config `local_opt.max_edges`).

        The reference grows its edge lists unboundedly
        (global_opt.py:89-96); a static capacity keeps the TPU solve
        inside the bucket-padded shapes (staged solves double edges, so
        E must stay <= half the largest bucket). Eviction drops the
        oldest loop-closure (non-consecutive) edges first, then the
        oldest odometry edges — keyframes that lose all edges simply
        freeze at their last optimized pose (standard sliding-window
        pose graph)."""
        cap = int(float(self.cfg.get("max_edges", 1024)))
        cap = min(cap, 1024)  # staged two-way doubling: bucket max 2048
        E = len(self.ii)
        if E <= cap:
            return
        drop = E - cap
        nonconsec = [k for k in range(E) if self.ii[k] != self.jj[k] - 1]
        consec = [k for k in range(E) if self.ii[k] == self.jj[k] - 1]
        victims = set((nonconsec + consec)[:drop])
        keep = [k for k in range(E) if k not in victims]
        for name in ("ii", "jj", "idx_ii2jj", "idx_jj2ii",
                     "valid_match_j", "valid_match_i",
                     "Q_ii2jj", "Q_jj2ii"):
            lst = getattr(self, name)
            setattr(self, name, [lst[k] for k in keep])

    # ------------------------------------------------------------------
    def get_unique_kf_idx(self):
        return np.unique(np.concatenate([self.ii, self.jj])) if self.ii else \
            np.asarray([], np.int64)

    def _staged_inputs(self, unique_kf):
        """Host-side staging for the jitted GN: per-keyframe and per-edge
        arrays as bucket-padded TUPLES (stacking happens inside the jit —
        each eager stack/pad/divide op costs ~2-3 s of one-off compile on
        a remote-TPU platform). Keyframe padding repeats entry 0 (poses
        beyond m get identity diagonal in _assemble_dense and are
        discarded); edge padding is masked by `edge_on`."""
        fr = [self.frames[int(i)] for i in unique_kf]
        m = len(fr)
        m_pad = _bucket(m)
        Twc_t = tuple(f.T_WC for f in fr) + (fr[0].T_WC,) * (m_pad - m)
        Xs_t = tuple(f.X_canon for f in fr) + (fr[0].X_canon,) * (m_pad - m)
        Cs_t = tuple(f.C for f in fr) + (fr[0].C,) * (m_pad - m)
        Ns = np.asarray([max(f.N, 1) for f in fr] + [1] * (m_pad - m),
                        np.float32)

        rank = {int(k): r for r, k in enumerate(unique_kf)}
        ii = np.asarray([rank[i] for i in self.ii] +
                        [rank[j] for j in self.jj], np.int32)
        jj = np.asarray([rank[j] for j in self.jj] +
                        [rank[i] for i in self.ii], np.int32)
        E = len(ii)
        Epad = _bucket(E)
        on = np.zeros((Epad,), np.float32)
        on[:E] = 1.0

        def padh(a):
            out = np.zeros((Epad,), a.dtype)
            out[:E] = a
            return out

        def padt(lst):
            t = tuple(lst)
            return t + (t[0],) * (Epad - E)

        idx_t = padt(self.idx_ii2jj + self.idx_jj2ii)
        valid_t = padt(self.valid_match_j + self.valid_match_i)
        Q_t = padt(self.Q_ii2jj + self.Q_jj2ii)
        return (m, Twc_t, Xs_t, Cs_t, Ns, jnp.asarray(padh(ii)),
                jnp.asarray(padh(jj)), idx_t, valid_t, Q_t,
                jnp.asarray(on))

    def _stride_params(self):
        """(sub_stride, sub_hw, pix_stride) for the staged solves.

        The edge state is built on the matching subgrid
        (`matching.match_stride`, see InferenceEngine.match_symmetric);
        the solver subgrids its keyframe pointmaps to the same grid and
        the configured `gn_stride` (full-res row subsampling semantics)
        is divided by the rows the subgrid already removed."""
        s = max(1, int(config["matching"].get("match_stride", 1)))
        ds = int(config.get("dataset", {}).get("img_downsample", 1))
        sub_hw = (self.frames.h // ds, self.frames.w // ds)
        gn = int(self.cfg.get("gn_stride", 1))
        pix_stride = max(1, gn // (s * s))
        return s, sub_hw, pix_stride

    def _rays_statics(self):
        """Static kwargs for the staged ray solve — shared by the live
        solve and prewarm so their XLA cache keys match exactly."""
        sub_stride, sub_hw, pix_stride = self._stride_params()
        return dict(
            num_fix=int(self.cfg["pin"]),
            max_iter=int(self.cfg["max_iters"]),
            sigma_ray=float(self.cfg["sigma_ray"]),
            sigma_dist=float(self.cfg["sigma_dist"]),
            C_thresh=float(self.cfg["C_conf"]),
            Q_thresh=float(self.cfg["Q_conf"]),
            delta_thresh=float(self.cfg["delta_norm"]),
            pix_stride=pix_stride,
            sub_stride=sub_stride, sub_hw=sub_hw,
        )

    def solve_GN_rays(self):
        """(spec: global_opt.py:121-158)"""
        pin = int(self.cfg["pin"])
        unique_kf = self.get_unique_kf_idx()
        if len(unique_kf) <= pin:
            return
        (m, Twc_t, Xs_t, Cs_t, Ns, ii, jj, idx_t, valid_t, Q_t,
         on) = self._staged_inputs(unique_kf)

        Twc_new = pose_graph.gauss_newton_rays_staged(
            Twc_t, Xs_t, Cs_t, Ns, ii, jj, idx_t, valid_t, Q_t, on,
            **self._rays_statics(),
        )
        self.frames.update_T_WCs(Twc_new[pin:len(unique_kf)],
                                 unique_kf[pin:])

    def _calib_statics(self, img_size):
        sub_stride, sub_hw, pix_stride = self._stride_params()
        return dict(
            img_size=img_size,
            num_fix=int(self.cfg["pin"]),
            max_iter=int(self.cfg["max_iters"]),
            pixel_border=float(self.cfg["pixel_border"]),
            z_eps=float(self.cfg["depth_eps"]),
            sigma_pixel=float(self.cfg["sigma_pixel"]),
            sigma_depth=float(self.cfg["sigma_depth"]),
            C_thresh=float(self.cfg["C_conf"]),
            Q_thresh=float(self.cfg["Q_conf"]),
            delta_thresh=float(self.cfg["delta_norm"]),
            pix_stride=pix_stride,
            sub_stride=sub_stride, sub_hw=sub_hw,
        )

    def solve_GN_calib(self):
        """(spec: global_opt.py:160-213)"""
        pin = int(self.cfg["pin"])
        unique_kf = self.get_unique_kf_idx()
        if len(unique_kf) <= pin:
            return
        img_size = tuple(
            int(v) for v in np.asarray(self.frames[0].img_shape).reshape(-1)[:2]
        )
        (m, Twc_t, Xs_t, Cs_t, Ns, ii, jj, idx_t, valid_t, Q_t,
         on) = self._staged_inputs(unique_kf)

        Twc_new = pose_graph.gauss_newton_calib_staged(
            Twc_t, Xs_t, Cs_t, Ns, self.K, ii, jj, idx_t, valid_t, Q_t,
            on, **self._calib_statics(img_size),
        )
        self.frames.update_T_WCs(Twc_new[pin:len(unique_kf)],
                                 unique_kf[pin:])

    def solve(self):
        if config.get("use_calib") and self.K is not None:
            self.solve_GN_calib()
        else:
            self.solve_GN_rays()

    # ------------------------------------------------------------------
    def prewarm(self, edge_batches=(1, 3), solve_buckets=((8, 8), (8, 16),
                                                          (8, 32), (16, 32),
                                                          (16, 64))):
        """Populate the compile caches for the backend's first shape
        ladder before the run reaches it (VERDICT r04 item 4: a
        cold-cache run stalled ~20 s mid-sequence when the first
        retrieval edges hit a never-seen decoder batch; over a remote
        tunnel every first-shape program costs seconds).

        Each known program variant runs once on zeros — the statics come
        from the same helpers the live solve uses, so the XLA cache keys
        match exactly. Intended to run on a background thread while the
        first frames stream (`SLAMSystem.prewarm`); a live call that
        races an in-flight compile simply waits on jax's per-program
        lock and pays nothing extra.

        edge_batches: add_factors edge counts to prewarm (decoder batch
        2·bucket(E), matcher, edge gate). solve_buckets: (kf_pad,
        edge_pad) staged-solve shapes — the ladder the first ~25
        keyframes climb (two-way doubling: Epad = bucket(2E))."""
        eng = getattr(self.engine, "inner", None) or self.engine
        if not hasattr(eng, "model"):
            return  # standalone oracle: nothing compiles
        h, w = self.frames.h, self.frames.w
        cfgm = eng.model.cfg
        P = (h // cfgm.patch_size) * (w // cfgm.patch_size)
        C = cfgm.enc_embed_dim

        sub_stride, sub_hw, _ = self._stride_params()
        ns = (sub_hw[0] // sub_stride) * (sub_hw[1] // sub_stride)
        n = sub_hw[0] * sub_hw[1]

        def zero_feat(E):
            # feat fp32 (encoder output is LN'd to fp32), pos int32
            # (patch-grid indices) — dtypes must match the live arrays
            # or the prewarmed programs miss the cache
            return (jnp.zeros((E, P, C), jnp.float32),
                    jnp.zeros((E, P, 2), jnp.int32))

        for E in edge_batches:
            f, p = zero_feat(E)
            res = eng.match_symmetric(f, p, f, p)
            _edge_gate_jit(*res, jnp.float32(self.cfg["Q_conf"]))
        # consecutive-edge fast path (one-way decode+match)
        f1, p1 = zero_feat(1)
        eng.match_oneway(f1, p1, f1, p1)

        use_calib = bool(config.get("use_calib")) and self.K is not None
        for m_pad, Epad in solve_buckets:
            Twc_t = tuple(sim3.identity() for _ in range(m_pad))
            Xs_t = (jnp.zeros((n, 3), jnp.float32),) * m_pad
            Cs_t = (jnp.ones((n, 1), jnp.float32),) * m_pad
            Ns = np.ones((m_pad,), np.float32)
            ii = jnp.zeros((Epad,), jnp.int32)
            jj = jnp.ones((Epad,), jnp.int32)
            idx_t = (jnp.zeros((ns,), jnp.int32),) * Epad
            valid_t = (jnp.zeros((ns,), bool),) * Epad
            Q_t = (jnp.ones((ns,), jnp.float32),) * Epad
            on = jnp.zeros((Epad,), jnp.float32).at[:2].set(1.0)
            if use_calib:
                pose_graph.gauss_newton_calib_staged(
                    Twc_t, Xs_t, Cs_t, Ns, self.K, ii, jj, idx_t,
                    valid_t, Q_t, on, **self._calib_statics((h, w)),
                )
            else:
                pose_graph.gauss_newton_rays_staged(
                    Twc_t, Xs_t, Cs_t, Ns, ii, jj, idx_t, valid_t, Q_t,
                    on, **self._rays_statics(),
                )

    # ------------------------------------------------------------------
    # backend-driver API used by SLAMSystem
    # ------------------------------------------------------------------
    def add_neighbor_edge_from_tracking(self, kf_idx: int) -> bool:
        """Consecutive edge (kf_idx-1, kf_idx) reusing the direction the
        fused tracking step already computed (Frame.edge_half): only the
        reverse decode+match runs, and — since the reference never gates
        consecutive edges (global_opt.py: `consecutive` bypass) — no
        match-fraction host pull is needed. Fully async edge creation."""
        if not bool(self.cfg.get("reuse_tracking_edge", True)):
            return False
        frame_j = self.frames[kf_idx]
        eh = getattr(frame_j, "edge_half", None)
        if eh is None or eh["kf_idx"] != kf_idx - 1:
            return False
        kf_i = self.frames[kf_idx - 1]
        self.engine.ensure_encoded(kf_i)
        self.engine.ensure_encoded(frame_j)
        idx_i2j, valid_j, Qj = self.engine.match_oneway(
            kf_i.feat, kf_i.pos, frame_j.feat, frame_j.pos
        )
        self.ii.append(kf_idx - 1)
        self.jj.append(kf_idx)
        self.idx_ii2jj.append(idx_i2j)
        self.idx_jj2ii.append(eh["idx_j2i"])
        self.valid_match_j.append(valid_j)
        self.valid_match_i.append(eh["valid_i"])
        self.Q_ii2jj.append(Qj)
        self.Q_jj2ii.append(eh["Qi"])
        frame_j.edge_half = None
        self._enforce_max_edges()
        return True

    def on_keyframe(self, kf_idx: int) -> bool:
        """Neighbor edge + retrieval edges + solve (spec: main.py:142-190)."""
        edges_ii, edges_jj = [], []
        if kf_idx > 0 and not self.add_neighbor_edge_from_tracking(kf_idx):
            edges_ii.append(kf_idx - 1)
            edges_jj.append(kf_idx)
        if self.retrieval is not None and kf_idx >= 0:
            frame = self.frames[kf_idx]
            retr = self.retrieval.update(
                frame,
                add_after_query=True,
                k=int(config["retrieval"]["k"]),
                min_thresh=float(config["retrieval"]["min_thresh"]),
            )
            for r in retr:
                edges_ii.append(int(r))
                edges_jj.append(kf_idx)
        if edges_ii:
            self.add_factors(edges_ii, edges_jj,
                             float(self.cfg["min_match_frac"]))
        self.solve()
        return True

    def relocalize(self, frame: Frame) -> bool:
        """Retrieval-anchored relocalization (spec: main.py:76-119)."""
        if self.retrieval is None:
            return False
        rcfg = config["reloc"]
        retr = self.retrieval.update(
            frame,
            add_after_query=False,
            k=int(config["retrieval"]["k"]),
            min_thresh=float(config["retrieval"]["min_thresh"]),
        )
        if len(retr) == 0:
            return False
        self.frames.append(frame)
        kf_idx = len(self.frames) - 1
        # keep retrieval-SCORE order (dedupe preserving order): the pose is
        # seeded from retr[0], which must be the best-scoring candidate,
        # not the lowest-index one (main.py:109 `keyframes.T_WC[kf_idx[0]]`)
        seen: set[int] = set()
        retr = [int(r) for r in retr
                if int(r) not in seen and not seen.add(int(r))]
        successful = self.add_factors(
            retr, [kf_idx] * len(retr),
            float(rcfg["min_match_frac"]),
            is_reloc=bool(rcfg["strict"]),
        )
        if successful:
            self.retrieval.add_to_database(frame)
            # seed pose from the top-scoring retrieved keyframe (main.py:96-109)
            frame.T_WC = self.frames[retr[0]].T_WC
            frame.T_WC_host = None  # stale after the reseed
            self.frames[kf_idx] = frame
            self.solve()
            return True
        self.frames.pop_last()
        return False
