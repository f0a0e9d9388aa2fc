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

import numpy as np
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
        self.idx_ii2jj: list[np.ndarray] = []
        self.idx_jj2ii: list[np.ndarray] = []
        self.valid_match_j: list[np.ndarray] = []
        self.valid_match_i: list[np.ndarray] = []
        self.Q_ii2jj: list[np.ndarray] = []
        self.Q_jj2ii: list[np.ndarray] = []

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

        E = idx_i2j.shape[0]
        # Qj = sqrt(Qii[idx_i2j]·Qji); Qi = sqrt(Qjj[idx_j2i]·Qij)
        bidx = jnp.arange(E)[:, None]
        Qj = jnp.sqrt(Qii[bidx, idx_i2j] * Qji)
        Qi = jnp.sqrt(Qjj[bidx, idx_j2i] * Qij)

        Q_conf = float(self.cfg["Q_conf"])
        vj = valid_j & (Qj > Q_conf)
        vi = valid_i & (Qi > Q_conf)
        frac_j = np.asarray(vj.mean(axis=(1, 2)))
        frac_i = np.asarray(vi.mean(axis=(1, 2)))

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
            self.idx_ii2jj.append(np.asarray(idx_i2j[k]))
            self.idx_jj2ii.append(np.asarray(idx_j2i[k]))
            self.valid_match_j.append(np.asarray(valid_j[k, :, 0]))
            self.valid_match_i.append(np.asarray(valid_i[k, :, 0]))
            self.Q_ii2jj.append(np.asarray(Qj[k, :, 0]))
            self.Q_jj2ii.append(np.asarray(Qi[k, :, 0]))
            added = True
        return added

    # ------------------------------------------------------------------
    def get_unique_kf_idx(self):
        return np.unique(np.concatenate([self.ii, self.jj])) if self.ii else \
            np.asarray([], np.int64)

    def _prep_two_way(self, unique_kf):
        """Two-way edges with local (rank) indices + bucket padding."""
        rank = {int(k): r for r, k in enumerate(unique_kf)}
        ii = np.asarray([rank[i] for i in self.ii] +
                        [rank[j] for j in self.jj], np.int32)
        jj = np.asarray([rank[j] for j in self.jj] +
                        [rank[i] for i in self.ii], np.int32)
        idx = np.stack(self.idx_ii2jj + self.idx_jj2ii)
        valid = np.stack(self.valid_match_j + self.valid_match_i)
        Q = np.stack(self.Q_ii2jj + self.Q_jj2ii)

        E = len(ii)
        Epad = _bucket(E)
        on = np.zeros((Epad,), np.float32)
        on[:E] = 1.0

        def pad(a, fill=0):
            out = np.full((Epad,) + a.shape[1:], fill, a.dtype)
            out[:E] = a
            return out

        return (jnp.asarray(pad(ii)), jnp.asarray(pad(jj)),
                jnp.asarray(pad(idx)), jnp.asarray(pad(valid)),
                jnp.asarray(pad(Q.astype(np.float32))), jnp.asarray(on))

    def solve_GN_rays(self):
        """(spec: global_opt.py:121-158)"""
        pin = int(self.cfg["pin"])
        unique_kf = self.get_unique_kf_idx()
        if len(unique_kf) <= pin:
            return
        Twc, Xs, Cs = self.frames.stacked(unique_kf)
        ii, jj, idx, valid, Q, on = self._prep_two_way(unique_kf)

        Twc_new = pose_graph.gauss_newton_rays(
            Twc, Xs, Cs, ii, jj, idx, valid, Q, on,
            num_fix=pin,
            max_iter=int(self.cfg["max_iters"]),
            sigma_ray=float(self.cfg["sigma_ray"]),
            sigma_dist=float(self.cfg["sigma_dist"]),
            C_thresh=float(self.cfg["C_conf"]),
            Q_thresh=float(self.cfg["Q_conf"]),
            delta_thresh=float(self.cfg["delta_norm"]),
        )
        self.frames.update_T_WCs(Twc_new[pin:], unique_kf[pin:])

    def solve_GN_calib(self):
        """(spec: global_opt.py:160-213)"""
        from splatt3r_slam_tpu.geometry.projective import (
            constrain_points_to_ray,
        )

        pin = int(self.cfg["pin"])
        unique_kf = self.get_unique_kf_idx()
        if len(unique_kf) <= pin:
            return
        Twc, Xs, Cs = self.frames.stacked(unique_kf)
        img_size = tuple(
            int(v) for v in np.asarray(self.frames[0].img_shape).reshape(-1)[:2]
        )
        Xs = constrain_points_to_ray(img_size, Xs, self.K)
        ii, jj, idx, valid, Q, on = self._prep_two_way(unique_kf)

        Twc_new = pose_graph.gauss_newton_calib(
            Twc, Xs, Cs, self.K, ii, jj, idx, valid, Q, on, img_size,
            num_fix=pin,
            max_iter=int(self.cfg["max_iters"]),
            pixel_border=float(self.cfg["pixel_border"]),
            z_eps=float(self.cfg["depth_eps"]),
            sigma_pixel=float(self.cfg["sigma_pixel"]),
            sigma_depth=float(self.cfg["sigma_depth"]),
            C_thresh=float(self.cfg["C_conf"]),
            Q_thresh=float(self.cfg["Q_conf"]),
            delta_thresh=float(self.cfg["delta_norm"]),
        )
        self.frames.update_T_WCs(Twc_new[pin:], unique_kf[pin:])

    def solve(self):
        if config.get("use_calib") and self.K is not None:
            self.solve_GN_calib()
        else:
            self.solve_GN_rays()

    # ------------------------------------------------------------------
    # backend-driver API used by SLAMSystem
    # ------------------------------------------------------------------
    def on_keyframe(self, kf_idx: int) -> bool:
        """Neighbor edge + retrieval edges + solve (spec: main.py:142-190)."""
        edges_ii, edges_jj = [], []
        if kf_idx > 0:
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
        retr = sorted(set(int(r) for r in retr))
        successful = self.add_factors(
            retr, [kf_idx] * len(retr),
            float(rcfg["min_match_frac"]),
            is_reloc=bool(rcfg["strict"]),
        )
        if successful:
            self.retrieval.add_to_database(frame)
            # seed pose from the best retrieved keyframe (main.py:96-101)
            frame.T_WC = self.frames[retr[0]].T_WC
            self.frames[kf_idx] = frame
            self.solve()
            return True
        self.frames.pop_last()
        return False
