"""Frontend tracking orchestration (FrameTracker).

Spec: reference `splatt3r_slam/tracker.py:15-127` — per-frame asymmetric
match against the last keyframe, pointmap fusion, Sim(3) GN pose solve,
keyframe selection by match fraction, reloc trigger on low overlap or
solver failure.

Host logic stays thin: all heavy math is in jitted units (inference,
matching, GN, metric reductions); only three scalars cross to the host
per frame (match_frac, new_kf criterion, fail flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.config import config
from splatt3r_slam_tpu.geometry.projective import (
    constrain_points_to_ray,
    get_pixel_coords,
)
from splatt3r_slam_tpu.runtime.frame import Frame, KeyframeBuffer
from splatt3r_slam_tpu.tracking.tracker import (
    TrackingConfig,
    opt_pose_calib_sim3,
    opt_pose_ray_dist_sim3,
)
from splatt3r_slam_tpu.lie import sim3


@functools.partial(jax.jit, static_argnames=("C_conf", "Q_conf"))
def _track_masks(idx_f2k, valid_match_k, Qff, Qkf, Cf_all, Ck, C_conf, Q_conf):
    """Qk, valid masks, match fraction, unique fraction — one fused unit.

    (spec: tracker.py:41-66 and 104-110)
    """
    Qk = jnp.sqrt(Qff[idx_f2k] * Qkf)
    Cf = Cf_all[idx_f2k]
    valid_Q = Qk > Q_conf
    valid_opt = valid_match_k & (Cf > C_conf) & (Ck > C_conf) & valid_Q
    valid_kf = valid_match_k & valid_Q

    n = idx_f2k.shape[0]
    match_frac = valid_opt.sum() / n
    match_frac_k = valid_kf.sum() / n
    # |unique(idx_f2k[valid_match])| via scatter-max (no dynamic shapes)
    hits = jnp.zeros((n,), bool).at[
        jnp.where(valid_match_k[:, 0], idx_f2k, 0)
    ].set(True)
    n_unique = hits.sum() - (~valid_match_k[0, 0] & hits[0])
    unique_frac = n_unique / n
    return Qk, valid_opt, valid_kf, match_frac, match_frac_k, unique_frac


class FrameTracker:
    def __init__(self, engine, keyframes: KeyframeBuffer):
        self.cfg = config["tracking"]
        self.tcfg = TrackingConfig.from_config(config)
        self.engine = engine
        self.keyframes = keyframes
        self.reset_idx_f2k()
        self.filtering_mode = self.cfg["filtering_mode"]
        self.filtering_score = self.cfg["filtering_score"]

    def reset_idx_f2k(self):
        self.idx_f2k = None

    def track(self, frame: Frame):
        """Returns (new_kf: bool, try_reloc: bool)."""
        keyframe = self.keyframes.last_keyframe()

        (idx_f2k_b, valid_match_k_b, Xff, Cff, Qff, Xkf, Ckf, Qkf
         ) = self.engine.match_asymmetric(frame, keyframe, self.idx_f2k)
        self.idx_f2k = idx_f2k_b

        idx_f2k = idx_f2k_b[0]
        valid_match_k = valid_match_k_b[0]

        frame.update_pointmap(Xff, Cff, self.filtering_mode,
                              self.filtering_score)

        use_calib = config["use_calib"]
        img_size = tuple(int(v) for v in frame.img_shape.reshape(-1)[:2])
        K = keyframe.K if use_calib else None

        Xf = frame.X_canon
        Xk = keyframe.X_canon
        Cf_all = frame.get_average_conf()
        Ck = keyframe.get_average_conf()

        meas_k = valid_meas_k = None
        if use_calib:
            Xf = constrain_points_to_ray(img_size, Xf[None], K)[0]
            Xk = constrain_points_to_ray(img_size, Xk[None], K)[0]
            uv_k = get_pixel_coords(1, img_size).reshape(-1, 2)
            z = Xk[..., 2:3]
            valid_meas_k = z > self.cfg["depth_eps"]
            logz = jnp.where(valid_meas_k, jnp.log(jnp.maximum(z, 1e-12)), 0.0)
            meas_k = jnp.where(
                valid_meas_k, jnp.concatenate([uv_k, logz], axis=-1), 0.0
            )

        (Qk, valid_opt, valid_kf, match_frac, match_frac_k, unique_frac
         ) = _track_masks(
            idx_f2k, valid_match_k, Qff, Qkf, Cf_all, Ck,
            float(self.cfg["C_conf"]), float(self.cfg["Q_conf"]),
        )

        if float(match_frac) < self.cfg["min_match_frac"]:
            print(f"Skipped frame {frame.frame_id}")
            return False, True

        Xf_m = Xf[idx_f2k]

        if not use_calib:
            T_WCf, T_CkCf, fail = opt_pose_ray_dist_sim3(
                Xf_m, Xk, frame.T_WC, keyframe.T_WC, Qk, valid_opt, self.tcfg
            )
        else:
            T_WCf, T_CkCf, fail = opt_pose_calib_sim3(
                Xf_m, Xk, frame.T_WC, keyframe.T_WC, Qk, valid_opt,
                meas_k, valid_meas_k, K, img_size, self.tcfg
            )
        if bool(fail):
            print(f"Cholesky failed {frame.frame_id}")
            return False, True

        frame.T_WC = T_WCf

        # fold the frame's cross-prediction of the keyframe back into the
        # keyframe's canonical pointmap (tracker.py:97-101)
        Xkk = sim3.act(T_CkCf, Xkf)
        keyframe.update_pointmap(Xkk, Ckf, self.filtering_mode,
                                 self.filtering_score)
        self.keyframes[len(self.keyframes) - 1] = keyframe

        new_kf = min(float(match_frac_k), float(unique_frac)) < self.cfg[
            "match_frac_thresh"
        ]
        if new_kf:
            self.reset_idx_f2k()
        return new_kf, False
