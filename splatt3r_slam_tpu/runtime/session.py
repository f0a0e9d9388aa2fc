"""SLAM session checkpoint / resume.

The reference has model checkpoints only — "no SLAM-session resume"
(SURVEY.md §5 Checkpoint/resume). This module adds full session state
persistence: keyframe tensors + poses, factor-graph edges, retrieval
inverted file, gaussian pool, mode — as a single compressed npz — so a
run can be stopped and resumed, or a map re-localized against later.
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np


def _uimg_u8(u):
    u = np.asarray(u)
    return u if u.dtype == np.uint8 else (np.clip(u, 0, 1) * 255).astype(np.uint8)

from splatt3r_slam_tpu.runtime.frame import Frame, Mode


def save_session(path, system, backend=None):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    kfs = system.keyframes
    blobs = {
        "n_keyframes": np.asarray(len(kfs)),
        "mode": np.asarray(system.mode.value),
        "pool_n": np.asarray(system.pool.n),
        "pool_data": np.asarray(system.pool.data[: system.pool.n]),
        "pool_kf_id": system.pool.kf_id[: system.pool.n],
    }
    for i in range(len(kfs)):
        kf = kfs[i]
        blobs[f"kf{i}_id"] = np.asarray(kf.frame_id)
        blobs[f"kf{i}_T"] = np.asarray(kf.T_WC)
        blobs[f"kf{i}_X"] = np.asarray(kf.X_canon)
        blobs[f"kf{i}_C"] = np.asarray(kf.C)
        blobs[f"kf{i}_N"] = np.asarray(kf.N)
        blobs[f"kf{i}_uimg"] = _uimg_u8(kf.uimg)
        blobs[f"kf{i}_shape"] = np.asarray(kf.img_shape)
        if kf.feat is not None:
            blobs[f"kf{i}_feat"] = np.asarray(kf.feat, np.float32)
            blobs[f"kf{i}_pos"] = np.asarray(kf.pos)
    if backend is not None and backend.ii:
        from splatt3r_slam_tpu.config import config as _cfg

        # edge arrays live on the matching subgrid; a resume under a
        # different match_stride would mis-index the solver's pointmaps
        blobs["edges_match_stride"] = np.asarray(
            int(_cfg["matching"].get("match_stride", 1)))
        blobs["edges_ii"] = np.asarray(backend.ii)
        blobs["edges_jj"] = np.asarray(backend.jj)
        blobs["edges_idx"] = np.stack(backend.idx_ii2jj)
        blobs["edges_idx2"] = np.stack(backend.idx_jj2ii)
        blobs["edges_vj"] = np.stack(backend.valid_match_j)
        blobs["edges_vi"] = np.stack(backend.valid_match_i)
        blobs["edges_qj"] = np.stack(backend.Q_ii2jj)
        blobs["edges_qi"] = np.stack(backend.Q_jj2ii)
    np.savez_compressed(path, **blobs)


def load_session(path, system, backend=None):
    z = np.load(path, allow_pickle=False)
    n = int(z["n_keyframes"])
    system.mode = Mode(int(z["mode"]))
    for i in range(n):
        shape = z[f"kf{i}_shape"]
        uimg = z[f"kf{i}_uimg"]  # uint8; consumers use uimg01()
        f = Frame(
            int(z[f"kf{i}_id"]),
            img=None,
            img_shape=shape,
            img_true_shape=shape.copy(),
            uimg=uimg,
            T_WC=jnp.asarray(z[f"kf{i}_T"]),
        )
        f.X_canon = jnp.asarray(z[f"kf{i}_X"])
        f.C = jnp.asarray(z[f"kf{i}_C"])
        f.N = int(z[f"kf{i}_N"])
        f.N_updates = f.N
        if f"kf{i}_feat" in z:
            f.feat = jnp.asarray(z[f"kf{i}_feat"])
            f.pos = jnp.asarray(z[f"kf{i}_pos"])
        system.keyframes.append(f)
    pn = int(z["pool_n"])
    if pn:
        system.pool.data = system.pool.data.at[:pn].set(
            jnp.asarray(z["pool_data"])
        )
        system.pool.kf_id[:pn] = z["pool_kf_id"]
        system.pool.n = pn
    if backend is not None and "edges_ii" in z:
        from splatt3r_slam_tpu.config import config as _cfg

        saved_s = int(z.get("edges_match_stride", 1))
        cur_s = int(_cfg["matching"].get("match_stride", 1))
        if saved_s != cur_s:
            raise ValueError(
                f"session edges were built at matching.match_stride="
                f"{saved_s}, current config uses {cur_s}; set the config "
                "to match before resuming"
            )
        backend.ii = [int(v) for v in z["edges_ii"]]
        backend.jj = [int(v) for v in z["edges_jj"]]
        backend.idx_ii2jj = list(z["edges_idx"])
        backend.idx_jj2ii = list(z["edges_idx2"])
        backend.valid_match_j = list(z["edges_vj"])
        backend.valid_match_i = list(z["edges_vi"])
        backend.Q_ii2jj = list(z["edges_qj"])
        backend.Q_jj2ii = list(z["edges_qi"])
    return system
