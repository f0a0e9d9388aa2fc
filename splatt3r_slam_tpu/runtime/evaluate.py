"""Result export + trajectory evaluation.

Export-format spec: reference `splatt3r_slam/evaluate.py:14-106` — TUM
trajectory (scale dropped from Sim3), confidence-thresholded PLY point
cloud, keyframe PNGs.

Additionally implements ATE RMSE with Sim(3) (umeyama) alignment —
the same metric `evo_ape tum <gt> <est> -as` computes in the reference's
eval scripts (`scripts/eval_tum.sh:33-52`) — so evaluation runs without
the external evo dependency.
"""

from __future__ import annotations

import pathlib
import struct

import cv2
import numpy as np

from splatt3r_slam_tpu.runtime.frame import uimg01

from splatt3r_slam_tpu.config import config
from splatt3r_slam_tpu.geometry.projective import constrain_points_to_ray
from splatt3r_slam_tpu.lie import sim3


def prepare_savedir(save_as: str, dataset):
    save_dir = pathlib.Path("logs")
    if save_as != "default":
        save_dir = save_dir / save_as
    save_dir.mkdir(exist_ok=True, parents=True)
    seq_name = pathlib.Path(str(dataset.dataset_path)).stem
    return save_dir, seq_name


def save_traj(logdir, logfile, timestamps, keyframes, intrinsics=None):
    """TUM format: `t x y z qx qy qz qw` per keyframe (evaluate.py:23-44)."""
    logdir = pathlib.Path(logdir)
    logdir.mkdir(exist_ok=True, parents=True)
    with open(logdir / logfile, "w") as f:
        for i in range(len(keyframes)):
            kf = keyframes[i]
            t = timestamps[kf.frame_id]
            T7 = np.asarray(sim3.to_se3(kf.T_WC)).reshape(-1)
            x, y, z, qx, qy, qz, qw = T7
            f.write(f"{t} {x} {y} {z} {qx} {qy} {qz} {qw}\n")


def save_ply(filename, points: np.ndarray, colors: np.ndarray):
    """Binary little-endian PLY with xyz + rgb (evaluate.py:88-106)."""
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.uint8)
    n = len(points)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    ).encode("ascii")
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = points.T
    rec["red"], rec["green"], rec["blue"] = colors.T
    with open(filename, "wb") as f:
        f.write(header)
        f.write(rec.tobytes())


def load_ply(filename):
    """Reader for the PLY files written above (tests/round-trips)."""
    with open(filename, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int(
            [line for line in header.decode().splitlines()
             if line.startswith("element vertex")][0].split()[-1]
        )
        rec = np.frombuffer(
            f.read(),
            dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("red", "u1"), ("green", "u1"), ("blue", "u1")],
            count=n,
        )
    pts = np.stack([rec["x"], rec["y"], rec["z"]], axis=-1)
    col = np.stack([rec["red"], rec["green"], rec["blue"]], axis=-1)
    return pts, col


def save_reconstruction(savedir, filename, keyframes, c_conf_threshold):
    """World-space point cloud with per-point RGB (evaluate.py:47-70)."""
    savedir = pathlib.Path(savedir)
    savedir.mkdir(exist_ok=True, parents=True)
    pcs, cols = [], []
    for i in range(len(keyframes)):
        kf = keyframes[i]
        X = kf.X_canon
        if config.get("use_calib") and kf.K is not None:
            img_size = tuple(int(v) for v in np.asarray(kf.img_shape).reshape(-1)[:2])
            X = constrain_points_to_ray(img_size, X[None], kf.K)[0]
        pW = np.asarray(sim3.act(kf.T_WC, X)).reshape(-1, 3)
        color = (uimg01(kf) * 255).astype(np.uint8).reshape(-1, 3)
        valid = (
            np.asarray(kf.get_average_conf()).reshape(-1) > c_conf_threshold
        )
        pcs.append(pW[valid])
        cols.append(color[valid])
    save_ply(savedir / filename, np.concatenate(pcs), np.concatenate(cols))


def save_keyframes(savedir, timestamps, keyframes):
    """Keyframe RGB dumps (evaluate.py:73-85)."""
    savedir = pathlib.Path(savedir)
    savedir.mkdir(exist_ok=True, parents=True)
    for i in range(len(keyframes)):
        kf = keyframes[i]
        t = timestamps[kf.frame_id]
        img = (uimg01(kf) * 255).astype(np.uint8)
        cv2.imwrite(str(savedir / f"{t}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


# -----------------------------------------------------------------------------
# ATE RMSE with Sim(3) alignment (the `evo_ape tum -as` metric)
# -----------------------------------------------------------------------------


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale=True):
    """Least-squares Sim(3) aligning x→y. x, y: (n, 3). Returns (s, R, t)."""
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (xc**2).sum() / len(x)
    # degenerate source (all estimated positions identical — e.g. a
    # tracking failure leaving every pose at identity): scale is
    # unobservable; fall back to s=1 so the metric stays finite instead
    # of dividing by zero
    s = (float(np.trace(np.diag(D) @ S) / var_x)
         if with_scale and var_x > 1e-12 else 1.0)
    t = my - s * R @ mx
    return s, R, t


def read_tum_trajectory(path):
    data = np.loadtxt(path, comments="#")
    return data[:, 0], data[:, 1:4], data[:, 4:8]


def associate(t_a, t_b, max_dt=0.02):
    """One-to-one timestamp association (TUM benchmark / evo convention).

    All candidate pairs within max_dt are sorted by |dt| and accepted
    greedily, each stamp used at most once — matching the TUM RGB-D
    benchmark's associate.py (and evo's TUM association), so a dense
    trajectory can never map many GT stamps onto one estimated pose.
    """
    t_a = np.asarray(t_a, dtype=np.float64)
    t_b = np.asarray(t_b, dtype=np.float64)
    dt = np.abs(t_a[:, None] - t_b[None, :])
    ii, jj = np.nonzero(dt < max_dt)
    order = np.argsort(dt[ii, jj], kind="stable")
    used_a = np.zeros(len(t_a), bool)
    used_b = np.zeros(len(t_b), bool)
    ia, ib = [], []
    for k in order:
        i, j = int(ii[k]), int(jj[k])
        if not used_a[i] and not used_b[j]:
            used_a[i] = used_b[j] = True
            ia.append(i)
            ib.append(j)
    # time order (alignment is order-invariant; keeps output deterministic)
    sort = np.argsort(ia)
    return np.asarray(ia)[sort], np.asarray(ib)[sort]


def ate_rmse(gt_file, est_file, max_dt=0.02, with_scale=True):
    """ATE RMSE after Sim(3) alignment (== `evo_ape tum gt est -as`)."""
    t_gt, p_gt, _ = read_tum_trajectory(gt_file)
    t_es, p_es, _ = read_tum_trajectory(est_file)
    ig, ie = associate(t_gt, t_es, max_dt)
    if len(ig) < 3:
        raise ValueError("too few associated poses")
    g, e = p_gt[ig], p_es[ie]
    s, R, t = umeyama_alignment(e, g, with_scale)
    e_aligned = (s * (R @ e.T)).T + t
    err = np.linalg.norm(e_aligned - g, axis=1)
    return float(np.sqrt((err**2).mean()))
