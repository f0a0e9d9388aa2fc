"""Pixel correspondence by iterative projection + descriptor refinement.

TPU-native re-design of the reference's two CUDA matching kernels
(`splatt3r_slam/backend/src/matching_kernels.cu`):

- `iter_proj` (spec: matching_kernels.cu:118-274): per-pixel 2-DoF
  Levenberg-Marquardt solve that projects a unit ray onto a ray-image by
  descending the ray-alignment cost with bilinear interpolation of the
  ray + gradient channels. Here: fully vectorized over all pixels with a
  `lax.fori_loop` over a *static* iteration count (lambda up/down keeps
  per-pixel state; no data-dependent control flow).
- `refine_matches` (spec: matching_kernels.cu:24-80): windowed descriptor
  dot-product argmax with iterated dilation (coarse-to-fine). Here: the
  window scores become one batched (49 x D) x (D,) matvec per dilation —
  MXU work instead of scalar loops; the dilation loop is a static Python
  loop of `dilation_max` steps.

The driver `match()` mirrors `splatt3r_slam/matching.py:8-90` including the
occlusion distance check.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.ops.image import img_gradient


class MatchingConfig(NamedTuple):
    """Static matching parameters (reference config/base.yaml `matching:`)."""

    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 1e-1
    radius: int = 3
    dilation_max: int = 5


def match_kwargs_from_config(mcfg: dict) -> dict:
    """config['matching'] → static kwargs for `match` (incl. the TPU
    fast-path knobs, which default ON for the runtime; plain reference
    YAMLs stay drop-in compatible)."""
    dil = int(mcfg["dilation_max"])
    sched = mcfg.get("refine_schedule")
    sched = tuple(sched) if sched is not None else (
        (dil, 1) if dil > 1 else (1,))
    return dict(
        max_iter=int(mcfg["max_iter"]),
        lambda_init=float(mcfg["lambda_init"]),
        convergence_thresh=float(mcfg["convergence_thresh"]),
        dist_thresh=float(mcfg["dist_thresh"]),
        radius=int(mcfg["radius"]),
        dilation_max=dil,
        closed_form_init=bool(mcfg.get("closed_form_init", True)),
        polish_iters=int(mcfg.get("polish_iters", 2)),
        refine_schedule=sched,
        refine_quantize=bool(mcfg.get("refine_quantize", True)),
    )


def fit_pinhole(X: jnp.ndarray, eps: float = 1e-6):
    """Least-squares pinhole (fx, fy, cx, cy) from a pointmap (h, w, 3).

    The predicted pointmap of a (near-)pinhole camera satisfies
    u = fx·x/z + cx, v = fy·y/z + cy. Fitting is two dense 2x2 normal
    systems — pure reductions, no gathers (TPU-friendly). Used to seed
    iterative projection in closed form; the LM polish then only has to
    absorb the ray map's non-pinhole residual.
    """
    h, w, _ = X.shape
    z = jnp.maximum(X[..., 2], eps)
    a = X[..., 0] / z  # x/z
    b = X[..., 1] / z  # y/z
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    valid = (X[..., 2] > eps).astype(jnp.float32)
    n = jnp.maximum(valid.sum(), 1.0)

    def solve_axis(t, target):
        # min over (f, c):  Σ (f·t + c − target)²
        st = jnp.sum(t * valid)
        stt = jnp.sum(t * t * valid)
        sy = jnp.sum(target * valid)
        sty = jnp.sum(t * target * valid)
        det = stt * n - st * st
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        f = (sty * n - st * sy) / det
        c = (stt * sy - st * sty) / det
        return f, c

    fx, cx = solve_axis(a, uu)
    fy, cy = solve_axis(b, vv)
    return fx, fy, cx, cy


def prep_rays_with_grad(X11: jnp.ndarray) -> jnp.ndarray:
    """Normalized ray image + gradients, (b, h, w, 9) NHWC.

    Spec: `splatt3r_slam/matching.py:25-36` (rays, gx, gy channel order).
    """
    rays = X11 / jnp.linalg.norm(X11, axis=-1, keepdims=True)
    gx, gy = img_gradient(rays)
    return jnp.concatenate([rays, gx, gy], axis=-1)


def _corner_table(rays_img: jnp.ndarray) -> jnp.ndarray:
    """(h, w, c) → (h*w, 4c) table of the 2x2 bilinear-corner neighborhood.

    TPU gathers cost per ROW, nearly independent of row width — packing
    the four corners into one wide row turns the 4 small gathers per
    bilinear sample into 1 wide gather (~4x fewer rows).
    """
    h, w, c = rays_img.shape
    p = jnp.pad(rays_img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    tab = jnp.concatenate(
        [p[:h, :w], p[:h, 1 : w + 1], p[1 : h + 1, :w],
         p[1 : h + 1, 1 : w + 1]],
        axis=-1,
    )
    return tab.reshape(h * w, 4 * c)


def _bilinear_gather(tab4: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                     w: int, c: int):
    """Bilinear sample from a 4-corner packed table (see _corner_table).

    Callers guarantee u ∈ [1, w-2], v ∈ [1, h-2] (the CUDA kernel's
    clamp-then-sample contract, matching_kernels.cu:141-143). Returns (n, c).
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    base = v0.astype(jnp.int32) * w + u0.astype(jnp.int32)
    rows = jnp.take(tab4, base, axis=0)  # (n, 4c)
    i00 = rows[:, 0:c]
    i01 = rows[:, c : 2 * c]
    i10 = rows[:, 2 * c : 3 * c]
    i11 = rows[:, 3 * c : 4 * c]
    return (
        (1 - du) * (1 - dv) * i00
        + du * (1 - dv) * i01
        + (1 - du) * dv * i10
        + du * dv * i11
    )




@functools.partial(jax.jit, static_argnames=("h", "w", "max_iter"))
def _iter_proj_single(
    rays_with_grad: jnp.ndarray,  # (h*w, 9)
    pts3d_norm: jnp.ndarray,  # (n, 3)
    p_init: jnp.ndarray,  # (n, 2) float
    h: int,
    w: int,
    max_iter: int,
    lambda_init: float,
    cost_thresh: float,
):
    n = pts3d_norm.shape[0]
    u = jnp.clip(p_init[:, 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[:, 1], 1.0, h - 2.0)
    lam = jnp.full((n,), lambda_init, dtype=jnp.float32)
    conv = jnp.zeros((n,), dtype=bool)

    tab4 = _corner_table(rays_with_grad.reshape(h, w, 9))  # (h*w, 36)

    # One bilinear evaluation per iteration: the accepted/rejected sample
    # is carried in the loop state, so each step only evaluates the trial
    # point (the CUDA kernel re-samples the base point each iteration —
    # same values, twice the gathers, matching_kernels.cu:152-269).
    samp = _bilinear_gather(tab4, u, v, w, 9)  # (n, 9)

    def _cost_of(samp):
        r = samp[:, 0:3]
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        err = r - pts3d_norm
        return jnp.sum(err * err, axis=-1), err

    def body(_, state):
        u, v, lam, conv, samp = state
        gx = samp[:, 3:6]
        gy = samp[:, 6:9]
        cost, err = _cost_of(samp)

        # 2x2 normal equations with LM damping (matching_kernels.cu:198-215)
        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)
        det_inv = 1.0 / (A00 * A11 - A01 * A01)
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv, 1.0, h - 2.0)
        samp_new = _bilinear_gather(tab4, u_new, v_new, w, 9)
        new_cost, _ = _cost_of(samp_new)

        accept = new_cost < cost
        acc = accept[:, None]
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        samp = jnp.where(acc, samp_new, samp)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, new_cost < cost_thresh, cost < cost_thresh)
        return u, v, lam, conv, samp

    # Unrolled static loop: a fori_loop carries the (n, 9) sample buffer
    # through the loop state, and XLA's loop-carry copies cost more than
    # the iteration math at n = h·w (measured: 2 fori iters 14 ms vs
    # unrolled ~7 ms). max_iter ≤ 10, so unrolling is cheap to compile.
    state = (u, v, lam, conv, samp)
    for i in range(max_iter):
        state = body(i, state)
    u, v, lam, conv, _ = state
    return jnp.stack([u, v], axis=-1), conv


def iter_proj(
    rays_with_grad_img: jnp.ndarray,  # (b, h, w, 9)
    pts3d_norm: jnp.ndarray,  # (b, n, 3)
    p_init: jnp.ndarray,  # (b, n, 2)
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    cost_thresh: float = 1e-6,
):
    """Batched LM iterative projection. Returns (p (b,n,2) float, converged (b,n))."""
    b, h, w, _ = rays_with_grad_img.shape
    flat = rays_with_grad_img.reshape(b, h * w, 9)
    f = jax.vmap(
        lambda rf, pn, pi: _iter_proj_single(
            rf, pn, pi, h, w, max_iter, lambda_init, cost_thresh
        )
    )
    return f(flat, pts3d_norm, p_init)


def refine_matches(
    D11: jnp.ndarray,  # (b, h, w, fdim)
    D21: jnp.ndarray,  # (b, n, fdim)
    p1: jnp.ndarray,  # (b, n, 2) int
    radius: int = 3,
    dilation_max: int = 5,
    schedule: tuple | None = None,
    quantize: bool = True,
):
    """Coarse-to-fine windowed descriptor argmax (matching_kernels.cu:24-80).

    For each dilation d in `schedule` (default: the reference's full
    d = dilation_max..1 cascade), scores the (2r+1)² grid of pixels at
    spacing d around the current center and re-centers on the best.

    TPU formulation (profile-guided, v5e): per-window gathers cost ~per
    ROW on TPU, so instead of gathering 49 descriptor rows per pixel we
    pack each offset's shifted image into one wide row per pixel (padded
    static slices — cheap, bandwidth-bound) and do a SINGLE gather of
    (n, 49·fdim) rows at the window centers — identical scores, ~40x
    fewer gather rows. Descriptors are L2-normalized, so int8 storage
    (`quantize=True`) halves the gathered bytes with ~0.4% component
    error; scoring runs as a bf16 VPU multiply-sum.
    """
    b, h, w, fdim = D11.shape
    n = p1.shape[1]
    side = 2 * radius + 1
    k = side * side
    if schedule is None:
        schedule = tuple(range(dilation_max, 0, -1))

    if quantize:
        D11img = jnp.clip(jnp.round(D11 * 127.0), -127, 127).astype(jnp.int8)
    else:
        D11img = D11.astype(jnp.bfloat16)
    D21b = D21.astype(jnp.bfloat16)

    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-radius, radius + 1),
            jnp.arange(-radius, radius + 1),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)  # (side², 2) in (du, dv), v-major scan order
    offs_np = np.stack(
        np.meshgrid(np.arange(-radius, radius + 1),
                    np.arange(-radius, radius + 1), indexing="xy"),
        axis=-1,
    ).reshape(-1, 2)

    u = p1[..., 0].astype(jnp.int32)
    v = p1[..., 1].astype(jnp.int32)

    def one_dilation(u, v, d):
        lin_c = jnp.clip(v, 0, h - 1) * w + jnp.clip(u, 0, w - 1)
        r = radius * d
        pad = jnp.pad(D11img, ((0, 0), (r, r), (r, r), (0, 0)))

        def per_item(args):
            # table[..., j·f:(j+1)·f] at (y,x) == D[y+dv_j·d, x+du_j·d]
            # (zero outside; those offsets are -inf-masked below anyway).
            # Static padded slices concatenated on the LANE axis — no
            # rolls, no 4D stack (whose 24-wide minor dim would waste
            # 128-lane tiles), one fused table write. The (h, w, k·f)
            # table is transient per item (lax.map keeps peak memory at
            # one item's worth).
            Dpad, lin = args
            tab = jnp.concatenate(
                [
                    Dpad[r + dv * d : r + dv * d + h,
                         r + du * d : r + du * d + w]
                    for du, dv in offs_np
                ],
                axis=-1,
            )  # (h, w, k·f)
            flat = tab.reshape(h * w, k * fdim)
            return jnp.take(flat, lin, axis=0)

        rows = jax.lax.map(per_item, (pad, lin_c)).reshape(b, n, k, fdim)
        scores = (rows.astype(jnp.bfloat16) * D21b[:, :, None, :]).astype(
            jnp.float32).sum(-1)
        du = offs[:, 0] * d
        dv = offs[:, 1] * d
        uu = u[..., None] + du  # (b, n, k)
        vv = v[..., None] + dv
        inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        scores = jnp.where(inside, scores, -jnp.inf)
        best = jnp.argmax(scores, axis=-1)  # (b, n)
        u_new = jnp.take_along_axis(uu, best[..., None], axis=-1)[..., 0]
        v_new = jnp.take_along_axis(vv, best[..., None], axis=-1)[..., 0]
        return u_new, v_new

    for d in schedule:
        u, v = one_dilation(u, v, d)

    return jnp.stack([u, v], axis=-1)


def pixel_to_lin(p: jnp.ndarray, w: int) -> jnp.ndarray:
    """(u, v) → v*w + u (spec: matching.py:13-15)."""
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx: jnp.ndarray, w: int) -> jnp.ndarray:
    """v*w + u → (u, v) (spec: matching.py:18-21)."""
    return jnp.stack([idx % w, idx // w], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "lambda_init",
        "convergence_thresh",
        "dist_thresh",
        "radius",
        "dilation_max",
        "closed_form_init",
        "polish_iters",
        "refine_schedule",
        "refine_quantize",
    ),
)
def match(
    X11: jnp.ndarray,  # (b, h, w, 3) canonical points of view 1 in frame 1
    X21: jnp.ndarray,  # (b, h, w, 3) points of view 2 in frame 1
    D11: jnp.ndarray,  # (b, h, w, fdim)
    D21: jnp.ndarray,  # (b, h, w, fdim)
    idx_1_to_2_init: jnp.ndarray | None = None,  # (b, h*w) int or None
    *,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
    dist_thresh: float = 1e-1,
    radius: int = 3,
    dilation_max: int = 5,
    closed_form_init: bool = False,
    polish_iters: int = 2,
    refine_schedule: tuple | None = None,
    refine_quantize: bool = False,
):
    """Full correspondence pipeline (spec: matching.py:52-90).

    Defaults reproduce the reference semantics (pure-LM iter_proj from
    `idx_1_to_2_init`, full dilation cascade, fp32 descriptors).

    TPU fast path (measured, v5e — used by the fused frontend): per-pixel
    gathers bound the LM solver at ~2.3 ms/iteration regardless of math,
    so `closed_form_init=True` seeds with a closed-form pinhole
    projection (`fit_pinhole`, dense reductions on the MXU/VPU) and only
    `polish_iters` LM steps absorb the ray map's non-pinhole residual;
    `refine_schedule=(dilation_max, 1)` keeps the coarse basin-escape
    round plus the exact fine polish; `refine_quantize=True` stores
    descriptor tables as int8 (halves gathered bytes).

    Returns (idx_1_to_2 (b, h*w) int32, valid (b, h*w, 1) bool).
    """
    b, h, w, _ = X11.shape
    n = h * w

    rays_img = prep_rays_with_grad(X11)
    pts3d_norm = X21.reshape(b, n, 3)
    pts3d_norm = pts3d_norm / jnp.linalg.norm(pts3d_norm, axis=-1, keepdims=True)

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(jnp.float32)

    eff_iters = max_iter
    if closed_form_init:
        fx, fy, cx, cy = jax.vmap(fit_pinhole)(X11)
        z = pts3d_norm[..., 2]
        zc = jnp.where(z > 1e-6, z, 1.0)
        u_proj = fx[:, None] * pts3d_norm[..., 0] / zc + cx[:, None]
        v_proj = fy[:, None] * pts3d_norm[..., 1] / zc + cy[:, None]
        ok = z > 1e-6
        p_init = jnp.where(
            ok[..., None], jnp.stack([u_proj, v_proj], axis=-1), p_init
        )
        eff_iters = polish_iters

    p1, valid_proj = iter_proj(
        rays_img, pts3d_norm, p_init, eff_iters, lambda_init,
        convergence_thresh,
    )
    p1 = p1.astype(jnp.int32)  # truncation matches reference .long()

    # occlusion check: |X11[p1] − X21| < dist_thresh (matching.py:71-76)
    lin = pixel_to_lin(p1, w)
    X11f = X11.reshape(b, n, 3)
    X11_at = jax.vmap(lambda Xf, l: jnp.take(Xf, l, axis=0))(X11f, lin)
    dists = jnp.linalg.norm(X11_at - X21.reshape(b, n, 3), axis=-1)
    valid = valid_proj & (dists < dist_thresh)

    if radius > 0:
        p1 = refine_matches(D11, D21.reshape(b, n, -1), p1, radius,
                            dilation_max, schedule=refine_schedule,
                            quantize=refine_quantize)

    idx_1_to_2 = pixel_to_lin(p1, w).astype(jnp.int32)
    return idx_1_to_2, valid[..., None]
