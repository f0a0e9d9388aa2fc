"""Rendering decoder: two-view Gaussian predictions → target-view images.

Spec: reference `splatt3r_core/src/pixelsplat_src/decoder_splatting_cuda.py:
20-83` + `cuda_splatting.py:18-128`:
- normalize intrinsics by image shape, rebase target extrinsics into the
  first context view's frame,
- scale-invariant conditioning: rescale the whole scene by 1/near so the
  rasterizer operates in a numerically comfortable range,
- stack view-1 self predictions with view-2 cross predictions and render
  each (batch, view) pair.

`render_frame` additionally provides the SLAM per-frame render façade
(`splatt3r_slam/splatt3r_utils.py:332-432`): covariances from
scales/rotations, SH residual from the source images, Sim3 poses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.splat.gaussians import (
    RGB2SH,
    SH2RGB,
    build_covariance,
    cov_to_triu,
)
from splatt3r_slam_tpu.splat.rasterizer import render_tiles


def get_fov(K_norm):
    """Horizontal/vertical FOV from a normalized intrinsics matrix
    (spec: pixelsplat projection.get_fov)."""
    fx, fy = K_norm[..., 0, 0], K_norm[..., 1, 1]
    return jnp.stack(
        [2.0 * jnp.arctan(0.5 / fx), 2.0 * jnp.arctan(0.5 / fy)], axis=-1
    )


def get_projection_matrix(near, far, fov_x, fov_y):
    """Frustum → NDC matrix, Z to (0,1), Z-flip convention
    (spec: cuda_splatting.py:18-45)."""
    tan_x = jnp.tan(0.5 * fov_x)
    tan_y = jnp.tan(0.5 * fov_y)
    top = tan_y * near
    right = tan_x * near
    z = jnp.zeros_like(near)
    o = jnp.ones_like(near)
    rows = [
        [near / right, z, z, z],
        [z, near / top, z, z],
        [z, z, far / (far - near), -(far * near) / (far - near)],
        [z, z, o, z],
    ]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def render_depth(means, cov_triu, opa, view, K, hw, mode: str = "depth",
                 near: float = 0.1, far: float = 100.0, k_max=512,
                 tpg_side=4):
    """Depth rendering via depth-as-color compositing
    (spec: `cuda_splatting.py:227-269` render_depth_cuda; modes depth /
    disparity / relative_disparity / log). Returns (H, W) float."""
    means = jnp.asarray(means, jnp.float32)
    view = jnp.asarray(view, jnp.float32)
    z = means @ view[2, :3] + view[2, 3]  # camera-space depth per gaussian
    if mode == "disparity":
        fake = 1.0 / jnp.maximum(z, 1e-9)
    elif mode == "relative_disparity":
        # depth_to_relative_disparity: 0 at near, 1 at far (in disparity)
        disp = 1.0 / jnp.maximum(z, 1e-9)
        dnear, dfar = 1.0 / near, 1.0 / far
        fake = 1.0 - (disp - dfar) / (dnear - dfar)
    elif mode == "log":
        fake = jnp.log(jnp.clip(z, near, far))
    else:
        fake = z
    colors = jnp.broadcast_to(fake[:, None], (means.shape[0], 3))
    img = render_tiles(means, cov_triu, colors, opa, view, K, hw,
                       jnp.zeros(3), tpg_side=tpg_side, k_max=k_max)
    return img[..., 0]


class DecoderSplatting:
    """pixelsplat-style batch renderer over the TPU rasterizer.

    rasterizer: "auto" picks the Pallas compositor on TPU (now
    differentiable via its custom VJP — training's render loss runs the
    production kernel, matching cuda_splatting.py:100-128) and the XLA
    compositor elsewhere."""

    def __init__(self, background_color=(0.0, 0.0, 0.0), k_max=512,
                 tpg_side=4, rasterizer: str = "auto"):
        self.bg = jnp.asarray(background_color, jnp.float32)
        self.k_max = k_max
        self.tpg_side = tpg_side
        if rasterizer == "auto":
            from splatt3r_slam_tpu.splat.rasterizer import default_rasterizer

            rasterizer = default_rasterizer()
        self.rasterizer = rasterizer

    def __call__(self, batch, pred1, pred2, image_shape):
        """batch: {'context': [{'camera_pose' (B,4,4)}],
                   'target': [{'camera_pose' (B,4,4),
                               'camera_intrinsics' (B,3,3)} ...]}.
        Returns color (B, V, 3, H, W) (channel-first to match the
        reference's output contract)."""
        H, W = image_shape
        base_pose = batch["context"][0]["camera_pose"]  # (B,4,4) cam→world
        inv_base = jnp.linalg.inv(base_pose)

        extr = jnp.stack(
            [t["camera_pose"] for t in batch["target"]], axis=1
        )  # (B,V,4,4)
        intr = jnp.stack(
            [t["camera_intrinsics"] for t in batch["target"]], axis=1
        ).astype(jnp.float32)  # (B,V,3,3) pixel-space
        extr = jnp.einsum("bij,bvjk->bvik", inv_base, extr)

        def flat(p, key):
            return p[key].reshape(p[key].shape[0], -1, p[key].shape[-1])

        means = jnp.concatenate(
            [
                pred1["means"].reshape(pred1["means"].shape[0], -1, 3),
                pred2["means_in_other_view"].reshape(
                    pred2["means_in_other_view"].shape[0], -1, 3
                ),
            ],
            axis=1,
        )  # (B, G, 3)
        covs = jnp.concatenate(
            [
                cov_to_triu(pred1["covariances"]).reshape(
                    means.shape[0], -1, 6
                ),
                cov_to_triu(pred2["covariances"]).reshape(
                    means.shape[0], -1, 6
                ),
            ],
            axis=1,
        )
        sh0 = jnp.concatenate(
            [
                pred1["sh"][..., 0].reshape(means.shape[0], -1, 3),
                pred2["sh"][..., 0].reshape(means.shape[0], -1, 3),
            ],
            axis=1,
        )
        colors = jnp.clip(SH2RGB(sh0), 0.0, 1.0)
        opa = jnp.concatenate(
            [
                pred1["opacities"].reshape(means.shape[0], -1),
                pred2["opacities"].reshape(means.shape[0], -1),
            ],
            axis=1,
        )

        if self.rasterizer == "pallas":
            from splatt3r_slam_tpu.splat.pallas_rasterizer import (
                render_tiles_pallas,
            )

            raster = functools.partial(render_tiles_pallas,
                                       tpg_side=self.tpg_side,
                                       k_max=self.k_max)
        else:
            raster = functools.partial(render_tiles,
                                       tpg_side=self.tpg_side,
                                       k_max=self.k_max)

        B, V = extr.shape[:2]
        near = 0.1
        imgs = []
        for b in range(B):
            scale = 1.0 / near
            m = means[b] * scale
            c = covs[b] * (scale**2)
            for v in range(V):
                E = extr[b, v]
                E = E.at[:3, 3].multiply(scale)
                view = jnp.linalg.inv(E)  # world→cam
                img = raster(m, c, colors[b], opa[b], view, intr[b, v],
                             (H, W), self.bg)
                imgs.append(img)
        color = jnp.stack(imgs).reshape(B, V, H, W, 3)
        return color.transpose(0, 1, 4, 2, 3), None


def render_frame(frame, ref_frame, K=None, target_T_WC=None, hw=None,
                 k_max=512, tpg_side=4, bg=(0.0, 0.0, 0.0),
                 rasterizer: str = "auto"):
    """SLAM per-frame render façade (spec: splatt3r_utils.py:332-432).

    Renders the frame's stored gaussian predictions (self + cross, both in
    the frame's camera) from `target_T_WC` (default: the frame's own pose).
    Returns (H, W, 3) float image.

    rasterizer: "auto" (pallas on TPU, xla elsewhere — see
    `rasterizer.default_rasterizer`), "xla" (lax.map tile compositor) or
    "pallas" (per-tile early-exit Mosaic kernel; 28 vs 39 ms at 400k
    gaussians, 512x384, TPU v5e — scripts/bench_rasterizer.py /
    logs/bench_rasterizer_tpu_v5e.json). Both share `bin_tiles` (same
    k_max/tpg_side approximation, PARITY.md fidelity table).
    """
    if frame.gaussian_pred is None or frame.gaussian_pred_cross is None:
        return None
    if rasterizer == "auto":
        from splatt3r_slam_tpu.splat.rasterizer import default_rasterizer

        rasterizer = default_rasterizer()
    gp, gc = frame.gaussian_pred, frame.gaussian_pred_cross
    _, h, w, _ = gp["means"].shape
    if hw is None:
        hw = (h, w)
    if K is None:
        focal = float(max(hw))
        K = jnp.asarray(
            [[focal, 0, hw[1] / 2], [0, focal, hw[0] / 2], [0, 0, 1]],
            jnp.float32,
        )
    return _render_frame_jit(
        tuple((p["means"], p["scales"], p["rotations"], p["sh"],
               p["opacities"]) for p in (gp, gc)),
        frame.img, ref_frame.img, frame.T_WC,
        frame.T_WC if target_T_WC is None else target_T_WC,
        jnp.asarray(K, jnp.float32), hw, k_max, tpg_side,
        jnp.asarray(bg, jnp.float32), rasterizer,
    )


@functools.partial(
    jax.jit, static_argnames=("hw", "k_max", "tpg_side", "rasterizer")
)
def _render_frame_jit(preds, img_f, img_ref, T_WC_f, T_WC_target, K, hw,
                      k_max, tpg_side, bg, rasterizer):
    """Whole render prep + rasterize as ONE device program (the ~20
    eager prep ops each cost a dispatch round-trip on a remote-TPU
    platform — measured ~0.5 s per render before fusing)."""
    means, covs, cols, opas = [], [], [], []
    for (m, sc, rot, sh, op), img_n in zip(preds, (img_f, img_ref)):
        img = jnp.clip(img_n[0] * 0.5 + 0.5, 0.0, 1.0)
        cov = build_covariance(sc[0].reshape(-1, 3), rot[0].reshape(-1, 4))
        sh0 = sh[0][..., 0].reshape(-1, 3) + RGB2SH(img.reshape(-1, 3))
        means.append(m[0].reshape(-1, 3))
        covs.append(cov_to_triu(cov))
        cols.append(jnp.clip(SH2RGB(sh0), 0.0, 1.0))
        opas.append(op[0].reshape(-1))
    means = jnp.concatenate(means)
    covs = jnp.concatenate(covs)
    cols = jnp.concatenate(cols)
    opas = jnp.concatenate(opas)

    # gaussians live in the frame's camera coords; view = T_target⁻¹ ∘ T_frame
    T_WC_frame = sim3.matrix(T_WC_f)
    view = jnp.linalg.inv(sim3.matrix(T_WC_target)) @ T_WC_frame

    if rasterizer == "pallas":
        from splatt3r_slam_tpu.splat.pallas_rasterizer import (
            render_tiles_pallas,
        )

        return render_tiles_pallas(means, covs, cols, opas, view, K, hw,
                                   bg, tpg_side=tpg_side, k_max=k_max)
    return render_tiles(means, covs, cols, opas, view, K, hw, bg,
                        tpg_side=tpg_side, k_max=k_max)
