#!/usr/bin/env python
"""Rasterizer approximation fidelity sweep (VERDICT r1, task 6).

PSNR/SSIM of the production tile renderer at k_max ∈ {128, 256, 512,
1024} and tpg_side ∈ {2, 4, 8} against the EXACT compositing oracle
(`render_bruteforce_scan`: no depth cap, no coverage crop) across three
scene densities. Density (gaussians per tile) is what the approximations
trade against, so scenes are generated at a fixed 192x256 render with
G ∈ {30k, 150k, 600k} — per-tile loads spanning the production range
(512x384 with 0.1-2.4M pool gaussians).

Usage: python scripts/sweep_rasterizer_fidelity.py [--cpu] [--quick]
Writes logs/sweep_rasterizer_fidelity.json + a markdown table (PARITY.md).
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def make_scene(G, seed=0, spread=3.0):
    """Random SLAM-like cloud in front of the camera: positions filling
    the frustum, anisotropic scales, random orientations/opacities."""
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    from splatt3r_slam_tpu.splat.gaussians import build_covariance, cov_to_triu

    means = np.empty((G, 3), np.float32)
    means[:, 2] = 1.5 + 6.0 * rng.random(G)
    means[:, 0] = (rng.random(G) - 0.5) * spread * means[:, 2]
    means[:, 1] = (rng.random(G) - 0.5) * spread * 0.75 * means[:, 2]
    scales = (0.004 + 0.02 * rng.random((G, 3))).astype(np.float32) \
        * means[:, 2:3]
    q = rng.normal(size=(G, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    covt = cov_to_triu(build_covariance(jnp.asarray(scales), jnp.asarray(q)))
    colors = rng.random((G, 3)).astype(np.float32)
    opa = (0.2 + 0.8 * rng.random(G)).astype(np.float32)
    return jnp.asarray(means), covt, jnp.asarray(colors), jnp.asarray(opa)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else float(10 * np.log10(1.0 / mse))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="one small scene (CI smoke)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from splatt3r_slam_tpu.splat.rasterizer import (
        render_bruteforce_scan,
        render_tiles,
    )
    from splatt3r_slam_tpu.utils.metrics import ssim_mean

    HW = (192, 256)
    K = jnp.asarray(np.array(
        [[200.0, 0, HW[1] / 2], [0, 200.0, HW[0] / 2], [0, 0, 1]],
        np.float32))
    view = jnp.eye(4)

    scenes = [30_000] if args.quick else [30_000, 150_000, 600_000]
    kms = [128] if args.quick else [128, 256, 512, 1024]
    tpgs = [4] if args.quick else [2, 4, 8]

    results = []
    for G in scenes:
        means, covt, colors, opa = make_scene(G)
        exact = np.clip(np.asarray(render_bruteforce_scan(
            means, covt, colors, opa, view, K, HW)), 0, 1)
        for tpg in tpgs:
            for km in kms:
                img = np.clip(np.asarray(render_tiles(
                    means, covt, colors, opa, view, K, HW,
                    tpg_side=tpg, k_max=km)), 0, 1)
                r = dict(
                    G=G, tpg_side=tpg, k_max=km,
                    psnr=round(psnr(img, exact), 2),
                    ssim=round(float(ssim_mean(
                        jnp.asarray(img), jnp.asarray(exact))), 4),
                    max_abs=round(float(np.abs(img - exact).max()), 4),
                )
                results.append(r)
                print(r)

    out = {"hw": list(HW), "scenes": scenes, "results": results}
    path = pathlib.Path("logs/sweep_rasterizer_fidelity.json")
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")

    print("\n| G | tpg_side | k_max | PSNR | SSIM | max_abs |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['G']} | {r['tpg_side']} | {r['k_max']} | "
              f"{r['psnr']} | {r['ssim']} | {r['max_abs']} |")


if __name__ == "__main__":
    main()
