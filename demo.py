"""Two-image Gaussian-splat demo (headless CLI or web app).

Parity: reference `splatt3r_core/demo.py` (Gradio two-image app). Two
modes:
  CLI (default): run two-view inference on an image pair, export the
    predicted Gaussians as a 3DGS-format PLY, render an orbit of novel
    views to PNG frames (and an MP4 if OpenCV can encode).
  Web (`--serve PORT`): stdlib HTTP app — upload one or two images in
    the browser, drag an interactive viewer that is rasterized on the
    accelerator per request (`splatt3r_slam_tpu/runtime/webdemo.py`),
    download the .ply.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("image1", nargs="?", default=None)
    p.add_argument("image2", nargs="?", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--n-views", type=int, default=24)
    p.add_argument("--tiny-model", action="store_true")
    p.add_argument("--serve", type=int, default=0, metavar="PORT",
                   help="run the web demo on this port instead of the CLI")
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)
    if args.serve:
        return serve_web(args)
    if not (args.image1 and args.image2):
        p.error("image1 and image2 are required unless --serve is given")

    import cv2
    import jax
    import jax.numpy as jnp

    from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig
    from splatt3r_slam_tpu.parallel.export import save_as_ply
    from splatt3r_slam_tpu.splat.gaussians import (
        RGB2SH, build_covariance, cov_to_triu,
    )
    from splatt3r_slam_tpu.splat.rasterizer import render_tiles
    from splatt3r_slam_tpu.runtime.visualization import (
        orbit_pose, vfov_to_intrinsics,
    )
    from splatt3r_slam_tpu.utils.image import resize_img

    cfg = TwoViewConfig()
    if args.tiny_model:
        cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()

    def load(path):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        out = resize_img(img.astype(np.float32) / 255.0, args.img_size)
        return jnp.asarray(out["img"])

    im1, im2 = load(args.image1), load(args.image2)
    h, w = im1.shape[1:3]

    import main as cli

    model, params = cli.load_model_params(
        argparse.Namespace(checkpoint=args.checkpoint, seed=0), cfg, h, w
    )
    res1, res2 = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b)
    )(params, im1, im2)

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    means, covs, cols, opas = [], [], [], []
    for res, im in ((res1, im1), (res2, im2)):
        m = res["means"][0].reshape(-1, 3)
        cov = build_covariance(res["scales"][0].reshape(-1, 3),
                               res["rotations"][0].reshape(-1, 4))
        sh0 = res["sh"][0][..., 0].reshape(-1, 3) + RGB2SH(
            jnp.clip(im[0] * 0.5 + 0.5, 0, 1).reshape(-1, 3)
        )
        means.append(m)
        covs.append(cov_to_triu(cov))
        cols.append(jnp.clip(sh0 * 0.28209479177387814 + 0.5, 0, 1))
        opas.append(res["opacities"][0].reshape(-1))
    means = jnp.concatenate(means)
    covs = jnp.concatenate(covs)
    cols = jnp.concatenate(cols)
    opas = jnp.concatenate(opas)

    save_as_ply(
        out_dir / "gaussians.ply",
        np.concatenate([np.asarray(res1["means"][0]).reshape(-1, 3),
                        np.asarray(res2["means"][0]).reshape(-1, 3)]),
        np.concatenate([np.asarray(res1["scales"][0]).reshape(-1, 3),
                        np.asarray(res2["scales"][0]).reshape(-1, 3)]),
        np.concatenate([np.asarray(res1["rotations"][0]).reshape(-1, 4),
                        np.asarray(res2["rotations"][0]).reshape(-1, 4)]),
        np.concatenate([np.asarray(res1["sh"][0]).reshape(-1, 3, 1),
                        np.asarray(res2["sh"][0]).reshape(-1, 3, 1)]),
        np.concatenate([np.asarray(res1["opacities"][0]).reshape(-1),
                        np.asarray(res2["opacities"][0]).reshape(-1)]),
    )
    print(f"wrote {out_dir / 'gaussians.ply'}")

    K = jnp.asarray(vfov_to_intrinsics(60.0, h, w))
    center = np.asarray(means).mean(axis=0)
    radius = 0.5 * float(np.linalg.norm(np.asarray(means).std(axis=0))) + 1.0
    frames = []
    for i in range(args.n_views):
        yaw = 2 * np.pi * i / args.n_views
        T = orbit_pose(center, radius, yaw, 0.2)
        view = jnp.asarray(np.linalg.inv(T), jnp.float32)
        img = render_tiles(means, covs, cols, opas, view, K, (h, w),
                           k_max=256)
        u8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(out_dir / f"view_{i:03d}.png"),
                    cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
        frames.append(u8)
    try:
        vw = cv2.VideoWriter(str(out_dir / "orbit.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 12, (w, h))
        for fimg in frames:
            vw.write(cv2.cvtColor(fimg, cv2.COLOR_RGB2BGR))
        vw.release()
    except Exception:
        pass
    print(f"wrote {args.n_views} orbit views under {out_dir}")
    return 0


def serve_web(args):
    import argparse as _ap

    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.runtime.webdemo import DemoEngine, serve

    cfg = TwoViewConfig()
    if args.tiny_model:
        cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()

    import main as cli

    # param shapes are resolution-independent; 384x512 seeds the init
    model, params = cli.load_model_params(
        _ap.Namespace(checkpoint=args.checkpoint, seed=0), cfg, 384, 512)
    engine = DemoEngine(model, params, img_size=args.img_size)
    server = serve(engine, host=args.host, port=args.serve)
    print(f"web demo on http://{args.host}:{server.server_address[1]}/ "
          "(ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
