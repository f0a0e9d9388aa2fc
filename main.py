"""Splatt3R-SLAM (TPU) — command-line entry point.

CLI contract mirrors the reference `main.py:201-262` (README
"Command-Line Arguments"): dataset path, config, optional calibration
YAML, save options, Gaussian accumulation knobs, headless/no-viz modes.

Runtime architecture: single host process driving jitted TPU programs
(SURVEY.md §2c) — frontend tracking, inline/threaded backend global
optimization, retrieval loop closure, Gaussian accumulation + per-frame
render export.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import shutil
import sys

import numpy as np

# Honor JAX_PLATFORMS even when a sitecustomize has pinned jax_platforms
# via jax.config (config updates beat env vars).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Splatt3R-SLAM (TPU-native)")
    p.add_argument("--dataset", required=True,
                   help="path: tum/euroc/eth3d/7-scenes dir, video file, "
                        "RGB folder, 'webcam', or 'realsense'")
    p.add_argument("--config", default="config/base.yaml")
    p.add_argument("--calib", default="", help="intrinsics YAML override")
    p.add_argument("--checkpoint", default=None,
                   help="Splatt3R .ckpt / MASt3R .pth (torch) to convert; "
                        "omit to resolve local checkpoints/ then the HF "
                        "hub (reference splatt3r_utils.py:30-65), falling "
                        "back to random weights")
    p.add_argument("--require-checkpoint", action="store_true",
                   help="error out instead of falling back to random "
                        "weights (eval scripts: an ATE on random weights "
                        "is meaningless)")
    p.add_argument("--retrieval-checkpoint", default=None)
    p.add_argument("--codebook", default=None)
    p.add_argument("--save-as", default="default")
    p.add_argument("--no-viz", action="store_true")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--no-gaussians", action="store_true")
    p.add_argument("--gaussian-stride", "--spatial-stride", type=int,
                   default=4, dest="gaussian_stride",
                   help="spatial subsampling stride of appended gaussians")
    p.add_argument("--max-gaussians", type=int, default=4 * 1024 * 1024)
    # splash-filter knobs (reference main.py:240-261 -> gaussians_to_world)
    p.add_argument("--depth-max-percentile", type=float, default=0.98,
                   help="drop gaussians deeper than this depth percentile "
                        "(1.0 disables)")
    p.add_argument("--max-scale", type=float, default=0.5,
                   help="drop gaussians whose largest scale axis exceeds "
                        "this (hallucinated splash artifacts)")
    p.add_argument("--min-confidence", type=float, default=1.5,
                   help="drop gaussians below this pointmap confidence "
                        "(0 disables)")
    p.add_argument("--render-stride", type=int, default=1,
                   help="export a GS render PNG every N frames (0 = off). "
                        "Default 1 matches the reference's default-on "
                        "per-frame render export (main.py:336,490-506: "
                        "--render-gaussians defaults True)")
    p.add_argument("--c-conf-threshold", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny-model", action="store_true",
                   help="scaled-down model (CI / CPU smoke runs)")
    p.add_argument("--flash-attention", choices=("auto", "on", "off"),
                   default="auto",
                   help="attention kernel selection (auto = measured "
                        "crossover; 768-token tracking shapes use the "
                        "fused-einsum path, which is 44%% faster on v5e)")
    p.add_argument("--no-prewarm", action="store_true",
                   help="skip the startup background compile of the "
                        "backend's first shape ladder (edge-batch "
                        "decodes, edge gate, staged solve buckets); "
                        "without prewarm a cold compile cache pays "
                        "multi-second XLA compiles mid-sequence at each "
                        "first-seen shape")
    return p.parse_args(argv)


def load_model_params(args, cfg_model, h, w):
    """Checkpoint (if available) or deterministic random weights."""
    import jax
    import jax.numpy as jnp

    from splatt3r_slam_tpu.models import Splatt3RModel
    from splatt3r_slam_tpu.models.checkpoint import load_splatt3r_params

    from splatt3r_slam_tpu.models.checkpoint import resolve_checkpoint

    model = Splatt3RModel(cfg_model)
    ckpt = args.checkpoint
    if ckpt is None:
        # explicit path > local checkpoints/ > HF hub download — same
        # chain as the reference's load_splatt3r (splatt3r_utils.py:30-65)
        try:
            ckpt = resolve_checkpoint(None)
        except FileNotFoundError as e:
            if getattr(args, "require_checkpoint", False):
                raise SystemExit(f"--require-checkpoint: {e}")
            print(f"checkpoint resolution failed: {e}")
    if ckpt is not None:
        print(f"Loading Splatt3R checkpoint: {ckpt}")
        params = load_splatt3r_params(ckpt, cfg_model)
        params = jax.tree.map(jnp.asarray, params)
    else:
        print("WARNING: no checkpoint found — using random weights "
              "(geometry will be meaningless).")
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(args.seed), img, img)
        )["params"]
        rng = np.random.default_rng(args.seed)

        def fill(path, s):
            name = getattr(path[-1], "key", "")
            if name == "scale":
                return jnp.ones(s.shape, s.dtype)
            if name == "bias":
                return jnp.zeros(s.shape, s.dtype)
            fan_in = int(np.prod(s.shape[:-1])) or 1
            return jnp.asarray(
                rng.standard_normal(s.shape, dtype=np.float32)
                / np.sqrt(fan_in), s.dtype)

        params = jax.tree_util.tree_map_with_path(fill, shapes)
    return model, params


def _apply_gui_state(system, args, state):
    """Apply live GUI controls to the running system, mirroring the
    reference main loop (`main.py:368-386` consumes spatial_stride and
    max_gaussians each tick; `main.py:545` uses C_conf_threshold)."""
    if state.max_gaussians > 0:
        system.pool.max_gaussians = state.max_gaussians
    if system.gaussian_module is not None:
        system.gaussian_module.kw["spatial_stride"] = state.spatial_stride
    # C_conf slider gates the PLY/pointmap export only (main.py:545);
    # the gaussian splash filter keeps the --min-confidence flag value
    # (main.py:421,475 always pass args.min_confidence).
    args.c_conf_threshold = state.C_conf_threshold


def main(argv=None):
    args = parse_args(argv)

    from splatt3r_slam_tpu import config as cfgmod

    if args.flash_attention != "auto":
        # must run before the first model trace (mode is read at trace time)
        from splatt3r_slam_tpu.models.layers import set_flash_attention

        set_flash_attention(args.flash_attention)

    cfg = cfgmod.load_config(args.config)
    if args.calib:
        import yaml

        with open(args.calib) as f:
            intr = yaml.safe_load(f)
        cfgmod.config["use_calib"] = True
        cfgmod.config["calib_params"] = intr

    from splatt3r_slam_tpu.backend import FactorGraph
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.retrieval import RetrievalDatabase
    from splatt3r_slam_tpu.runtime import evaluate as ev
    from splatt3r_slam_tpu.runtime.dataloader import Intrinsics, load_dataset
    from splatt3r_slam_tpu.runtime.frame import create_frame
    from splatt3r_slam_tpu.runtime.inference import InferenceEngine
    from splatt3r_slam_tpu.runtime.system import SLAMSystem
    from splatt3r_slam_tpu.splat import GaussianAccumulator
    from splatt3r_slam_tpu.splat.decoder import render_frame

    dataset = load_dataset(args.dataset)
    dataset.img_size = args.img_size
    stride = cfg["dataset"]["subsample"]
    if stride > 1 and dataset.save_results:
        dataset.subsample(stride)

    if args.calib and "calib_params" in cfgmod.config:
        # reference intrinsics schema: {width, height, calibration: [...]}
        c = cfgmod.config["calib_params"]
        _, (H0, W0) = dataset.get_img_shape()
        if "calibration" in c:
            calib_vec = list(c["calibration"])
        else:
            calib_vec = [c["fx"], c["fy"], c["cx"], c["cy"]] + list(
                c.get("distortion", [])
            )
        dataset.camera_intrinsics = Intrinsics.from_calib(
            dataset.img_size, c.get("width", W0), c.get("height", H0),
            calib_vec,
        )
        dataset.use_calibration = True

    (h, w), _ = dataset.get_img_shape()
    print(f"Working resolution: {h}x{w}")

    # model precision profile: eval configs pin head_dtype float32 for the
    # reference's exact head precision (mast3r_utils.py:37-40); the
    # real-time profile defaults to the bf16 trunk (models/dpt.py note)
    mknobs = cfgmod.config.get("model", {}) or {}
    cfg_model = TwoViewConfig(
        dtype=mknobs.get("dtype", TwoViewConfig._field_defaults["dtype"]),
        head_dtype=mknobs.get(
            "head_dtype", TwoViewConfig._field_defaults["head_dtype"]),
    )
    if args.tiny_model:
        cfg_model = TwoViewConfig(dtype="float32",
                                  head_dtype="float32").tiny()
    model, params = load_model_params(args, cfg_model, h, w)
    engine = InferenceEngine(model, params, h, w)

    K = None
    if cfgmod.config.get("use_calib") and dataset.has_calib():
        import jax.numpy as jnp

        K = jnp.asarray(dataset.camera_intrinsics.K_frame, jnp.float32)

    retrieval = None
    try:
        retrieval = RetrievalDatabase(
            checkpoint_path=args.retrieval_checkpoint,
            codebook_path=args.codebook,
            feat_dim=cfg_model.enc_embed_dim,
            proj_dim=min(cfg_model.enc_embed_dim, 1024),
        )
    except Exception as e:  # pragma: no cover
        print(f"retrieval disabled: {e}")

    system = SLAMSystem(engine, h, w, K=K)
    system.backend = FactorGraph(engine, system.keyframes, K=K,
                                 retrieval=retrieval)
    if not args.no_prewarm:
        # compile the backend's first shape ladder on a daemon thread
        # while the first frames stream (kills the cold-cache ~20 s
        # mid-sequence stall on first-shape backend programs)
        system.prewarm()
    if not args.no_gaussians:
        system.gaussian_module = GaussianAccumulator(
            spatial_stride=args.gaussian_stride,
            depth_max_percentile=args.depth_max_percentile,
            max_scale=args.max_scale,
            min_confidence=args.min_confidence,
        )
        system.pool.max_gaussians = args.max_gaussians

    save_dir, seq_name = ev.prepare_savedir(args.save_as, dataset)
    render_dir = save_dir / f"{seq_name}_renders"
    if args.render_stride > 0:
        shutil.rmtree(render_dir, ignore_errors=True)
        render_dir.mkdir(parents=True, exist_ok=True)

    viewer = None
    if not args.no_viz:
        from splatt3r_slam_tpu.runtime.visualization import Viewer

        headless = not bool(os.environ.get("DISPLAY"))
        viewer = Viewer(system, hw=(h, w), headless=headless,
                        out_dir=save_dir / f"{seq_name}_viz")
        # seed GUI state from CLI so headless ticks are no-ops
        viewer.state.C_conf_threshold = args.c_conf_threshold
        viewer.state.spatial_stride = args.gaussian_stride
        viewer.state.gs_on = not args.no_gaussians

    import time

    downsample = cfgmod.config["dataset"]["img_downsample"]
    n = len(dataset) if args.max_frames is None else min(len(dataset),
                                                         args.max_frames)

    # dataset read + resize + upload overlap device compute (the
    # reference's separate dataloader process, main.py 3-process pipeline)
    from splatt3r_slam_tpu.runtime.frame import FramePrefetcher

    def load(i):
        ts, img = dataset[i]
        return ts, create_frame(i, img, img_size=args.img_size,
                                downsample=downsample)

    prefetch = FramePrefetcher(load, n)
    timestamps = []

    # 1-render-lag PNG export: write the PREVIOUS frame's render while the
    # device computes the next one (each fresh sync costs a ~35 ms tunnel
    # round-trip; the reference hides this in its visualization process)
    pending_render = None  # (frame_idx, device_image)

    def _flush_render():
        nonlocal pending_render
        if pending_render is None:
            return
        ri, img_r = pending_render
        pending_render = None
        import cv2

        out = (np.clip(np.asarray(img_r), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(render_dir / f"{ri:06d}.png"),
                    cv2.cvtColor(out, cv2.COLOR_RGB2BGR))

    t0 = time.time()
    try:
        for i in range(n):
            ts, frame = prefetch.get(i)
            timestamps.append(ts)
            if K is not None:
                frame.K = K
            system.process_frame(frame)

            if args.render_stride > 0 and i % args.render_stride == 0:
                system.engine.ensure_gaussians(frame)
            if args.render_stride > 0 and i % args.render_stride == 0 and \
                    frame.gaussian_pred is not None:
                kf = system.keyframes.last_keyframe()
                img_r = render_frame(frame, kf if kf is not None else frame, K=K)
                if img_r is not None:
                    _flush_render()
                    pending_render = (i, img_r)

            if viewer is not None and i % 10 == 0 and system.pool.n > 0:
                state = viewer.update()
                _apply_gui_state(system, args, state)
                if state.is_terminated:
                    break
                while state.is_paused and not state.next and \
                        not state.is_terminated:
                    state = viewer.update()
                state.next = False

            if i % 30 == 29:
                fps = (i + 1) / (time.time() - t0)
                print(f"frame {i + 1}/{n}  FPS {fps:.2f}  mode {system.mode}  "
                      f"keyframes {len(system.keyframes)}")

    finally:
        prefetch.close()
        _flush_render()
    elapsed = time.time() - t0
    print(f"done: {n} frames in {elapsed:.1f}s "
          f"({n / max(elapsed, 1e-9):.2f} FPS), "
          f"{len(system.keyframes)} keyframes")

    if dataset.save_results:
        ev.save_traj(save_dir, f"{seq_name}.txt", timestamps,
                     system.keyframes)
        ev.save_reconstruction(save_dir, f"{seq_name}.ply", system.keyframes,
                               args.c_conf_threshold)
        ev.save_keyframes(save_dir / f"{seq_name}_keyframes", timestamps,
                          system.keyframes)
        print(f"results under {save_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
