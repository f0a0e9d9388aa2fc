"""Training experiment runner (run_experiment parity).

Reference: `splatt3r_core/main.py:270-453` — `run_experiment` builds the
model from a workspace config, constructs the optimizer + MultiStepLR
schedule, wires loggers / checkpoint callbacks, and runs Lightning fit
under DDP. Here: the mesh-sharded (dp x fsdp x tp) JAX trainer with CSV
metrics (`parallel/logging.py`), an optional profiler trace window,
periodic eval, and param checkpoints into a timestamped workspace
(`parallel/workspace.py`, provenance included).

Data: `--data` takes .npz files, each holding one batch dict
(img1, img2, gt1_pts, gt2_pts, valid1, valid2 and, for the photometric
loss, context_pose, target_pose, target_K, target_img[, loss_mask]) —
the reference's ScanNet++-pair supervision (`splatt3r_core/main.py:343-366`;
the scannetpp module is absent even in the reference, so the pair-batch
npz is the interchange format). Without `--data`, a synthetic batch
generator drives the identical step for dry-runs and scaling tests.
"""

from __future__ import annotations

import argparse
import os
import sys

# Honor JAX_PLATFORMS even when a sitecustomize has pinned jax_platforms
# via jax.config.update (config beats env vars; see main.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def build_trainer(cfg: dict, args):
    """Config dict -> (Trainer, model_cfg); mirrors run_experiment's
    model/optimizer construction (`splatt3r_core/main.py:272-291,381-388`)."""
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.parallel import TrainConfig, Trainer
    from splatt3r_slam_tpu.parallel.mesh import make_mesh

    mdl = cfg.get("model", {})
    trn = cfg.get("train", {})
    par = cfg.get("parallel", {})

    model_cfg = TwoViewConfig(
        use_offsets=bool(mdl.get("use_offsets", False)),
        remat=bool(mdl.get("remat", True)),  # training default: save HBM
    )
    if args.tiny_model:
        tiny = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
        model_cfg = tiny._replace(use_offsets=model_cfg.use_offsets,
                                  remat=model_cfg.remat)

    tcfg = TrainConfig(
        lr=float(trn.get("lr", 1e-5)),
        weight_decay=float(trn.get("weight_decay", 0.0)),
        lr_milestones=tuple(trn.get("lr_milestones", ())),
        lr_gamma=float(trn.get("lr_gamma", 0.1)),
        grad_clip_norm=float(trn.get("gradient_clip_val", 0.5)),
        train_gaussian_heads_only=bool(
            trn.get("train_gaussian_heads_only", True)),
        mast3r_loss_weight=trn.get("mast3r_loss_weight"),
        conf_alpha=float(trn.get("conf_alpha", 0.2)),
        mse_weight=float(trn.get("mse_weight", 1.0)),
        ssim_weight=float(trn.get("ssim_weight", 0.0)),
        lpips_weight=float(trn.get("lpips_weight", 0.0)),
        render_loss=bool(trn.get("render_loss", False)),
        sh_residual=bool(trn.get("learn_residual", True)),
        k_max=int(trn.get("k_max", 256 if not args.tiny_model else 64)),
        accum_steps=int(trn.get("accumulate_grad_batches", 1)),
    )

    lpips_params = None
    lp_path = trn.get("lpips_params")
    if tcfg.lpips_weight and lp_path:
        from splatt3r_slam_tpu.utils.lpips import load_lpips_params

        lpips_params = load_lpips_params(lp_path)

    devices = int(args.devices or par.get("devices", 1))
    mesh = make_mesh(devices, fsdp=int(par.get("fsdp", 1)),
                     tp=int(par.get("tp", 1)))
    return Trainer(model_cfg, tcfg, mesh=mesh,
                   lpips_params=lpips_params), model_cfg


def synthetic_batches(n_steps, B, h, w, render_loss, seed=0,
                      mask_coverage=None):
    """Deterministic random pair batches with the full supervision dict.

    mask_coverage in (0, 1] adds a 'loss_mask' (B, V, H, W) covering a
    centered box of roughly that area fraction — the test sweep's stand-in
    for the frustum-overlap mask the reference derives from its α/β view
    sampling (the ScanNet++ data module is absent from the reference repo;
    npz batches can carry a real mask instead)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    eye = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    K = jnp.broadcast_to(
        jnp.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1.0]]),
        (B, 1, 3, 3))
    for _ in range(n_steps):
        batch = {
            "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
            "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
            "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)),
                                   jnp.float32),
            "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)),
                                   jnp.float32),
            "valid1": jnp.ones((B, h, w), bool),
            "valid2": jnp.ones((B, h, w), bool),
        }
        if render_loss:
            batch.update({
                "context_pose": eye,
                "target_pose": eye[:, None],
                "target_K": K,
                "target_img": jnp.asarray(rng.random((B, 1, h, w, 3)),
                                          jnp.float32),
            })
            if mask_coverage is not None:
                frac = float(np.sqrt(mask_coverage))
                mh, mw = max(1, round(h * frac)), max(1, round(w * frac))
                m = np.zeros((h, w), np.float32)
                y0, x0 = (h - mh) // 2, (w - mw) // 2
                m[y0:y0 + mh, x0:x0 + mw] = 1.0
                batch["loss_mask"] = jnp.broadcast_to(
                    jnp.asarray(m), (B, 1, h, w))
        yield batch


def npz_batches(paths, epochs):
    import jax.numpy as jnp

    for _ in range(epochs):
        for p in paths:
            z = np.load(p)
            yield {k: jnp.asarray(z[k]) for k in z.files}


def run_test_sweep(trainer, params, args, h, w, ws, bshard):
    """Masked-metric test protocol (run_experiment parity,
    `splatt3r_core/main.py:394-437`): for each α=β the reference rebuilds
    its test dataset, then evaluates under (apply_mask, average_over_mask)
    ∈ {(True, False), (True, True)} with spatial LPIPS and masked SSIM,
    accumulating one `results.json` keyed by the sweep point. Here each
    α/β yields test batches whose loss mask covers ~α·β of the image
    (real masks come in via --data npz), and `Trainer.make_eval_step`
    carries the masking semantics."""
    import json

    import jax

    masking_configs = ((True, False), (True, True))
    eval_fns = {mc: trainer.make_eval_step(apply_mask=mc[0],
                                           average_over_mask=mc[1])
                for mc in masking_configs}
    results = {}
    for alpha in args.alphas:
        beta = alpha
        if args.data:
            batches = [jax.device_put(b, bshard)
                       for b in npz_batches(args.data, 1)]
        else:
            B = args.batch_size or trainer.mesh.size
            batches = [
                jax.device_put(b, bshard)
                for b in synthetic_batches(
                    2, B, h, w, True, seed=args.seed + 17,
                    mask_coverage=alpha * beta)
            ]
        for apply_mask, average_over_mask in masking_configs:
            eval_fn = eval_fns[(apply_mask, average_over_mask)]
            agg: dict[str, list[float]] = {}
            for b in batches:
                metrics, _rendered = eval_fn(params, b)
                for k, v in metrics.items():
                    agg.setdefault(k, []).append(float(v))
            res = {f"test/{k}": sum(v) / len(v) for k, v in agg.items()}
            lp = res.get("test/lpips", float("nan"))
            res["test/loss"] = (
                trainer.cfg.mse_weight * res["test/mse"]
                + (trainer.cfg.lpips_weight * lp if lp == lp else 0.0)
            )
            key = (f"alpha: {alpha}, beta: {beta}, "
                   f"apply_mask: {apply_mask}, "
                   f"average_over_mask: {average_over_mask}")
            results[key] = [res]
            print(f"{key} -> psnr {res['test/psnr']:.2f} "
                  f"ssim {res['test/ssim']:.4f}")
            save_path = ws / "results.json"
            with open(save_path, "w") as f:
                json.dump(results, f, indent=1)
    print(f"results: {ws / 'results.json'}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--config", default=None,
                   help="workspace YAML (include: list supported)")
    p.add_argument("--set", dest="overrides", nargs="*", default=[],
                   help="dotlist overrides, e.g. train.lr=2e-5")
    p.add_argument("--name", default="experiment")
    p.add_argument("--out", default="logs/train")
    p.add_argument("--data", nargs="*", default=None,
                   help=".npz batch files (see module docstring)")
    p.add_argument("--epochs", type=int, default=1,
                   help="passes over --data files")
    p.add_argument("--steps", type=int, default=10,
                   help="synthetic-batch steps when --data is not given")
    p.add_argument("--devices", type=int, default=0,
                   help="mesh size (0 = config parallel.devices, dflt 1)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="synthetic per-step batch (0 = mesh size)")
    p.add_argument("--res", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--tiny-model", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="init from a Splatt3R .ckpt/.pth (converted)")
    p.add_argument("--resume", default=None,
                   help="resume params from a save_params .npz")
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--trace", type=int, nargs=2, default=None,
                   metavar=("START", "STOP"),
                   help="profiler trace window (step range)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--test", action="store_true",
                   help="masked-metric test sweep instead of training: "
                        "α/β × (apply_mask, average_over_mask) → "
                        "results.json (run_experiment parity, "
                        "splatt3r_core/main.py:394-437)")
    p.add_argument("--alphas", type=float, nargs="*",
                   default=[0.9, 0.7, 0.5, 0.3],
                   help="--test sweep α (=β) values")
    args = p.parse_args(argv)

    import jax

    from splatt3r_slam_tpu.parallel.mesh import batch_sharding
    from splatt3r_slam_tpu.parallel.workspace import (
        create_workspace,
        load_config,
    )

    cfg = load_config(args.config, dotlist=args.overrides) \
        if args.config else {}
    if not args.config:
        from splatt3r_slam_tpu.parallel.workspace import _set_dotted

        for item in args.overrides:
            k, v = item.split("=", 1)
            _set_dotted(cfg, k, v)

    trainer, model_cfg = build_trainer(cfg, args)
    h, w = args.res or ((32, 48) if args.tiny_model else (256, 384))

    params, opt_state, pshard = trainer.init_state(h, w, seed=args.seed)
    if args.checkpoint:
        from splatt3r_slam_tpu.models.checkpoint import load_splatt3r_params

        print(f"init from checkpoint: {args.checkpoint}")
        params = jax.device_put(
            jax.tree.map(np.asarray,
                         load_splatt3r_params(args.checkpoint, model_cfg)),
            pshard)
        opt_state = trainer.tx.init(params)
    elif args.resume:
        print(f"resume params: {args.resume}")
        params = jax.device_put(trainer.load_params(args.resume), pshard)
        opt_state = trainer.tx.init(params)

    ws = create_workspace(args.out, args.name, cfg)
    print(f"workspace: {ws} (mesh {trainer.mesh.shape})")

    bshard = batch_sharding(trainer.mesh)
    if args.test:
        return run_test_sweep(trainer, params, args, h, w, ws, bshard)
    if args.data:
        raw = npz_batches(args.data, args.epochs)
    else:
        B = args.batch_size or trainer.mesh.size
        raw = synthetic_batches(args.steps, B, h, w,
                                trainer.cfg.render_loss, seed=args.seed)
    batches = (jax.device_put(b, bshard) for b in raw)

    eval_batches = None
    if args.eval_every:
        B = args.batch_size or trainer.mesh.size
        # eval_step always renders target views -> pose fields required
        eval_batches = [
            jax.device_put(b, bshard)
            for b in synthetic_batches(1, B, h, w, True,
                                       seed=args.seed + 1)
        ]

    params, opt_state, csv_path = trainer.fit(
        params, opt_state, pshard, batches,
        run_dir=ws, run_name=args.name,
        log_every=args.log_every, eval_every=args.eval_every,
        eval_batches=eval_batches,
        trace_steps=tuple(args.trace) if args.trace else None,
        verbose=args.verbose,
    )
    trainer.save_params(ws / "params_final.npz", params)
    print(f"metrics: {csv_path}\nparams: {ws / 'params_final.npz'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
