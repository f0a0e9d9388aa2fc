"""Ablation experiment runner (training-side).

Parity: reference `splatt3r_core/ablations.py` — sweeps trainer
configurations and records metrics per run. Here: each ablation is a
dotlist override on a base YAML; runs execute short training loops on
synthetic (or npz-provided) batches and dump per-step metrics + final
params into a timestamped workspace.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Honor JAX_PLATFORMS even when a sitecustomize has pinned jax_platforms
# via jax.config.update (config beats env vars; see main.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

ABLATIONS = {
    "baseline": [],
    "no_offsets": ["model.use_offsets=false"],
    "with_offsets": ["model.use_offsets=true"],
    "full_finetune": ["train.train_gaussian_heads_only=false"],
    "with_ssim": ["train.ssim_weight=0.2"],
    "with_mast3r_loss": ["train.mast3r_loss_weight=0.1"],
}


def run_one(name, dotlist, args):
    import jax
    import jax.numpy as jnp

    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.parallel import TrainConfig, Trainer
    from splatt3r_slam_tpu.parallel.mesh import batch_sharding, make_mesh
    from splatt3r_slam_tpu.parallel.workspace import (
        create_workspace,
        load_config,
    )

    if args.config:
        cfg = load_config(args.config, dotlist=dotlist)
    else:
        from splatt3r_slam_tpu.parallel.workspace import _set_dotted

        cfg = {}
        for item in dotlist:
            k, v = item.split("=", 1)
            _set_dotted(cfg, k, v)
    mdl = cfg.get("model", {})
    trn = cfg.get("train", {})

    model_cfg = TwoViewConfig(use_offsets=bool(mdl.get("use_offsets", False)))
    if args.tiny:
        model_cfg = model_cfg._replace(
            **TwoViewConfig(dtype="float32", head_dtype="float32")
            .tiny()._asdict()
        )
    tcfg = TrainConfig(
        lr=float(trn.get("lr", 1e-5)),
        train_gaussian_heads_only=bool(
            trn.get("train_gaussian_heads_only", True)
        ),
        mast3r_loss_weight=trn.get("mast3r_loss_weight"),
        grad_clip_norm=float(trn.get("gradient_clip_val", 0.5)),
        ssim_weight=float(trn.get("ssim_weight", 0.0)),
        render_loss=bool(trn.get("render_loss", True)),
        k_max=int(trn.get("k_max", 64)),
    )
    mesh = make_mesh(args.devices)
    trainer = Trainer(model_cfg, tcfg, mesh=mesh)
    h, w = args.res
    params, opt_state, pshard = trainer.init_state(h, w)
    step = trainer.make_train_step(pshard)

    rng = np.random.default_rng(0)
    B = args.devices
    eye = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    K = jnp.broadcast_to(
        jnp.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1.0]]), (B, 1, 3, 3)
    )
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "valid1": jnp.ones((B, h, w), bool),
        "valid2": jnp.ones((B, h, w), bool),
        "context_pose": eye,
        "target_pose": eye[:, None],
        "target_K": K,
        "target_img": jnp.asarray(rng.random((B, 1, h, w, 3)), jnp.float32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))

    ws = create_workspace(args.out, f"ablation_{name}", cfg)
    history = []
    for it in range(args.steps):
        params, opt_state, m = step(params, opt_state, batch)
        history.append({k: float(v) for k, v in m.items()})
    with open(ws / "metrics.json", "w") as f:
        json.dump(history, f, indent=2)
    print(f"[{name}] final: {history[-1]}")
    return history[-1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--ablations", nargs="*", default=list(ABLATIONS))
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--res", type=int, nargs=2, default=(32, 48))
    p.add_argument("--out", default="logs/ablations")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--set", dest="overrides", nargs="*", default=[],
                   help="extra dotlist overrides applied to every run")
    args = p.parse_args(argv)

    results = {}
    for name in args.ablations:
        dotlist = ABLATIONS.get(name, []) + list(args.overrides)
        results[name] = run_one(name, dotlist, args)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
