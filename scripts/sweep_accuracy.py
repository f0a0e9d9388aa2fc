#!/usr/bin/env python
"""Fast-path knob sweep on the sub-pixel synthetic oracle.

Measures the accuracy cost of the TPU fast-path approximations against
reference-exact settings (VERDICT r1, task 2):
  - matching.match_stride   {1, 2}       (subgrid matching + pose GN)
  - local_opt.gn_stride     {1, 4}       (global-opt residual rows)
  - closed_form_init        {off, on}    (pinhole seed + short LM polish)
  - refine_quantize         {off, on}    (int8 descriptor tables)

Runs on CPU; writes logs/sweep_accuracy.json and prints a markdown table
(committed to PARITY.md). Usage: python scripts/sweep_accuracy.py
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from splatt3r_slam_tpu import config as cfgmod  # noqa: E402
from splatt3r_slam_tpu.tracking.tracker import TrackingConfig  # noqa: E402

import synthetic_pair as sp  # noqa: E402

H, W = 96, 128
N_SEEDS = 5
N_PAIRS = 4


def sweep_tracking():
    cfgmod.load_config("config/base.yaml")
    tcfg = TrackingConfig.from_config(cfgmod.config)
    sc = sp.make_scene(H, W)

    variants = {
        "reference-exact": dict(match_stride=1, closed_form_init=False,
                                max_iter=10, refine_quantize=False),
        "match_stride=2": dict(match_stride=2, closed_form_init=False,
                               max_iter=10, refine_quantize=False),
        "closed_form_init": dict(match_stride=1, closed_form_init=True,
                                 polish_iters=2, max_iter=10,
                                 refine_quantize=False),
        "refine_quantize": dict(match_stride=1, closed_form_init=False,
                                max_iter=10, refine_quantize=True),
        "tpu-fast (all on)": dict(match_stride=2, closed_form_init=True,
                                  polish_iters=2, max_iter=10,
                                  refine_quantize=True),
    }

    results = {}
    for name, kw in variants.items():
        rot, trn, fails, fracs = [], [], 0, []
        for seed in range(N_SEEDS):
            rng = np.random.default_rng(seed)
            views = sp.make_trajectory(sc, N_PAIRS + 1, rng)
            for k in range(N_PAIRS):
                vk, vf = views[k], views[k + 1]
                Xc = sp.cross_pointmap(sc, vk, vf["T"], rng)
                ang, terr, fail, frac = sp.track_pair(
                    sc, vf, vk, Xc, tcfg, **kw)
                rot.append(ang)
                trn.append(terr)
                fails += int(fail)
                fracs.append(frac)
        results[name] = dict(
            rot_deg_mean=float(np.mean(rot)), rot_deg_max=float(np.max(rot)),
            t_err_mean=float(np.mean(trn)), t_err_max=float(np.max(trn)),
            fails=fails, match_frac=float(np.mean(fracs)), **kw,
        )
        print(f"[tracking] {name:22s} rot {np.mean(rot):.4f}° "
              f"t {np.mean(trn):.5f} frac {np.mean(fracs):.3f}")
    return results


def sweep_backend():
    sc = sp.make_scene(H, W)
    results = {}
    for name, stride in (("gn_stride=1", 1), ("gn_stride=4", 4)):
        ates = []
        for seed in range(N_SEEDS):
            rng = np.random.default_rng(100 + seed)
            views = sp.make_trajectory(sc, 6, rng)
            ates.append(sp.solve_graph(sc, views, rng, gn_stride=stride))
        results[name] = dict(ate_mean=float(np.mean(ates)),
                             ate_max=float(np.max(ates)), gn_stride=stride)
        print(f"[backend ] {name:22s} ATE {np.mean(ates):.5f} "
              f"(max {np.max(ates):.5f})")
    return results


def main():
    out = {"scene": f"{H}x{W} textured plane, sigma_x=0.004 rel, "
                    f"sigma_desc=0.05, {N_SEEDS} seeds",
           "tracking": sweep_tracking(), "backend": sweep_backend()}
    path = pathlib.Path("logs/sweep_accuracy.json")
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"\nwrote {path}")

    ref = out["tracking"]["reference-exact"]
    print("\n| variant | rot err (deg, mean) | t err (mean) | vs exact |")
    print("|---|---|---|---|")
    for name, r in out["tracking"].items():
        print(f"| {name} | {r['rot_deg_mean']:.4f} | {r['t_err_mean']:.5f}"
              f" | {r['t_err_mean'] / max(ref['t_err_mean'], 1e-12):.2f}x |")
    b1 = out["backend"]["gn_stride=1"]
    for name, r in out["backend"].items():
        print(f"| {name} | — | ATE {r['ate_mean']:.5f} | "
              f"{r['ate_mean'] / max(b1['ate_mean'], 1e-12):.2f}x |")


if __name__ == "__main__":
    main()
