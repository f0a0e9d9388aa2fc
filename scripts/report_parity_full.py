#!/usr/bin/env python
"""Measure per-stage max-abs/rel diffs of the full-dims flax port vs the
cached torch goldens (tests/goldens/reference_parity_full.npz) and print
the PARITY.md table (VERDICT r1, missing-1: atol table at production
dims ViT-L 512x384).

Reuses tests/test_reference_parity_full.py's model builders; the torch
side is only rebuilt if the golden cache is missing.

Usage: python scripts/report_parity_full.py  (CPU, ~10 min single-core)
Writes logs/parity_full_diffs.json.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

import test_reference_parity_full as T  # noqa: E402

from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig  # noqa: E402
from splatt3r_slam_tpu.models.checkpoint import convert_state_dict  # noqa: E402


def stat(j, g):
    j = np.asarray(j, np.float64).reshape(np.asarray(g).shape)
    g = np.asarray(g, np.float64)
    d = np.abs(j - g)
    rel = d / (np.abs(g) + 1e-6)
    return dict(max_abs=float(d.max()), rms=float(np.sqrt((d ** 2).mean())),
                max_rel=float(rel.max()), g_absmax=float(np.abs(g).max()))


def main():
    tm = T._build_torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fp = T._fingerprint(sd)
    img1, img2 = T._inputs()

    golden = None
    if T.GOLD.exists():
        z = np.load(T.GOLD, allow_pickle=False)
        if str(z["fingerprint"]) == fp:
            golden = {k: z[k] for k in z.files if k != "fingerprint"}
    if golden is None:
        golden = T._torch_stages(tm, img1, img2)
        T.GOLD.parent.mkdir(exist_ok=True)
        np.savez(T.GOLD, fingerprint=np.str_(fp), **golden)
    del tm

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32",
                        use_offsets=True, sh_degree=1)
    params = convert_state_dict(sd, cfg)
    del sd
    jm = Splatt3RModel(cfg)

    out = {}
    jf1, jp1 = jm.apply({"params": params}, jnp.asarray(img1),
                        method=jm.encode)
    jf2, jp2 = jm.apply({"params": params}, jnp.asarray(img2),
                        method=jm.encode)
    out["enc1"] = stat(jf1, golden["enc1"])
    out["enc2"] = stat(jf2, golden["enc2"])
    jd1, jd2 = jm.apply({"params": params}, jf1, jp1, jf2, jp2,
                        method=jm.decode)
    for vi, hooks in (("1", jd1), ("2", jd2)):
        for jt, hi in zip(hooks, (0, 6, 9, 12)):
            out[f"hook{vi}_{hi}"] = stat(jt, golden[f"hook{vi}_{hi}"])
    jr1, jr2 = jm.apply({"params": params}, jnp.asarray(img1),
                        jnp.asarray(img2))
    for vi, jr in (("1", jr1), ("2", jr2)):
        for k in T.HEAD_KEYS:
            out[f"head{vi}_{k}"] = stat(jr[k], golden[f"head{vi}_{k}"])

    path = pathlib.Path("logs/parity_full_diffs.json")
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")

    print("\n| stage/output | max_abs | rms | |ref| max |")
    print("|---|---|---|---|")
    for k, s in out.items():
        print(f"| {k} | {s['max_abs']:.2e} | {s['rms']:.2e} | "
              f"{s['g_absmax']:.2f} |")


if __name__ == "__main__":
    main()
