"""Workspace config/include/dotlist + export callbacks."""

import pytest

import numpy as np

from splatt3r_slam_tpu.parallel.export import save_as_ply, save_batch_visuals
from splatt3r_slam_tpu.parallel.workspace import (

    create_workspace,
    git_provenance,
    load_config,
)

pytestmark = pytest.mark.smoke


def test_include_and_dotlist(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nopt:\n  lr: 0.001\n")
    (tmp_path / "exp.yaml").write_text(
        f"include:\n  - {tmp_path / 'base.yaml'}\nopt:\n  wd: 0.1\n"
    )
    cfg = load_config(str(tmp_path / "exp.yaml"),
                      dotlist=["opt.lr=0.01", "name=run1"])
    assert cfg["a"] == 1
    assert cfg["opt"]["lr"] == 0.01
    assert cfg["opt"]["wd"] == 0.1
    assert cfg["name"] == "run1"


def test_create_workspace(tmp_path):
    ws = create_workspace(tmp_path, "exp", {"a": 1})
    assert (ws / "config.yaml").exists()
    assert (ws / "provenance.json").exists()
    prov = git_provenance(".")
    assert "commit" in prov


def test_save_as_ply_roundtrip(tmp_path, rng):
    n = 20
    save_as_ply(
        tmp_path / "g.ply",
        rng.normal(size=(n, 3)),
        rng.random((n, 3)) * 0.1 + 0.01,
        rng.normal(size=(n, 4)),
        rng.normal(size=(n, 3, 1)),
        rng.random(n),
    )
    data = (tmp_path / "g.ply").read_bytes()
    assert data.startswith(b"ply")
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    body = data[header_end:]
    assert len(body) == n * 14 * 4  # 14 float properties


def test_save_batch_visuals(tmp_path, rng):
    import jax.numpy as jnp

    h, w = 16, 16
    batch = {
        "img1": jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
        "target_img": jnp.asarray(rng.random((1, 1, h, w, 3)), jnp.float32),
    }
    rendered = jnp.asarray(rng.random((1, 1, h, w, 3)), jnp.float32)
    save_batch_visuals(tmp_path, 7, batch, rendered)
    assert (tmp_path / "step_0000007.png").exists()
