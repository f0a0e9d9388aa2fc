"""End-to-end conversion parity: torch oracle → convert → flax model.

Builds a tiny randomly-initialized torch model with reference checkpoint
naming, converts its state dict with `checkpoint.convert_state_dict`, and
checks every output of the flax model against the torch forward. This is
the same pipeline the real Splatt3R `.ckpt` goes through.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig  # noqa: E402
from splatt3r_slam_tpu.models.checkpoint import convert_state_dict  # noqa: E402

from torch_oracle import TwoViewOracle  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    oracle = TwoViewOracle(
        enc_dim=cfg.enc_embed_dim, enc_depth=cfg.enc_depth,
        enc_heads=cfg.enc_num_heads, dec_dim=cfg.dec_embed_dim,
        dec_depth=cfg.dec_depth, dec_heads=cfg.dec_num_heads,
    )
    oracle.eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(sd, cfg)
    model = Splatt3RModel(cfg)
    return oracle, model, params


def test_full_forward_parity(pair):
    oracle, model, params = pair
    rng = np.random.default_rng(0)
    h, w = 32, 48
    img1 = rng.normal(size=(1, h, w, 3)).astype(np.float32) * 0.5
    img2 = rng.normal(size=(1, h, w, 3)).astype(np.float32) * 0.5

    with torch.no_grad():
        r1_t, r2_t = oracle(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)),
        )
    r1_j, r2_j = model.apply(
        {"params": params}, jnp.asarray(img1), jnp.asarray(img2)
    )

    for rt, rj, tag in [(r1_t, r1_j, "v1"), (r2_t, r2_j, "v2")]:
        for key in ["pts3d", "conf", "desc", "desc_conf", "scales",
                    "rotations", "opacities", "means"]:
            want = rt[key].numpy()
            got = np.asarray(rj[key])
            np.testing.assert_allclose(
                got, want, atol=5e-4, rtol=1e-3,
                err_msg=f"{tag}:{key}",
            )
        np.testing.assert_allclose(
            np.asarray(rj["sh"]), rt["sh"].numpy(), atol=5e-4, rtol=1e-3
        )


def test_dec_blocks2_duplication(pair):
    """A state dict without dec_blocks2 must duplicate dec_blocks
    (spec: dust3r/model.py:84-91)."""
    oracle, model, params = pair
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    sd_no2 = {k: v for k, v in sd.items() if not k.startswith("dec_blocks2")}
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    p2 = convert_state_dict(sd_no2, cfg)
    np.testing.assert_array_equal(
        np.asarray(p2["dec_blocks"]["blk2"]["attn"]["qkv"]["kernel"][3]),
        np.asarray(p2["dec_blocks"]["blk1"]["attn"]["qkv"]["kernel"][3]),
    )
