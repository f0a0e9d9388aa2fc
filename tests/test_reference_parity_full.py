"""Production-dims parity against the ACTUAL vendored reference model.

Round-1 parity ran tiny transformer dims; this suite proves the converter
and the scanned-blocks flax model are exact WHERE IT MATTERS: the real
architecture (ViT-L encoder 24x1024/16h, dual 12x768/12h decoders, full
DPT heads, use_offsets=True) at the production input 512x384, fp32, CPU.

The torch side is expensive (~minutes single-core), so its stage outputs
are dumped once to tests/goldens/reference_parity_full.npz keyed by a
fingerprint of the (seeded) state dict; reruns only pay the flax forward.

Reference call surface: `dust3r/dust3r/model.py:121-207`,
`mast3r/catmlp_dpt_head.py:140-328`, construction args
`splatt3r_core/main.py:54-71`.
"""

import hashlib
import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/splatt3r_core/src/mast3r_src")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference tree absent"),
]

for p in (REF, REF / "dust3r", REF / "dust3r" / "croco"):
    if str(p) not in sys.path:
        sys.path.insert(0, str(p))

import jax.numpy as jnp  # noqa: E402

from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig  # noqa: E402
from splatt3r_slam_tpu.models.checkpoint import convert_state_dict  # noqa: E402

H, W = 384, 512  # production 512-long-side landscape
GOLD = pathlib.Path(__file__).parent / "goldens" / "reference_parity_full.npz"

HEAD_KEYS = ("pts3d", "conf", "desc", "desc_conf", "scales", "rotations",
             "sh", "opacities", "means")


def _build_torch_model():
    import torch
    from mast3r.model import AsymmetricMASt3R

    torch.manual_seed(0)
    tm = AsymmetricMASt3R(
        pos_embed="RoPE100", patch_embed_cls="ManyAR_PatchEmbed",
        img_size=(512, 512), head_type="gaussian_head",
        output_mode="pts3d+gaussian+desc24",
        depth_mode=("exp", -float("inf"), float("inf")),
        conf_mode=("exp", 1, float("inf")),
        enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
        dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
        two_confs=True, use_offsets=True, sh_degree=1,
    )
    tm.eval()
    return tm


def _inputs():
    rng = np.random.default_rng(42)
    # smooth low-frequency images (closer to ImgNorm statistics than white
    # noise; exercises the DPT convs with realistic spatial correlation)
    def smooth(seed):
        r = np.random.default_rng(seed)
        base = r.normal(size=(1, H // 16, W // 16, 3)).astype(np.float32)
        img = np.kron(base, np.ones((1, 16, 16, 1), np.float32))
        img += 0.1 * r.normal(size=(1, H, W, 3)).astype(np.float32)
        return np.clip(img, -1.0, 1.0)

    return smooth(1), smooth(2)


def _fingerprint(sd):
    h = hashlib.sha256()
    for k in sorted(sd)[::37]:  # sample of param tensors
        h.update(k.encode())
        h.update(np.ascontiguousarray(sd[k]).tobytes()[:4096])
    h.update(str((H, W)).encode())
    return h.hexdigest()[:16]


def _torch_stages(tm, img1, img2):
    """Encoder feats, decoder hook tokens, and all head outputs — computed
    the way `AsymmetricCroCo3DStereo.forward` does (model.py:180-207) but
    without re-running the encoder."""
    import torch

    def t(img):
        return torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))

    shape = torch.tensor([[H, W]])
    with torch.no_grad():
        f1, p1, _ = tm._encode_image(t(img1), shape)
        f2, p2, _ = tm._encode_image(t(img2), shape)
        d1, d2 = tm._decoder(f1, p1, f2, p2)
        r1 = tm._downstream_head(1, [tok.float() for tok in d1], shape)
        r2 = tm._downstream_head(2, [tok.float() for tok in d2], shape)

    out = {"enc1": f1.numpy(), "enc2": f2.numpy()}
    for vi, hooks in (("1", d1), ("2", d2)):
        for hi in (0, 6, 9, 12):
            out[f"hook{vi}_{hi}"] = hooks[hi].float().numpy()
    for vi, r in (("1", r1), ("2", r2)):
        r = {k.replace("_in_other_view", ""): v for k, v in r.items()}
        for k in HEAD_KEYS:
            out[f"head{vi}_{k}"] = r[k].numpy()
    return out


@pytest.fixture(scope="module")
def full():
    tm = _build_torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fp = _fingerprint(sd)
    img1, img2 = _inputs()

    golden = None
    if GOLD.exists():
        z = np.load(GOLD, allow_pickle=False)
        if str(z["fingerprint"]) == fp:
            golden = {k: z[k] for k in z.files if k != "fingerprint"}
    if golden is None:
        golden = _torch_stages(tm, img1, img2)
        GOLD.parent.mkdir(exist_ok=True)
        np.savez(GOLD, fingerprint=np.str_(fp), **golden)
    del tm

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32",
                        use_offsets=True, sh_degree=1)
    params = convert_state_dict(sd, cfg)
    del sd
    jm = Splatt3RModel(cfg)
    return jm, params, img1, img2, golden


@pytest.fixture(scope="module")
def flax_stages(full):
    jm, params, img1, img2, golden = full
    jf1, jp1 = jm.apply({"params": params}, jnp.asarray(img1),
                        method=jm.encode)
    jf2, jp2 = jm.apply({"params": params}, jnp.asarray(img2),
                        method=jm.encode)
    jd1, jd2 = jm.apply({"params": params}, jf1, jp1, jf2, jp2,
                        method=jm.decode)
    jr1, jr2 = jm.apply({"params": params}, jnp.asarray(img1),
                        jnp.asarray(img2))
    return {
        "enc": (np.asarray(jf1), np.asarray(jf2)),
        "hooks": ([np.asarray(x) for x in jd1],
                  [np.asarray(x) for x in jd2]),
        "heads": (jr1, jr2),
    }


def test_encoder_parity_full(full, flax_stages):
    _, _, _, _, golden = full
    for feat, key in zip(flax_stages["enc"], ("enc1", "enc2")):
        np.testing.assert_allclose(feat, golden[key], rtol=1e-3, atol=2e-4)


def test_decoder_parity_full(full, flax_stages):
    _, _, _, _, golden = full
    for vi, hooks in zip(("1", "2"), flax_stages["hooks"]):
        for jt, hi in zip(hooks, (0, 6, 9, 12)):
            np.testing.assert_allclose(
                jt, golden[f"hook{vi}_{hi}"], rtol=1e-3, atol=5e-4,
                err_msg=f"view {vi} hook {hi}")


# per-output absolute tolerances at production dims (fp32, highest
# matmul precision); measured max_abs_diff is recorded in PARITY.md
_ATOL = {
    "pts3d": 5e-3, "conf": 5e-3, "desc": 2e-3, "desc_conf": 5e-3,
    "scales": 1e-4, "rotations": 1e-3, "sh": 2e-3, "opacities": 1e-3,
    "means": 5e-3,
}


@pytest.mark.parametrize("key", HEAD_KEYS)
def test_head_parity_full(full, flax_stages, key):
    _, _, _, _, golden = full
    for vi, jr in zip(("1", "2"), flax_stages["heads"]):
        g = golden[f"head{vi}_{key}"]
        j = np.asarray(jr[key]).reshape(g.shape)
        np.testing.assert_allclose(j, g, rtol=2e-3, atol=_ATOL[key],
                                   err_msg=f"view {vi} {key}")
