"""Stage-wise parity against the ACTUAL vendored reference model.

Instantiates the real `AsymmetricMASt3R` from /root/reference (torch,
CPU, tiny transformer dims but full-size heads), converts its randomly
initialized state_dict through `models/checkpoint.py`, and compares the
flax port stage by stage: encoder tokens, decoder hook tokens, and every
head output. This catches any shared misreading a hand-written oracle
would miss (RoPE table layout, DPT act_postprocess, postprocess modes).

Reference call surface: `dust3r/dust3r/model.py:121-207`,
`mast3r/catmlp_dpt_head.py:140-328`.
"""

import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/splatt3r_core/src/mast3r_src")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not available")

for p in (REF, REF / "dust3r", REF / "dust3r" / "croco"):
    if str(p) not in sys.path:
        sys.path.insert(0, str(p))

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig  # noqa: E402
from splatt3r_slam_tpu.models.checkpoint import convert_state_dict  # noqa: E402

H, W = 32, 48


@pytest.fixture(scope="module")
def pair():
    from mast3r.model import AsymmetricMASt3R

    torch.manual_seed(0)
    tm = AsymmetricMASt3R(
        pos_embed="RoPE100", patch_embed_cls="ManyAR_PatchEmbed",
        img_size=(64, 64), head_type="gaussian_head",
        output_mode="pts3d+gaussian+desc24",
        depth_mode=("exp", -float("inf"), float("inf")),
        conf_mode=("exp", 1, float("inf")),
        enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        two_confs=True, use_offsets=False, sh_degree=1,
    )
    tm.eval()

    cfg = TwoViewConfig(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        dtype="float32", head_dtype="float32",
    )
    jm = Splatt3RModel(cfg)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.5
    return tm, jm, params, img


def _t_img(img):
    return torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))


def test_encoder_parity(pair):
    tm, jm, params, img = pair
    with torch.no_grad():
        tfeat, tpos, _ = tm._encode_image(
            _t_img(img), torch.tensor([[H, W]])
        )
    jfeat, jpos = jm.apply({"params": params}, jnp.asarray(img),
                           method=jm.encode)
    np.testing.assert_allclose(np.asarray(jfeat), tfeat.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(jpos), tpos.numpy())


def test_decoder_parity(pair):
    tm, jm, params, img = pair
    img2 = img[:, :, ::-1].copy()
    with torch.no_grad():
        tf1, tp1, _ = tm._encode_image(_t_img(img), torch.tensor([[H, W]]))
        tf2, tp2, _ = tm._encode_image(_t_img(img2), torch.tensor([[H, W]]))
        td1, td2 = tm._decoder(tf1, tp1, tf2, tp2)
    jf1, jp1 = jm.apply({"params": params}, jnp.asarray(img),
                        method=jm.encode)
    jf2, jp2 = jm.apply({"params": params}, jnp.asarray(img2),
                        method=jm.encode)
    jd1, jd2 = jm.apply({"params": params}, jf1, jp1, jf2, jp2,
                        method=jm.decode)
    # reference keeps [enc, d1..d12]; flax port keeps the DPT hooks
    # [enc, d6, d9, d12·LN] (catmlp_dpt_head.py:297 hooks [0, 6, 9, 12])
    for jhooks, thooks in ((jd1, td1), (jd2, td2)):
        for jt, ti in zip(jhooks, (0, 6, 9, 12)):
            tt = thooks[ti].float().numpy()
            np.testing.assert_allclose(np.asarray(jt), tt,
                                       rtol=3e-4, atol=3e-5)


def test_full_forward_parity(pair):
    tm, jm, params, img = pair
    img2 = img[:, :, ::-1].copy()
    shape = torch.tensor([[H, W]])
    view1 = {"img": _t_img(img), "true_shape": shape, "instance": ["0"]}
    view2 = {"img": _t_img(img2), "true_shape": shape, "instance": ["1"]}
    with torch.no_grad():
        tr1, tr2 = tm(view1, view2)
    jr1, jr2 = jm.apply({"params": params}, jnp.asarray(img),
                        jnp.asarray(img2))

    def cmp(jr, tr):
        # view-2 outputs use the *_in_other_view naming in the reference
        t_pts = tr.get("pts3d", tr.get("pts3d_in_other_view"))
        t_means = tr.get("means", tr.get("means_in_other_view"))
        np.testing.assert_allclose(np.asarray(jr["pts3d"]),
                                   t_pts.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jr["conf"]),
                                   tr["conf"].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jr["desc"]),
                                   tr["desc"].numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(jr["desc_conf"]),
                                   tr["desc_conf"].numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jr["scales"]),
                                   tr["scales"].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jr["rotations"]),
                                   tr["rotations"].numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(jr["sh"]).reshape(tr["sh"].shape),
            tr["sh"].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jr["opacities"]),
                                   tr["opacities"].numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jr["means"]),
                                   t_means.numpy(), rtol=1e-3, atol=1e-4)

    cmp(jr1, tr1)
    cmp(jr2, tr2)


def test_portrait_forward_parity(pair):
    """Portrait protocol parity: the reference feeds a landscape-layout
    tensor with a portrait true_shape (ManyAR computes tokens/RoPE at the
    TRUE portrait orientation and transpose_to_landscape maps dense
    outputs back to the batch layout). The flax port runs the portrait
    image directly at its true orientation — outputs must agree after
    layout transposition."""
    tm, jm, params, img = pair
    shape = torch.tensor([[W, H]])  # true portrait (h=W=48, w=H=32)
    view1 = {"img": _t_img(img), "true_shape": shape, "instance": ["0"]}
    view2 = {"img": _t_img(img), "true_shape": shape, "instance": ["1"]}
    with torch.no_grad():
        tr1, _ = tm(view1, view2)
    imgp = np.transpose(img, (0, 2, 1, 3)).copy()  # (1, 48, 32, 3)
    jr1, _ = jm.apply({"params": params}, jnp.asarray(imgp),
                      jnp.asarray(imgp))
    jpts = np.transpose(np.asarray(jr1["pts3d"]), (0, 2, 1, 3))
    np.testing.assert_allclose(jpts, tr1["pts3d"].numpy(),
                               rtol=1e-3, atol=2e-3)
    jsc = np.transpose(np.asarray(jr1["scales"]), (0, 2, 1, 3))
    np.testing.assert_allclose(jsc, tr1["scales"].numpy(),
                               rtol=1e-3, atol=1e-5)
