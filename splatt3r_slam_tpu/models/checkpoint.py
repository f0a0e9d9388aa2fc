"""Torch checkpoint → flax params conversion.

Loads the reference's weights (MASt3R ViT-L backbone `.pth` and/or the
Splatt3R Lightning `.ckpt`, spec: `splatt3r_slam/splatt3r_utils.py:31-66`,
README "Checkpoint") into this framework's parameter pytree.

Conventions converted:
- torch Linear weight (out, in)            → flax Dense kernel (in, out)
- torch LayerNorm weight/bias              → flax scale/bias
- torch Conv2d weight (O, I, kh, kw)       → flax Conv kernel (kh, kw, I, O)
- torch ConvTranspose2d weight (I,O,kh,kw) → flax ConvTranspose kernel
  (kh, kw, O, I) with transpose_kernel=True
- missing dec_blocks2 duplicated from dec_blocks
  (spec: `dust3r/dust3r/model.py:84-91`)

The map is explicit (structure-driven, not regex-scraped) so a missing or
mis-shaped tensor fails loudly at load time.
"""

from __future__ import annotations

import numpy as np

from splatt3r_slam_tpu.models.two_view import TwoViewConfig


def _lin(t):  # torch Linear → Dense
    return {"kernel": np.ascontiguousarray(t["weight"].T),
            "bias": np.ascontiguousarray(t["bias"])}


def _ln(t):
    return {"scale": np.ascontiguousarray(t["weight"]),
            "bias": np.ascontiguousarray(t["bias"])}


def _conv(t, bias=True):
    out = {"kernel": np.ascontiguousarray(np.transpose(t["weight"], (2, 3, 1, 0)))}
    if bias:
        out["bias"] = np.ascontiguousarray(t["bias"])
    return out


def _convT(t):
    out = {"kernel": np.ascontiguousarray(np.transpose(t["weight"], (2, 3, 1, 0)))}
    out["bias"] = np.ascontiguousarray(t["bias"])
    return out


class _SD:
    """State-dict view with prefix access + consumption tracking."""

    def __init__(self, sd):
        self.sd = sd
        self.used = set()

    def sub(self, prefix):
        out = {}
        for k, v in self.sd.items():
            if k.startswith(prefix + "."):
                out[k[len(prefix) + 1 :]] = v
                self.used.add(k)
        if not out:
            raise KeyError(f"no tensors under prefix '{prefix}'")
        return out


def _pick(t, *names):
    """First present sub-dict among alternative torch namings."""
    for n in names:
        d = {k[len(n) + 1 :]: v for k, v in t.items() if k.startswith(n + ".")}
        if d:
            return d
    raise KeyError(f"none of {names} found among {sorted(set(k.split('.')[0] for k in t))}")


def _attn(t):
    return {"qkv": _lin(_pick(t, "qkv")), "proj": _lin(_pick(t, "proj"))}


def _xattn(t):
    return {
        "projq": _lin(_pick(t, "projq")),
        "projk": _lin(_pick(t, "projk")),
        "projv": _lin(_pick(t, "projv")),
        "proj": _lin(_pick(t, "proj")),
    }


def _mlp(t):
    return {"fc1": _lin(_pick(t, "fc1")), "fc2": _lin(_pick(t, "fc2"))}


def _enc_block(t):
    return {
        "norm1": _ln(_pick(t, "norm1")),
        "attn": _attn(_pick(t, "attn")),
        "norm2": _ln(_pick(t, "norm2")),
        "mlp": _mlp(_pick(t, "mlp")),
    }


def _dec_block(t):
    return {
        "norm1": _ln(_pick(t, "norm1")),
        "attn": _attn(_pick(t, "attn")),
        "cross_attn": _xattn(_pick(t, "cross_attn")),
        "norm2": _ln(_pick(t, "norm2")),
        "norm3": _ln(_pick(t, "norm3")),
        "norm_y": _ln(_pick(t, "norm_y")),
        "mlp": _mlp(_pick(t, "mlp")),
    }


def _rcu(t):
    return {"conv1": _conv(_pick(t, "conv1")), "conv2": _conv(_pick(t, "conv2"))}


def _dpt(t):
    """DPTOutputAdapter_fix state (under '...dpt.')."""
    ap = _pick(t, "act_postprocess")
    scratch = _pick(t, "scratch")
    head = _pick(t, "head")
    out = {
        "act_0_conv": _conv(_pick(ap, "0.0")),
        "act_0_deconv": _convT(_pick(ap, "0.1")),
        "act_1_conv": _conv(_pick(ap, "1.0")),
        "act_1_deconv": _convT(_pick(ap, "1.1")),
        "act_2_conv": _conv(_pick(ap, "2.0")),
        "act_3_conv": _conv(_pick(ap, "3.0")),
        "act_3_down": _conv(_pick(ap, "3.1")),
        "head_0": _conv(_pick(head, "0")),
        "head_2": _conv(_pick(head, "2")),
        "head_4": _conv(_pick(head, "4")),
    }
    for k in range(1, 5):
        out[f"layer_{k}_rn"] = _conv(
            _pick(scratch, f"layer{k}_rn", f"layer_rn.{k - 1}"), bias=False
        )
    for k in range(1, 5):
        rf = _pick(scratch, f"refinenet{k}")
        out[f"refinenet{k}"] = {
            "resConfUnit1": _rcu(_pick(rf, "resConfUnit1")),
            "resConfUnit2": _rcu(_pick(rf, "resConfUnit2")),
            "out_conv": _conv(_pick(rf, "out_conv")),
        }
    return out


def _gaussian_head(t):
    out = {
        "dpt": _dpt(_pick(t, "dpt")),
        "hlf_fc1": _lin(_pick(_pick(t, "head_local_features"), "fc1")),
        "hlf_fc2": _lin(_pick(_pick(t, "head_local_features"), "fc2")),
    }
    gdpt = _pick(t, "gaussian_dpt")
    out["gaussian_dpt"] = _dpt(_pick(gdpt, "dpt"))
    return out


def convert_state_dict(sd: dict, cfg: TwoViewConfig) -> dict:
    """Torch state dict (AsymmetricMASt3R naming) → flax params tree.

    `sd` values must be numpy arrays (call `.numpy()` upstream).
    """
    if not any(k.startswith("dec_blocks2") for k in sd):
        sd = dict(sd)
        for k, v in list(sd.items()):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = v

    S = _SD(sd)
    params = {
        "patch_embed": {"proj": _conv(S.sub("patch_embed.proj"))},
        "enc_norm": _ln(S.sub("enc_norm")),
        "decoder_embed": _lin(S.sub("decoder_embed")),
        "dec_norm": _ln(S.sub("dec_norm")),
    }
    # transformer blocks are scanned with depth-stacked params: stack the
    # per-block trees along a new leading axis
    enc = [_enc_block(S.sub(f"enc_blocks.{i}")) for i in range(cfg.enc_depth)]
    params["enc_blocks"] = {"block": _stack_trees(enc)}
    dec1 = [_dec_block(S.sub(f"dec_blocks.{i}")) for i in range(cfg.dec_depth)]
    dec2 = [_dec_block(S.sub(f"dec_blocks2.{i}"))
            for i in range(cfg.dec_depth)]
    params["dec_blocks"] = {"blk1": _stack_trees(dec1),
                            "blk2": _stack_trees(dec2)}
    params["head1"] = _gaussian_head(S.sub("downstream_head1"))
    params["head2"] = _gaussian_head(S.sub("downstream_head2"))
    return params


def _stack_trees(trees: list) -> dict:
    """Stack a list of identical nested dicts of arrays along axis 0."""
    out = {}
    for k, v in trees[0].items():
        if isinstance(v, dict):
            out[k] = _stack_trees([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees])
    return out


def load_torch_file(path: str) -> dict:
    """Load a torch .pth/.ckpt on CPU → flat numpy state dict.

    Handles: raw state dicts, {'model': sd} (MASt3R releases), and
    Lightning {'state_dict': {'encoder.<k>': ...}} (Splatt3R .ckpt).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    elif isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            k = k[len("encoder.") :]
        if not hasattr(v, "numpy"):
            continue
        out[k] = v.detach().to(torch.float32).numpy()
    return out


HF_REPO = "brandonsmart/splatt3r_v1.0"
HF_CKPT = "epoch=19-step=1200.ckpt"


def resolve_checkpoint(path: str | None = None) -> str:
    """Resolve a Splatt3R checkpoint path like the reference does
    (`splatt3r_slam/splatt3r_utils.py:30-65`): explicit path > local
    `checkpoints/<ckpt>` next to the repo root > HuggingFace Hub download.
    Raises FileNotFoundError with guidance if all three fail (e.g. no
    network egress)."""
    import os

    if path is not None:
        return path
    local = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "checkpoints", HF_CKPT,
    )
    if os.path.exists(local):
        return local
    try:
        from huggingface_hub import hf_hub_download

        return hf_hub_download(repo_id=HF_REPO, filename=HF_CKPT)
    except Exception as e:
        raise FileNotFoundError(
            f"no checkpoint at {local} and HF download failed ({e}); "
            f"place {HF_CKPT} under checkpoints/ or pass an explicit path"
        ) from e


def load_splatt3r_params(path: str | None, cfg: TwoViewConfig) -> dict:
    """Load + convert a Splatt3R/MASt3R checkpoint into flax params.

    `path=None` resolves via local-checkpoints-then-HF-Hub, matching the
    reference's `load_splatt3r` (`splatt3r_utils.py:30-65`)."""
    return convert_state_dict(load_torch_file(resolve_checkpoint(path)), cfg)
