"""Independent torch implementation of the two-view architecture, used as a
conversion/parity oracle in tests.

This is test-only code, written from the architecture spec (SURVEY.md §2d):
ViT encoder with RoPE2D, dual cross-attention decoder, DPT heads, Gaussian
activations. Its state-dict key naming intentionally matches the reference
release checkpoints (enc_blocks.*, dec_blocks.*, downstream_head1.* ...) so
that `checkpoint.convert_state_dict` can be exercised without the real
multi-GB weights.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Rope2D:
    def __init__(self, freq=100.0):
        self.freq = freq

    def __call__(self, tokens, positions):
        # tokens (B, H, N, D); positions (B, N, 2)
        D = tokens.shape[-1] // 2
        max_pos = int(positions.max()) + 1
        inv_freq = 1.0 / (
            self.freq ** (torch.arange(0, D, 2).float() / D)
        )
        t = torch.arange(max_pos).float()
        freqs = torch.einsum("i,j->ij", t, inv_freq)
        freqs = torch.cat((freqs, freqs), dim=-1)
        cos, sin = freqs.cos(), freqs.sin()

        def rot_half(x):
            x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2 :]
            return torch.cat((-x2, x1), dim=-1)

        def rope1d(tok, pos1d):
            c = F.embedding(pos1d, cos)[:, None, :, :]
            s = F.embedding(pos1d, sin)[:, None, :, :]
            return tok * c + rot_half(tok) * s

        y, x = tokens.chunk(2, dim=-1)
        y = rope1d(y, positions[:, :, 0])
        x = rope1d(x, positions[:, :, 1])
        return torch.cat((y, x), dim=-1)


class Attn(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.h = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, x, xpos):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, C // self.h).transpose(1, 3)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = self.rope(q, xpos)
        k = self.rope(k, xpos)
        a = (q @ k.transpose(-2, -1)) * self.scale
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, N, C))


class XAttn(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.h = heads
        self.scale = (dim // heads) ** -0.5
        self.projq = nn.Linear(dim, dim, bias=True)
        self.projk = nn.Linear(dim, dim, bias=True)
        self.projv = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, q_in, k_in, v_in, qpos, kpos):
        B, Nq, C = q_in.shape
        Nk = k_in.shape[1]
        q = self.projq(q_in).reshape(B, Nq, self.h, C // self.h).permute(0, 2, 1, 3)
        k = self.projk(k_in).reshape(B, Nk, self.h, C // self.h).permute(0, 2, 1, 3)
        v = self.projv(v_in).reshape(B, Nk, self.h, C // self.h).permute(0, 2, 1, 3)
        q = self.rope(q, qpos)
        k = self.rope(k, kpos)
        a = (q @ k.transpose(-2, -1)) * self.scale
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, Nq, C))


def mlp(dim):
    return nn.Sequential()  # placeholder, replaced below


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


LN = lambda d: nn.LayerNorm(d, eps=1e-6)  # noqa: E731


class EncBlock(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.norm1 = LN(dim)
        self.attn = Attn(dim, heads, rope)
        self.norm2 = LN(dim)
        self.mlp = Mlp(dim, dim * 4)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        x = x + self.mlp(self.norm2(x))
        return x


class DecBlock(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.norm1 = LN(dim)
        self.attn = Attn(dim, heads, rope)
        self.cross_attn = XAttn(dim, heads, rope)
        self.norm2 = LN(dim)
        self.norm3 = LN(dim)
        self.norm_y = LN(dim)
        self.mlp = Mlp(dim, dim * 4)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)
        x = x + self.mlp(self.norm3(x))
        return x


class RCU(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class Fusion(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = RCU(f)
        self.resConfUnit2 = RCU(f)
        self.out_conv = nn.Conv2d(f, f, 1)

    def forward(self, x, res=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class Scratch(nn.Module):
    def __init__(self, dims, f):
        super().__init__()
        for k in range(4):
            setattr(self, f"layer{k + 1}_rn",
                    nn.Conv2d(dims[k], f, 3, padding=1, bias=False))
        for k in range(1, 5):
            setattr(self, f"refinenet{k}", Fusion(f))


class DPTOracle(nn.Module):
    def __init__(self, num_ch, dim_tokens=(64, 48, 48, 48),
                 layer_dims=(96, 192, 384, 768), f=256, last=128, patch=16):
        super().__init__()
        self.patch = patch
        self.act_postprocess = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Conv2d(dim_tokens[0], layer_dims[0], 1),
                    nn.ConvTranspose2d(layer_dims[0], layer_dims[0], 4, 4),
                ),
                nn.Sequential(
                    nn.Conv2d(dim_tokens[1], layer_dims[1], 1),
                    nn.ConvTranspose2d(layer_dims[1], layer_dims[1], 2, 2),
                ),
                nn.Sequential(nn.Conv2d(dim_tokens[2], layer_dims[2], 1)),
                nn.Sequential(
                    nn.Conv2d(dim_tokens[3], layer_dims[3], 1),
                    nn.Conv2d(layer_dims[3], layer_dims[3], 3, 2, 1),
                ),
            ]
        )
        self.scratch = Scratch(layer_dims, f)
        self.head = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, padding=1),
            nn.Identity(),  # Interpolate handled in forward
            nn.Conv2d(f // 2, last, 3, padding=1),
            nn.ReLU(True),
            nn.Conv2d(last, num_ch, 1),
        )

    def forward(self, tokens, image_size):
        H, W = image_size
        nh, nw = H // self.patch, W // self.patch
        layers = [
            t.transpose(-1, -2).reshape(t.shape[0], t.shape[-1], nh, nw)
            for t in tokens
        ]
        layers = [self.act_postprocess[i](l) for i, l in enumerate(layers)]
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(l)
              for i, l in enumerate(layers)]
        p4 = self.scratch.refinenet4(rn[3])[:, :, : rn[2].shape[2], : rn[2].shape[3]]
        p3 = self.scratch.refinenet3(p4, rn[2])
        p2 = self.scratch.refinenet2(p3, rn[1])
        p1 = self.scratch.refinenet1(p2, rn[0])
        x = self.head[0](p1)
        x = F.interpolate(x, size=(H, W), mode="bilinear", align_corners=True)
        x = self.head[4](F.relu(self.head[2](x)))
        return x


class HLF(nn.Module):
    def __init__(self, idim, odim):
        super().__init__()
        self.fc1 = nn.Linear(idim, 4 * idim)
        self.fc2 = nn.Linear(4 * idim, odim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class GHeadOracle(nn.Module):
    def __init__(self, enc_dim, dec_dim, patch=16, local=24, sh_degree=1,
                 layer_dims=(8, 12, 16, 24), f=16, last=16):
        super().__init__()
        self.patch = patch
        self.local = local
        self.sh_degree = sh_degree
        dt = (enc_dim, dec_dim, dec_dim, dec_dim)
        self.dpt = DPTOracle(4, dt, layer_dims=layer_dims, f=f, last=last,
                             patch=patch)
        self.head_local_features = HLF(enc_dim + dec_dim,
                                       (local + 1) * patch * patch)

        class GDPTWrap(nn.Module):
            def __init__(self, inner):
                super().__init__()
                self.dpt = inner

        self.gaussian_dpt = GDPTWrap(
            DPTOracle(3 + 3 + 4 + 3 * sh_degree + 1, dt,
                      layer_dims=layer_dims, f=f, last=last, patch=patch)
        )

    def forward(self, tokens, image_size):
        H, W = image_size
        pts = self.dpt(tokens, image_size)
        cat = torch.cat([tokens[0], tokens[-1]], dim=-1)
        lf = self.head_local_features(cat)
        B = lf.shape[0]
        lf = lf.transpose(-1, -2).reshape(B, -1, H // self.patch, W // self.patch)
        lf = F.pixel_shuffle(lf, self.patch)
        g = self.gaussian_dpt.dpt(tokens, image_size)
        fmap = torch.cat([pts, lf, g], dim=1).permute(0, 2, 3, 1)  # B,H,W,D

        d = self.local
        pts3d, conf, desc, dconf, off, sc, rot, sh, opa = torch.split(
            fmap, [3, 1, d, 1, 3, 3, 4, 3 * self.sh_degree, 1], dim=-1
        )
        n = pts3d.norm(dim=-1, keepdim=True)
        pts3d = pts3d / n.clamp(min=1e-8) * torch.expm1(n)
        res = {
            "pts3d": pts3d,
            "conf": 1 + conf[..., 0].exp(),
            "desc": desc / desc.norm(dim=-1, keepdim=True),
            "desc_conf": 1 + dconf[..., 0].exp(),
            "scales": sc.exp(),
            "rotations": rot / (rot.norm(dim=-1, keepdim=True) + 1e-8),
            "sh": sh.reshape(*sh.shape[:-1], 3, self.sh_degree),
            "opacities": opa.sigmoid(),
            "means": pts3d,
        }
        return res


class TwoViewOracle(nn.Module):
    def __init__(self, enc_dim=64, enc_depth=2, enc_heads=2, dec_dim=48,
                 dec_depth=12, dec_heads=2, patch=16):
        super().__init__()
        rope = Rope2D(100.0)
        self.patch = patch

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, enc_dim, patch, patch)

        self.patch_embed = PE()
        self.enc_blocks = nn.ModuleList(
            [EncBlock(enc_dim, enc_heads, rope) for _ in range(enc_depth)]
        )
        self.enc_norm = LN(enc_dim)
        self.decoder_embed = nn.Linear(enc_dim, dec_dim)
        self.dec_blocks = nn.ModuleList(
            [DecBlock(dec_dim, dec_heads, rope) for _ in range(dec_depth)]
        )
        self.dec_blocks2 = nn.ModuleList(
            [DecBlock(dec_dim, dec_heads, rope) for _ in range(dec_depth)]
        )
        self.dec_norm = LN(dec_dim)
        self.downstream_head1 = GHeadOracle(enc_dim, dec_dim, patch)
        self.downstream_head2 = GHeadOracle(enc_dim, dec_dim, patch)
        self.dec_depth = dec_depth

    def encode(self, img):
        B, C, H, W = img.shape
        x = self.patch_embed.proj(img)
        gh, gw = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        yy, xx = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
        pos = torch.stack([yy, xx], dim=-1).reshape(1, -1, 2).repeat(B, 1, 1)
        for b in self.enc_blocks:
            x = b(x, pos)
        return self.enc_norm(x), pos

    def forward(self, img1, img2):
        H, W = img1.shape[-2:]
        f1, p1 = self.encode(img1)
        f2, p2 = self.encode(img2)
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        outs1, outs2 = [f1], [f2]
        for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
            nx1 = b1(x1, x2, p1, p2)
            nx2 = b2(x2, x1, p2, p1)
            x1, x2 = nx1, nx2
            outs1.append(x1)
            outs2.append(x2)
        outs1[-1] = self.dec_norm(outs1[-1])
        outs2[-1] = self.dec_norm(outs2[-1])
        l2 = self.dec_depth
        hooks = [0, l2 * 2 // 4, l2 * 3 // 4, l2]
        t1 = [outs1[h] for h in hooks]
        t2 = [outs2[h] for h in hooks]
        r1 = self.downstream_head1(t1, (H, W))
        r2 = self.downstream_head2(t2, (H, W))
        return r1, r2
