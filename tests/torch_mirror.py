"""Torch mirrors of the reference network structure (plain torch.nn, no MONAI).

Submodule names replicate the reference classes exactly
(`/root/reference/medical_diffusion/models/utils/conv_blocks.py`,
`attention_blocks.py`, `estimators/unet2.py`, `embedders/*`,
`latent_embedders.py`) so that ``load_state_dict(..., strict=True)`` over a
state_dict exported by ``medfusion_tpu.utils.torch_compat.to_torch_state_dict``
verifies BOTH the key naming and the tensor layouts, and the forward pass then
verifies the composed numerics. NCHW here; tests transpose at the boundary.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _pad(k, s):
    return (k - s + 1) // 2


class BasicBlock(nn.Module):
    """conv_blocks.py:134-192."""

    def __init__(self, cin, cout, k=3, s=1, norm_groups=None, act=False, zero=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, _pad(k, s))
        if zero:
            nn.init.zeros_(self.conv.weight)
            nn.init.zeros_(self.conv.bias)
        if norm_groups:
            self.norm = nn.GroupNorm(norm_groups, cout)
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if hasattr(self, "norm"):
            x = self.norm(x)
        if self.act:
            x = F.silu(x)
        return x


class BasicResBlock(nn.Module):
    """conv_blocks.py:194-240."""

    def __init__(self, cin, cout, k=3, s=1, norm_groups=None, act=False, zero=False):
        super().__init__()
        self.basic_block = BasicBlock(cin, cout, k, s, norm_groups, act, zero)
        self.conv_res = (nn.Conv2d(cin, cout, 1, s, _pad(1, s))
                         if cin != cout else nn.Identity())

    def forward(self, x):
        return self.basic_block(x) + self.conv_res(x)


class UnetResBlock(nn.Module):
    """conv_blocks.py:305-364 (res variant; emb added after all but last)."""

    def __init__(self, cin, cout, k=3, s=1, norm_groups=8, emb_dim=None, blocks=2):
        super().__init__()
        self.block_seq = nn.ModuleList([
            BasicResBlock(cin if i == 0 else cout, cout, k, s, norm_groups,
                          act=True, zero=(i == blocks - 1))
            for i in range(blocks)
        ])
        if emb_dim is not None:
            self.local_embedder = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, cout))

    def forward(self, x, emb=None):
        e = None
        if emb is not None and hasattr(self, "local_embedder"):
            e = self.local_embedder(emb)[:, :, None, None]
        n = len(self.block_seq)
        for i, blk in enumerate(self.block_seq):
            x = blk(x)
            if e is not None and i < n - 1:
                x = x + e
        return x


class BasicDown(nn.Module):
    """conv_blocks.py:28-70 (learnable)."""

    def __init__(self, cin, cout, k=3, s=2):
        super().__init__()
        self.down_op = nn.Conv2d(cin, cout, k, s, _pad(k, s))

    def forward(self, x, emb=None):
        return self.down_op(x)


class BasicUp(nn.Module):
    """conv_blocks.py:72-131 (learnable: nearest-exact resize + 3x3 conv)."""

    def __init__(self, cin, cout, k=2, s=2):
        super().__init__()
        self.k, self.s = k, s
        self.up_op = nn.Conv2d(cin, cout, 3, 1, 1)

    def forward(self, x, emb=None):
        new_size = [(sz - 1) * self.s + self.k - 2 * _pad(self.k, self.s)
                    for sz in x.shape[2:]]
        return self.up_op(F.interpolate(x, size=new_size, mode="nearest-exact"))


class DownBlock(nn.Module):
    """conv_blocks.py:368-441, attention='none'."""

    def __init__(self, cin, cout, k, s, norm_groups, emb_dim=None):
        super().__init__()
        self.down_op = BasicDown(cin, cout, k, s)
        self.conv_block = UnetResBlock(cout, cout, k, 1, norm_groups, emb_dim)

    def forward(self, x, emb=None):
        return self.conv_block(self.down_op(x), emb)


class UpBlock(nn.Module):
    """conv_blocks.py:444-528, attention='none', additive skip (learnable)."""

    def __init__(self, cin, cout, k, s, norm_groups, emb_dim=None):
        super().__init__()
        self.up_op = BasicUp(cin, cout, s, s)
        self.conv_block = UnetResBlock(cout, cout, k, 1, norm_groups, emb_dim)

    def forward(self, x_enc, x_skip=None, emb=None):
        x = self.up_op(x_enc)
        if x_skip is not None:
            x = x + x_skip
        return self.conv_block(x, emb)


class DiagonalGaussian(nn.Module):
    def forward(self, x, sample=False):
        mean, logvar = torch.chunk(x, 2, dim=1)
        return mean  # deterministic path for parity


class VAE(nn.Module):
    """latent_embedders.py:620-855 (attention 'none', deterministic z)."""

    def __init__(self, cin=1, emb_ch=2, hid=(4, 8, 16), norm_groups=2, ds=1):
        super().__init__()
        self.inc = UnetResBlock(cin, hid[0], 3, 1, norm_groups)
        self.encoders = nn.ModuleList([
            DownBlock(hid[i - 1], hid[i], 3, 2, norm_groups)
            for i in range(1, len(hid))
        ])
        self.out_enc = nn.Sequential(
            BasicBlock(hid[-1], 2 * emb_ch, 3),
            BasicBlock(2 * emb_ch, 2 * emb_ch, 1),
        )
        self.quantizer = DiagonalGaussian()
        self.inc_dec = UnetResBlock(emb_ch, hid[-1], 3, 1, norm_groups)
        self.decoders = nn.ModuleList([
            UpBlock(hid[i + 1], hid[i], 3, 2, norm_groups)
            for i in range(len(hid) - 1)
        ])
        self.outc = BasicBlock(hid[0], cin, 1, zero=True)
        self.outc_ver = nn.ModuleList([
            BasicBlock(hid[i], cin, 1, zero=True) for i in range(1, ds + 1)
        ])

    def forward(self, x):
        h = self.inc(x)
        for enc in self.encoders:
            h = enc(h)
        z = self.quantizer(self.out_enc(h))
        out_hor = []
        h = self.inc_dec(z)
        for i in range(len(self.decoders) - 1, -1, -1):
            if i < len(self.outc_ver):
                out_hor.append(self.outc_ver[i](h))
            h = self.decoders[i](h)
        return self.outc(h), out_hor[::-1]


class SinusoidalPosEmb(nn.Module):
    """time_embedder.py:7-28."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        half = self.dim // 2
        exponent = math.log(10000) / (half - 1.0)
        freqs = torch.exp(-exponent * torch.arange(half, dtype=torch.float32))
        emb = t.float()[:, None] * freqs[None]
        return torch.cat([emb.sin(), emb.cos()], dim=-1)


class TimeEmbbeding(nn.Module):
    """time_embedder.py:52-75 (reference spelling kept for key parity)."""

    def __init__(self, emb_dim):
        super().__init__()
        pos_dim = emb_dim // 4
        self.time_emb = nn.Sequential(
            SinusoidalPosEmb(pos_dim),
            nn.Linear(pos_dim, emb_dim),
            nn.SiLU(),
            nn.Linear(emb_dim, emb_dim),
        )

    def forward(self, t):
        return self.time_emb(t)


class LabelEmbedder(nn.Module):
    def __init__(self, emb_dim, num_classes):
        super().__init__()
        self.embedding = nn.Embedding(num_classes, emb_dim)

    def forward(self, c):
        return self.embedding(c)


class SequentialEmb(nn.Sequential):
    def forward(self, x, emb):
        for m in self:
            x = m(x, emb)
        return x


class UnetOutBlock(nn.Module):
    """MONAI UnetOutBlock key structure: outc.conv.conv.weight."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.add_module("conv", nn.Conv2d(cin, cout, 1, 1, 0))
        nn.init.zeros_(self.conv.conv.weight)
        nn.init.zeros_(self.conv.conv.bias)

    def forward(self, x):
        return self.conv(x)


class UNet2(nn.Module):
    """estimators/unet2.py:15-269, attention='none', num_res_blocks=2."""

    def __init__(self, cin=2, cout=2, hid=(8, 16, 32), norm_groups=4,
                 emb_dim=32, num_classes=2, nrb=2, ds=1):
        super().__init__()
        self.nrb = nrb
        self.time_embedder = TimeEmbbeding(emb_dim)
        self.cond_embedder = LabelEmbedder(emb_dim, num_classes)
        self.in_conv = BasicBlock(cin, hid[0], 3, 1)
        depth = len(hid)
        in_blocks = []
        for i in range(1, depth):
            for k in range(nrb):
                in_blocks.append(SequentialEmb(
                    UnetResBlock(hid[i - 1 if k == 0 else i], hid[i], 3, 1,
                                 norm_groups, emb_dim)))
            if i < depth - 1:
                in_blocks.append(BasicDown(hid[i], hid[i], 3, 2))
        self.in_blocks = nn.ModuleList(in_blocks)
        self.middle_block = SequentialEmb(
            UnetResBlock(hid[-1], hid[-1], 3, 1, norm_groups, emb_dim),
            nn.Identity(),
            UnetResBlock(hid[-1], hid[-1], 3, 1, norm_groups, emb_dim),
        )
        out_blocks = []
        for i in range(1, depth):
            for k in range(nrb + 1):
                co = hid[i - 1 if k == 0 else i]
                # index 1 is the (param-free) Attention slot in the reference
                seq = [UnetResBlock(hid[i] + co, co, 3, 1, norm_groups, emb_dim),
                       nn.Identity()]
                if i > 1 and k == 0:
                    seq.append(BasicUp(co, co, 2, 2))
                out_blocks.append(SequentialEmb(*seq))
        self.out_blocks = nn.ModuleList(out_blocks)
        self.outc = UnetOutBlock(hid[0], cout)
        self.outc_ver = nn.ModuleList([
            UnetOutBlock(hid[i] + hid[i - 1], cout) for i in range(2, ds + 2)
        ])

    def forward(self, x_t, t, condition):
        emb = self.time_embedder(t)
        if condition is not None:  # reference save_add semantics (conv_blocks.py:16-18)
            emb = emb + self.cond_embedder(condition)
        x = [self.in_conv(x_t)]
        for blk in self.in_blocks:
            if isinstance(blk, BasicDown):
                x.append(blk(x[-1]))
            else:
                x.append(blk(x[-1], emb))
        h = self.middle_block[0](x[-1], emb)
        h = self.middle_block[2](h, emb)
        y_ver = []
        nrb1 = self.nrb + 1
        for i in range(len(self.out_blocks), 0, -1):
            h = torch.cat([h, x.pop()], dim=1)
            d, j = i // nrb1, i % nrb1 - 1
            if (len(self.outc_ver) >= d > 0) and (j == 0):
                y_ver.append(self.outc_ver[d - 1](h))
            blk = self.out_blocks[i - 1]
            h = blk[0](h, emb)
            if len(blk) > 2:
                h = blk[2](h, emb)
        return self.outc(h), y_ver[::-1]


class LinearTransformer(nn.Module):
    """attention_blocks.py:128-195 — Conv1d q/k/v, double-scaled softmax,
    zero-init out proj, residual iff shapes match. In unet2 the SequentialEmb
    passes the time+label embedding, so this runs as cross-attention over one
    global conditioning token."""

    def __init__(self, cin, cout, heads, ch_head, norm_groups, emb_dim=None):
        super().__init__()
        self.heads, self.scale = heads, ch_head**-0.25
        hid = heads * ch_head
        self.norm_x = nn.GroupNorm(norm_groups, cin)
        kv_dim = emb_dim if emb_dim is not None else cin
        self.to_q = nn.Conv1d(cin, hid, 1)
        self.to_k = nn.Conv1d(kv_dim, hid, 1)
        self.to_v = nn.Conv1d(kv_dim, hid, 1)
        out = nn.Conv1d(hid, cout, 1)
        nn.init.zeros_(out.weight)
        nn.init.zeros_(out.bias)
        self.to_out = nn.Sequential(out, nn.Identity())

    def forward(self, x, embedding=None):
        b, c, *sp = x.shape
        n = int(np.prod(sp)) if sp else 1
        xn = self.norm_x(x).reshape(b, c, n)
        kv = xn if embedding is None else embedding.reshape(b, -1, 1)
        q, k, v = self.to_q(xn), self.to_k(kv), self.to_v(kv)
        d = q.shape[1] // self.heads
        qh = q.reshape(b * self.heads, d, -1)
        kh = k.reshape(b * self.heads, d, -1)
        vh = v.reshape(b * self.heads, d, -1)
        attn = torch.einsum("bdi,bdj->bij", qh * self.scale, kh * self.scale).softmax(-1)
        out = torch.einsum("bij,bdj->bdi", attn, vh).reshape(b, -1, n)
        out = self.to_out(out).reshape(b, -1, *sp)
        return out + x if out.shape == x.shape else out


import numpy as np  # noqa: E402  (used by LinearTransformer)


class AttentionWrap(nn.Module):
    """attention_blocks.py:291-335, attention_type='linear'."""

    def __init__(self, ch, norm_groups, emb_dim):
        super().__init__()
        self.attention = LinearTransformer(ch, ch, 8, ch // 8, norm_groups, emb_dim)

    def forward(self, x, embedding=None):
        return self.attention(x, embedding)


class UNet2Attn(UNet2):
    """UNet2 with linear attention at every level (the SequentialEmb feeds the
    conditioning embedding into each attention block — unet2.py:249-264)."""

    def __init__(self, cin=2, cout=2, hid=(8, 16, 32), norm_groups=4,
                 emb_dim=32, num_classes=2, nrb=2, ds=0):
        super().__init__(cin, cout, hid, norm_groups, emb_dim, num_classes, nrb, ds)
        depth = len(hid)
        # rebuild in/out blocks with Attention at slot 1
        in_blocks = []
        for i in range(1, depth):
            for k in range(nrb):
                in_blocks.append(SequentialEmb(
                    UnetResBlock(hid[i - 1 if k == 0 else i], hid[i], 3, 1,
                                 norm_groups, emb_dim),
                    AttentionWrap(hid[i], norm_groups, emb_dim)))
            if i < depth - 1:
                in_blocks.append(BasicDown(hid[i], hid[i], 3, 2))
        self.in_blocks = nn.ModuleList(in_blocks)
        self.middle_block = SequentialEmb(
            UnetResBlock(hid[-1], hid[-1], 3, 1, norm_groups, emb_dim),
            AttentionWrap(hid[-1], norm_groups, emb_dim),
            UnetResBlock(hid[-1], hid[-1], 3, 1, norm_groups, emb_dim),
        )
        out_blocks = []
        for i in range(1, depth):
            for k in range(nrb + 1):
                co = hid[i - 1 if k == 0 else i]
                seq = [UnetResBlock(hid[i] + co, co, 3, 1, norm_groups, emb_dim),
                       AttentionWrap(co, norm_groups, emb_dim)]
                if i > 1 and k == 0:
                    seq.append(BasicUp(co, co, 2, 2))
                out_blocks.append(SequentialEmb(*seq))
        self.out_blocks = nn.ModuleList(out_blocks)

    def forward(self, x_t, t, condition):
        emb = self.time_embedder(t)
        if condition is not None:  # reference save_add semantics (conv_blocks.py:16-18)
            emb = emb + self.cond_embedder(condition)
        x = [self.in_conv(x_t)]
        for blk in self.in_blocks:
            if isinstance(blk, BasicDown):
                x.append(blk(x[-1]))
            else:
                x.append(blk(x[-1], emb))
        h = self.middle_block[0](x[-1], emb)
        h = self.middle_block[1](h, emb)
        h = self.middle_block[2](h, emb)
        y_ver = []
        nrb1 = self.nrb + 1
        for i in range(len(self.out_blocks), 0, -1):
            h = torch.cat([h, x.pop()], dim=1)
            blk = self.out_blocks[i - 1]
            h = blk[0](h, emb)
            h = blk[1](h, emb)
            if len(blk) > 2:
                h = blk[2](h, emb)
        return self.outc(h), y_ver


class GEGLU(nn.Module):
    """attention_blocks.py:11-25."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm = nn.LayerNorm(cin)
        self.proj = nn.Linear(cin, cout * 2)

    def forward(self, x):
        # [B, C, *spatial] -> LayerNorm over C via the channel-last workaround
        b, c, *spatial = x.shape
        xn = self.norm(x.reshape(b, c, -1).transpose(1, 2))
        h, gate = self.proj(xn).chunk(2, dim=-1)
        return (h * F.gelu(gate)).transpose(1, 2).reshape(b, -1, *spatial)


class BasicTransformerBlock(nn.Module):
    """attention_blocks.py:200-231 (self-attn + cross-attn + GEGLU MLP)."""

    def __init__(self, ch, heads, ch_head, norm_groups, emb_dim):
        super().__init__()
        self.self_atn = LinearTransformer(ch, ch, heads, ch_head, norm_groups, None)
        if emb_dim is not None:
            self.cros_atn = LinearTransformer(ch, ch, heads, ch_head, norm_groups, emb_dim)
        # reference: GEGLU + Dropout/Identity + ConvNd 1x1 (attention_blocks.py:216-219)
        self.proj_out = nn.Sequential(
            GEGLU(ch, ch * 4), nn.Identity(), nn.Conv2d(ch * 4, ch, 1)
        )

    def forward(self, x, embedding=None):
        x = self.self_atn(x)
        if embedding is not None and hasattr(self, "cros_atn"):
            x = self.cros_atn(x, embedding)
        out = self.proj_out(x)
        return out + x if out.shape[1] == x.shape[1] else x


class SpatialTransformer(nn.Module):
    """attention_blocks.py:233-288 (norm -> 1x1 in -> blocks -> 1x1 out + res)."""

    def __init__(self, ch, heads, ch_head, norm_groups, emb_dim, depth=1):
        super().__init__()
        hid = heads * ch_head
        self.norm = nn.GroupNorm(norm_groups, ch)
        self.proj_in = nn.Conv2d(ch, hid, 1)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(hid, heads, ch_head, norm_groups, emb_dim)
            for _ in range(depth)
        ])
        self.proj_out = nn.Conv2d(hid, ch, 1)

    def forward(self, x, embedding=None):
        h = self.proj_in(self.norm(x))
        for blk in self.transformer_blocks:
            h = blk(h, embedding)
        h = self.proj_out(h)
        return h + x if h.shape == x.shape else h


class SpatialAttentionWrap(nn.Module):
    """Attention dispatcher with attention_type='spatial'."""

    def __init__(self, ch, norm_groups, emb_dim):
        super().__init__()
        self.attention = SpatialTransformer(ch, 8, ch // 8, norm_groups, emb_dim)

    def forward(self, x, embedding=None):
        return self.attention(x, embedding)


class UNet2Spatial(UNet2):
    """UNet2 with spatial-transformer attention at every level."""

    def __init__(self, cin=2, cout=2, hid=(8, 16, 32), norm_groups=4,
                 emb_dim=32, num_classes=2, nrb=2, ds=0):
        super().__init__(cin, cout, hid, norm_groups, emb_dim, num_classes, nrb, ds)
        depth = len(hid)
        in_blocks = []
        for i in range(1, depth):
            for k in range(nrb):
                in_blocks.append(SequentialEmb(
                    UnetResBlock(hid[i - 1 if k == 0 else i], hid[i], 3, 1,
                                 norm_groups, emb_dim),
                    SpatialAttentionWrap(hid[i], norm_groups, emb_dim)))
            if i < depth - 1:
                in_blocks.append(BasicDown(hid[i], hid[i], 3, 2))
        self.in_blocks = nn.ModuleList(in_blocks)
        self.middle_block = SequentialEmb(
            UnetResBlock(hid[-1], hid[-1], 3, 1, norm_groups, emb_dim),
            SpatialAttentionWrap(hid[-1], norm_groups, emb_dim),
            UnetResBlock(hid[-1], hid[-1], 3, 1, norm_groups, emb_dim),
        )
        out_blocks = []
        for i in range(1, depth):
            for k in range(nrb + 1):
                co = hid[i - 1 if k == 0 else i]
                seq = [UnetResBlock(hid[i] + co, co, 3, 1, norm_groups, emb_dim),
                       SpatialAttentionWrap(co, norm_groups, emb_dim)]
                if i > 1 and k == 0:
                    seq.append(BasicUp(co, co, 2, 2))
                out_blocks.append(SequentialEmb(*seq))
        self.out_blocks = nn.ModuleList(out_blocks)

    forward = None  # use the shared _forward below


def _unet2_forward_with_attention(self, x_t, t, condition):
    emb = self.time_embedder(t)
    if condition is not None:  # reference save_add semantics (conv_blocks.py:16-18)
        emb = emb + self.cond_embedder(condition)
    x = [self.in_conv(x_t)]
    for blk in self.in_blocks:
        if isinstance(blk, BasicDown):
            x.append(blk(x[-1]))
        else:
            x.append(blk(x[-1], emb))
    h = self.middle_block[0](x[-1], emb)
    h = self.middle_block[1](h, emb)
    h = self.middle_block[2](h, emb)
    nrb1 = self.nrb + 1
    for i in range(len(self.out_blocks), 0, -1):
        h = torch.cat([h, x.pop()], dim=1)
        blk = self.out_blocks[i - 1]
        h = blk[0](h, emb)
        h = blk[1](h, emb)
        if len(blk) > 2:
            h = blk[2](h, emb)
    return self.outc(h), []


UNet2Spatial.forward = _unet2_forward_with_attention
UNet2Attn.forward = _unet2_forward_with_attention
