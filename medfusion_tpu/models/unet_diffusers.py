"""diffusers-style conditional UNet (fourth estimator family).

Capability parity with the reference's vendored
``external/diffusers/unet.py::UNet2DConditionModel`` (+ ``unet_blocks.py`` /
``attention.py`` / ``embeddings.py``): Cross-attention Down/Up blocks and a
cross-attention mid block built from pre-norm ResnetBlock2D (eps 1e-5 here,
``norm_eps``), diffusers SpatialTransformers (GN eps 1e-6, NON-zero-init
proj_out — unlike the SD flavor), flip-sin-to-cos timestep embedding with
``downscale_freq_shift=0`` (embeddings.py:9-48), and a label→context
``nn.Embedding(2, cross_attention_dim)`` (unet.py:105).

Deviation (documented): the vendored forward feeds ``self.emb(labels)``
([B, dim]) straight into CrossAttention, which requires a 3-D context and
therefore crashes for 1-D label input; here 1-D integer labels become a
single context token ([B, 1, dim]) — the working version of the same wiring.
2-D integer label grids ([B, T]) map to T tokens exactly as in torch.

Estimator contract: ``(x_t, t, condition, self_cond=None, cond_mask=None,
train=False) -> (y, [])``, so it drops into ``DiffusionPipeline``; parity
tests in ``tests/test_unet_diffusers.py`` run the vendored torch model.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.models.latent_embedders_diffusers import DResnetBlock, DUpsample
from medfusion_tpu.models.unet_lucidrains import Conv
from medfusion_tpu.models.unet_openai import SDBasicTransformerBlock, _dense
from medfusion_tpu.nn import functional as F


def diffusers_timestep_embedding(t, dim: int, flip_sin_to_cos: bool = True,
                                 downscale_freq_shift: float = 0.0,
                                 max_period: float = 10000.0):
    """(embeddings.py:9-48): sin-first, optionally flipped to cos-first,
    exponent scaled by 1/(half - downscale_freq_shift)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class DiffusersSpatialTransformer(nn.Module):
    """(attention.py:95-152): like the SD flavor but proj_out is NOT
    zero-init; reuses the (identical) BasicTransformerBlock stack."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    norm_groups: int = 32

    def setup(self):
        inner = self.n_heads * self.d_head
        self.norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                                 name="norm")
        self.proj_in = Conv(self.in_channels, inner, 1, padding=0,
                            name="proj_in")
        self.transformer_blocks = [
            SDBasicTransformerBlock(inner, self.n_heads, self.d_head,
                                    self.context_dim)
            for _ in range(self.depth)
        ]
        self.proj_out = Conv(inner, self.in_channels, 1, padding=0,
                             name="proj_out")

    def __call__(self, x, context=None):
        b, hh, ww, c = x.shape
        h = self.proj_in(self.norm(x))
        h = h.reshape(b, hh * ww, -1)
        for block in self.transformer_blocks:
            h = block(h, context=context)
        return self.proj_out(h.reshape(b, hh, ww, -1)) + x


class DDownsampleConv(nn.Module):
    """Downsample2D with symmetric padding (resnet.py:54-94, padding=1)."""

    in_channels: int
    out_channels: int

    def setup(self):
        self.conv = Conv(self.in_channels, self.out_channels, 3, stride=2,
                         padding=1, name="conv")

    def __call__(self, x):
        return self.conv(x)


class _DownBlock(nn.Module):
    """DownBlock2D / CrossAttnDownBlock2D (unet_blocks.py:463-656)."""

    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 2
    groups: int = 32
    eps: float = 1e-5
    cross: bool = False
    attn_head_dim: int = 8
    context_dim: Optional[int] = None
    add_downsample: bool = True

    def setup(self):
        self.resnets = [
            DResnetBlock(self.in_channels if i == 0 else self.out_channels,
                         self.out_channels, self.groups,
                         temb_channels=self.temb_channels, eps=self.eps)
            for i in range(self.num_layers)
        ]
        if self.cross:
            self.attentions = [
                DiffusersSpatialTransformer(
                    self.out_channels, self.attn_head_dim,
                    self.out_channels // self.attn_head_dim,
                    context_dim=self.context_dim, norm_groups=self.groups)
                for _ in range(self.num_layers)
            ]
        if self.add_downsample:
            self.downsamplers = [DDownsampleConv(self.out_channels,
                                                 self.out_channels)]

    def __call__(self, x, temb, context=None, train: bool = False):
        skips = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb, train=train)
            if self.cross:
                x = self.attentions[i](x, context)
            skips.append(x)
        if self.add_downsample:
            x = self.downsamplers[0](x)
            skips.append(x)
        return x, tuple(skips)


class _UpBlock(nn.Module):
    """UpBlock2D / CrossAttnUpBlock2D (unet_blocks.py:1040-1230)."""

    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int = 3
    groups: int = 32
    eps: float = 1e-5
    cross: bool = False
    attn_head_dim: int = 8
    context_dim: Optional[int] = None
    add_upsample: bool = True

    def setup(self):
        resnets = []
        for i in range(self.num_layers):
            res_skip = (self.in_channels if i == self.num_layers - 1
                        else self.out_channels)
            res_in = self.prev_output_channel if i == 0 else self.out_channels
            resnets.append(DResnetBlock(
                res_in + res_skip, self.out_channels, self.groups,
                temb_channels=self.temb_channels, eps=self.eps))
        self.resnets = resnets
        if self.cross:
            self.attentions = [
                DiffusersSpatialTransformer(
                    self.out_channels, self.attn_head_dim,
                    self.out_channels // self.attn_head_dim,
                    context_dim=self.context_dim, norm_groups=self.groups)
                for _ in range(self.num_layers)
            ]
        if self.add_upsample:
            self.upsamplers = [DUpsample(self.out_channels)]

    def __call__(self, x, skips, temb, context=None, train: bool = False):
        skips = list(skips)
        for i, resnet in enumerate(self.resnets):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = resnet(x, temb, train=train)
            if self.cross:
                x = self.attentions[i](x, context)
        if self.add_upsample:
            x = self.upsamplers[0](x, train)
        return x


class _MidBlockCrossAttn(nn.Module):
    """UNetMidBlock2DCrossAttn (unet_blocks.py:287-375)."""

    channels: int
    temb_channels: int
    groups: int = 32
    eps: float = 1e-5
    attn_head_dim: int = 8
    context_dim: Optional[int] = None

    def setup(self):
        mk_res = lambda: DResnetBlock(self.channels, self.channels,
                                      self.groups,
                                      temb_channels=self.temb_channels,
                                      eps=self.eps)
        self.resnets = [mk_res(), mk_res()]
        self.attentions = [DiffusersSpatialTransformer(
            self.channels, self.attn_head_dim,
            self.channels // self.attn_head_dim,
            context_dim=self.context_dim, norm_groups=self.groups)]

    def __call__(self, x, temb, context=None, train: bool = False):
        x = self.resnets[0](x, temb, train=train)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb, train=train)


class UNet2DConditionDiffusers(nn.Module):
    """(unet.py:42-257). Returns ``(sample, [])``."""

    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Sequence[str] = ("CrossAttnDownBlock2D",
                                       "CrossAttnDownBlock2D",
                                       "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Sequence[str] = ("UpBlock2D", "CrossAttnUpBlock2D",
                                     "CrossAttnUpBlock2D", "CrossAttnUpBlock2D")
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    num_classes: int = 2  # the label->context table (unet.py:105)

    def setup(self):
        chs = self.block_out_channels
        ted = chs[0] * 4
        g, eps = self.norm_num_groups, self.norm_eps

        self.emb = nn.Embed(self.num_classes, self.cross_attention_dim,
                            embedding_init=nn.initializers.normal(1.0),
                            name="emb")
        self.conv_in = Conv(self.in_channels, chs[0], 3, name="conv_in")
        # time_embedding.{linear_1,linear_2} (embeddings.py:66-88)
        self.time_embedding_linear_1 = _dense(ted, chs[0],
                                              name="time_embedding_linear_1")
        self.time_embedding_linear_2 = _dense(ted, ted,
                                              name="time_embedding_linear_2")

        down, out_ch = [], chs[0]
        for i, kind in enumerate(self.down_block_types):
            in_ch, out_ch = out_ch, chs[i]
            down.append(_DownBlock(
                in_ch, out_ch, ted, self.layers_per_block, g, eps,
                cross=(kind == "CrossAttnDownBlock2D"),
                attn_head_dim=self.attention_head_dim,
                context_dim=self.cross_attention_dim,
                add_downsample=(i != len(chs) - 1)))
        self.down_blocks = down

        self.mid_block = _MidBlockCrossAttn(
            chs[-1], ted, g, eps, self.attention_head_dim,
            self.cross_attention_dim, name="mid_block")

        rev = list(reversed(chs))
        up, out_ch = [], rev[0]
        for i, kind in enumerate(self.up_block_types):
            prev_out, out_ch = out_ch, rev[i]
            in_ch = rev[min(i + 1, len(chs) - 1)]
            up.append(_UpBlock(
                in_ch, prev_out, out_ch, ted, self.layers_per_block + 1, g,
                eps, cross=(kind == "CrossAttnUpBlock2D"),
                attn_head_dim=self.attention_head_dim,
                context_dim=self.cross_attention_dim,
                add_upsample=(i != len(chs) - 1)))
        self.up_blocks = up

        self.conv_norm_out = nn.GroupNorm(num_groups=g, epsilon=eps,
                                          name="conv_norm_out")
        self.conv_out = Conv(chs[0], self.out_channels, 3, name="conv_out")

    def __call__(
        self,
        x_t,
        t=None,
        condition=None,
        self_cond=None,
        cond_mask=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, list]:
        assert self_cond is None, "UNet2DConditionDiffusers has no self-conditioning"
        context = None
        if condition is not None:
            cond = condition if condition.ndim > 1 else condition[:, None]
            context = self.emb(cond)  # [B, T, cross_attention_dim]
            if cond_mask is not None:
                context = context * cond_mask.astype(context.dtype)[:, None, None]

        temb = self.time_embedding_linear_2(nn.silu(
            self.time_embedding_linear_1(
                diffusers_timestep_embedding(t, self.block_out_channels[0]))))
        # cast: the f32 sinusoidal embedding must not re-promote a bf16
        # (compute_dtype) program's activations
        temb = temb.astype(x_t.dtype)
        if context is not None:
            context = context.astype(x_t.dtype)

        h = self.conv_in(x_t)
        skips = (h,)
        for blk in self.down_blocks:
            h, s = blk(h, temb, context, train)
            skips += s
        h = self.mid_block(h, temb, context, train)
        for blk in self.up_blocks:
            n = len(blk.resnets)
            h = blk(h, skips[-n:], temb, context, train)
            skips = skips[:-n]
        h = self.conv_norm_out(h.astype(jnp.float32)).astype(x_t.dtype)
        return self.conv_out(nn.silu(h)), []


# ---------------------------------------------------------------------------
# torch state_dict -> flax params converter
# ---------------------------------------------------------------------------

def convert_diffusers_unet_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Vendored ``UNet2DConditionModel.state_dict()`` -> flax params."""
    from medfusion_tpu.utils.torch_compat import set_in_tree

    params: Dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(val)
        k = re.sub(r"\.(\d+)", r"_\1", key)
        k = k.replace(".", "/")
        k = k.replace("time_embedding/linear_1", "time_embedding_linear_1")
        k = k.replace("time_embedding/linear_2", "time_embedding_linear_2")
        if k == "emb/weight":
            set_in_tree(params, "emb/embedding", arr)
            continue
        if k.endswith("/weight"):
            leaf = "scale" if arr.ndim == 1 else "kernel"
            k = k[: -len("weight")] + leaf
        if k.endswith("/kernel"):
            if arr.ndim == 4:
                arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                arr = np.ascontiguousarray(arr.T)
        set_in_tree(params, k, arr)
    return params
