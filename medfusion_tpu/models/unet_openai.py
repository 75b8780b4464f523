"""OpenAI / Stable-Diffusion style UNet noise estimator (second estimator family).

Capability parity with the reference's vendored alternative estimator
(``/root/reference/medical_diffusion/external/stable_diffusion/unet_openai.py:413-744``):
``channel_mult`` level widths, ``attention_resolutions`` in downsample units,
FiLM-style scale-shift GroupNorm conditioning (``use_scale_shift_norm``),
residual up/downsampling blocks (``resblock_updown``), double-scaled QKV
attention with f32 softmax (unet_openai.py:347-372), zero-init output conv,
and the ``(y, [])`` estimator contract shared with the in-house UNet — so it
drops into :class:`~medfusion_tpu.pipelines.diffusion.DiffusionPipeline`
unchanged.

TPU-native design: channels-last (NHWC/NDHWC), attention over flattened
spatial tokens routed through :func:`medfusion_tpu.nn.attention.compute_attention`
(which picks up the Pallas flash-attention kernel when globally enabled),
gradient checkpointing via ``flax.linen.remat`` instead of the reference's
custom ``CheckpointFunction`` (unet_openai.py:250-252), and a single jitted
graph for conditional+unconditional CFG via ``cond_mask``.

Deviations (documented, not bugs carried over):
* The vendored reference force-disables class conditioning
  (``condition = None`` at unet_openai.py:720) which makes every
  class-conditional config crash on its own assert; here labels work.
* ``use_spatial_transformer`` cross-attention IS supported (context via the
  ``context`` kwarg), rebuilt from stable_diffusion/attention.py:113-260
  (CrossAttention, GEGLU FeedForward, SpatialTransformer).

Weight parity: :func:`convert_openai_state_dict` maps the reference torch
``state_dict`` onto this module's params; exact-forward tests live in
``tests/test_unet_openai.py``.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.nn import functional as F
from medfusion_tpu.nn.attention import compute_attention


def sd_timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, cos-first (stable_diffusion/util.py:168-188)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn32(name: str, groups: int = 32) -> nn.GroupNorm:
    # torch normalization() = GroupNorm32(32, ch): f32 compute, eps 1e-5.
    # ``groups`` stays 32 for reference parity; sub-32-channel configs (which
    # the reference cannot build at all) may pass a smaller divisor.
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)


def _conv(out_ch: int, n: int, k: int = 3, stride=1, pad: int = 1,
          zero_init: bool = False, name: str = None, in_ch: int = None):
    """torch conv_nd with explicit symmetric padding and torch default init."""
    strides = (stride,) * n if isinstance(stride, int) else tuple(stride)
    fan_in = (in_ch or out_ch) * k ** n
    return nn.Conv(
        out_ch, kernel_size=(k,) * n, strides=strides,
        padding=[(pad, pad)] * n,
        kernel_init=F.zeros_init if zero_init else F.torch_conv_kernel_init,
        bias_init=F.zeros_init if zero_init else F.make_torch_bias_init(fan_in),
        name=name,
    )


def _dense(out_ch: int, in_ch: int, zero_init: bool = False, name: str = None):
    return nn.Dense(
        out_ch,
        kernel_init=F.zeros_init if zero_init else F.torch_linear_kernel_init,
        bias_init=F.zeros_init if zero_init else F.make_torch_bias_init(in_ch),
        name=name,
    )


def _group_norm_f32(gn: nn.GroupNorm, x):
    """GroupNorm32 semantics: normalize in f32, return in input dtype."""
    return gn(x.astype(jnp.float32)).astype(x.dtype)


def _upsample_nearest2x(x, spatial_dims: int):
    """2x nearest upsampling; 3D upsamples only the inner two dims — torch's
    (D, 2H, 2W) rule (unet_openai.py:109-119)."""
    assert spatial_dims in (2, 3)
    for ax in range(x.ndim - 3, x.ndim - 1):  # the trailing two spatial axes
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _avg_pool2x(x, spatial_dims: int):
    """stride-2 average pooling; 3D pools only the inner two dims
    (unet_openai.py:149-156)."""
    if spatial_dims == 3:
        window = strides = (1, 2, 2)
    else:
        window = strides = (2,) * spatial_dims
    return nn.avg_pool(x, window_shape=window, strides=strides)


class SDUpsample(nn.Module):
    """Nearest-2x upsample + optional 3x3 conv (unet_openai.py:91-119)."""

    channels: int
    out_channels: int
    use_conv: bool
    spatial_dims: int = 2

    def setup(self):
        if self.use_conv:
            self.conv = _conv(self.out_channels, self.spatial_dims, 3,
                              in_ch=self.channels, name="conv")

    def __call__(self, x, emb=None, train: bool = False):
        x = _upsample_nearest2x(x, self.spatial_dims)
        if self.use_conv:
            x = self.conv(x)
        return x


class SDDownsample(nn.Module):
    """Stride-2 conv or average pool (unet_openai.py:134-160)."""

    channels: int
    out_channels: int
    use_conv: bool
    spatial_dims: int = 2

    def setup(self):
        if self.use_conv:
            stride = (1, 2, 2) if self.spatial_dims == 3 else 2
            self.op = _conv(self.out_channels, self.spatial_dims, 3,
                            stride=stride, in_ch=self.channels, name="op")

    def __call__(self, x, emb=None, train: bool = False):
        if self.use_conv:
            return self.op(x)
        assert self.channels == self.out_channels
        return _avg_pool2x(x, self.spatial_dims)


class SDResBlock(nn.Module):
    """GN->SiLU->conv / emb-conditioned GN->SiLU->dropout->zero-conv residual
    block with optional FiLM scale-shift and fused up/downsampling
    (unet_openai.py:163-275)."""

    channels: int
    emb_channels: int
    out_channels: int
    dropout: float = 0.0
    use_conv_shortcut: bool = False  # 3x3 skip instead of 1x1 (``use_conv``)
    use_scale_shift_norm: bool = False
    spatial_dims: int = 2
    up: bool = False
    down: bool = False
    norm_groups: int = 32

    def setup(self):
        n = self.spatial_dims
        self.in_layers_0 = _gn32("in_layers_0", self.norm_groups)
        self.in_layers_2 = _conv(self.out_channels, n, 3, in_ch=self.channels,
                                 name="in_layers_2")
        emb_out = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        self.emb_layers_1 = _dense(emb_out, self.emb_channels, name="emb_layers_1")
        self.out_layers_0 = _gn32("out_layers_0", self.norm_groups)
        self.out_layers_3 = _conv(self.out_channels, n, 3, zero_init=True,
                                  in_ch=self.out_channels, name="out_layers_3")
        if self.out_channels != self.channels:
            k, pad = (3, 1) if self.use_conv_shortcut else (1, 0)
            self.skip_connection = _conv(self.out_channels, n, k, pad=pad,
                                         in_ch=self.channels, name="skip_connection")

    def __call__(self, x, emb, train: bool = False):
        h = nn.silu(_group_norm_f32(self.in_layers_0, x))
        if self.up:
            h = _upsample_nearest2x(h, self.spatial_dims)
            x = _upsample_nearest2x(x, self.spatial_dims)
        elif self.down:
            h = _avg_pool2x(h, self.spatial_dims)
            x = _avg_pool2x(x, self.spatial_dims)
        h = self.in_layers_2(h)

        emb_out = nn.silu(emb)
        emb_out = self.emb_layers_1(emb_out).astype(h.dtype)
        emb_out = emb_out.reshape(emb_out.shape[0], *(1,) * self.spatial_dims, -1)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _group_norm_f32(self.out_layers_0, h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(_group_norm_f32(self.out_layers_0, h))
        if self.dropout:
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = self.out_layers_3(h)

        if self.out_channels != self.channels:
            x = self.skip_connection(x)
        return x + h


class SDAttentionBlock(nn.Module):
    """Spatial self-attention over flattened tokens with the double-scaled
    f32 softmax (unet_openai.py:278-324, 347-406). ``new_order`` selects the
    QKVAttention (qkv-major) channel layout over QKVAttentionLegacy
    (head-major)."""

    channels: int
    num_heads: int
    new_order: bool = False
    norm_groups: int = 32

    def setup(self):
        self.norm = _gn32("norm", self.norm_groups)
        self.qkv = _dense(3 * self.channels, self.channels, name="qkv")
        self.proj_out = _dense(self.channels, self.channels, zero_init=True,
                               name="proj_out")

    def __call__(self, x, emb=None, train: bool = False):
        b, *spatial, c = x.shape
        h = x.reshape(b, -1, c)
        qkv = self.qkv(_group_norm_f32(self.norm, h))
        heads, d = self.num_heads, c // self.num_heads
        n = qkv.shape[1]
        if self.new_order:
            # channel layout [3, H, D] (unet_openai.py:388-406)
            q, k, v = [a.reshape(b, n, heads * d)
                       for a in jnp.split(qkv.reshape(b, n, 3, heads, d), 3, axis=2)]
        else:
            # channel layout [H, 3, D] (unet_openai.py:356-372)
            parts = qkv.reshape(b, n, heads, 3, d)
            q = parts[:, :, :, 0].reshape(b, n, heads * d)
            k = parts[:, :, :, 1].reshape(b, n, heads * d)
            v = parts[:, :, :, 2].reshape(b, n, heads * d)
        out = compute_attention(q, k, v, heads, scale=d ** -0.25)
        out = self.proj_out(out)
        return (h + out).reshape(b, *spatial, c)


class SDCrossAttention(nn.Module):
    """Multi-head cross/self attention with bias-free q/k/v projections
    (stable_diffusion/attention.py:152-201). Dropout omitted (always 0 in the
    shipped configs)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        inner = self.heads * self.dim_head
        ctx = self.context_dim or self.query_dim
        proj = lambda out, inp, name: nn.Dense(
            out, use_bias=False, kernel_init=F.torch_linear_kernel_init,
            name=name)
        self.to_q = proj(inner, self.query_dim, "to_q")
        self.to_k = proj(inner, ctx, "to_k")
        self.to_v = proj(inner, ctx, "to_v")
        self.to_out_0 = _dense(self.query_dim, inner, name="to_out_0")

    def __call__(self, x, context=None):
        h, d = self.heads, self.dim_head
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, d).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (d ** -0.5)
        attn = nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out_0(out)


class SDGEGLU(nn.Module):
    """x * gelu(gate) (attention.py:36-44)."""

    dim_in: int
    dim_out: int

    def setup(self):
        self.proj = _dense(self.dim_out * 2, self.dim_in, name="proj")

    def __call__(self, x):
        x, gate = jnp.split(self.proj(x), 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class SDFeedForward(nn.Module):
    """GEGLU MLP, torch names net.0.proj / net.2 (attention.py:47-64)."""

    dim: int
    mult: int = 4

    def setup(self):
        inner = self.dim * self.mult
        self.net_0 = SDGEGLU(self.dim, inner, name="net_0")
        self.net_2 = _dense(self.dim, inner, name="net_2")

    def __call__(self, x):
        return self.net_2(self.net_0(x))


class SDBasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU MLP, pre-LayerNorm
    (attention.py:200-219)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)
        self.attn1 = SDCrossAttention(self.dim, None, self.n_heads,
                                      self.d_head, name="attn1")
        self.attn2 = SDCrossAttention(self.dim, self.context_dim,
                                      self.n_heads, self.d_head, name="attn2")
        self.ff = SDFeedForward(self.dim, name="ff")
        self.norm1, self.norm2, self.norm3 = ln("norm1"), ln("norm2"), ln("norm3")

    def __call__(self, x, context=None):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context=context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SDSpatialTransformer(nn.Module):
    """GN(32, eps 1e-6) -> 1x1 proj_in -> N transformer blocks -> zero 1x1
    proj_out + residual (attention.py:222-260). Cross-attention defaults to
    self-attention when no context is given."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    norm_groups: int = 32

    def setup(self):
        inner = self.n_heads * self.d_head
        n = 2  # the reference transformer is 2-D only (nn.Conv2d projections)
        self.norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                                 name="norm")
        self.proj_in = _conv(inner, n, 1, pad=0, in_ch=self.in_channels,
                             name="proj_in")
        self.transformer_blocks = [
            SDBasicTransformerBlock(inner, self.n_heads, self.d_head,
                                    self.context_dim)
            for _ in range(self.depth)
        ]
        self.proj_out = _conv(self.in_channels, n, 1, pad=0, zero_init=True,
                              in_ch=inner, name="proj_out")

    def __call__(self, x, context=None):
        b, hh, ww, c = x.shape
        h = self.proj_in(self.norm(x))
        h = h.reshape(b, hh * ww, -1)
        for block in self.transformer_blocks:
            h = block(h, context=context)
        h = h.reshape(b, hh, ww, -1)
        return self.proj_out(h) + x


class UNetOpenAI(nn.Module):
    """The full SD/ADM UNet (unet_openai.py:413-744), NHWC, flax."""

    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4)
    conv_resample: bool = True
    spatial_dims: int = 2
    num_classes: Optional[int] = None
    num_heads: int = 8
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_spatial_transformer: bool = False  # SD cross-attn (context kwarg)
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    norm_groups: int = 32  # 32 = reference GroupNorm32; divisor override for tiny configs
    remat: bool = False  # reference use_checkpoint, via flax.linen.remat

    def _heads(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels == -1:
            nhu = self.num_heads_upsample
            return (nhu if (upsample and nhu != -1) else self.num_heads)
        assert ch % self.num_head_channels == 0
        return ch // self.num_head_channels

    def setup(self):
        mc = self.model_channels
        ted = mc * 4
        n = self.spatial_dims
        ResBlock = SDResBlock
        AttnBlock = SDAttentionBlock
        if self.remat:
            # __call__(x, emb, train): train is static.
            ResBlock = nn.remat(SDResBlock, static_argnums=(2,))
            AttnBlock = nn.remat(SDAttentionBlock, static_argnums=(2,))
        if self.use_spatial_transformer:
            # legacy rule (unet_openai.py:548-550): d_head = ch // num_heads
            def AttnBlock(ch_, heads_, **_kw):  # noqa: N802
                return SDSpatialTransformer(
                    ch_, heads_, ch_ // heads_, depth=self.transformer_depth,
                    context_dim=self.context_dim, norm_groups=self.norm_groups)

        self.time_embed_0 = _dense(ted, mc, name="time_embed_0")
        self.time_embed_2 = _dense(ted, ted, name="time_embed_2")
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, ted, name="label_emb",
                                      embedding_init=nn.initializers.normal(1.0))

        blocks = [[_conv(mc, n, 3, in_ch=self.in_channels)]]
        ch = mc
        chans = [mc]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                layers = [ResBlock(ch, ted, mult * mc, self.dropout,
                                   use_scale_shift_norm=self.use_scale_shift_norm,
                                   spatial_dims=n, norm_groups=self.norm_groups)]
                ch = mult * mc
                if ds in self.attention_resolutions:
                    layers.append(AttnBlock(ch, self._heads(ch),
                                            new_order=self.use_new_attention_order,
                                            norm_groups=self.norm_groups))
                blocks.append(layers)
                chans.append(ch)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    down = ResBlock(ch, ted, ch, self.dropout,
                                    use_scale_shift_norm=self.use_scale_shift_norm,
                                    spatial_dims=n, down=True,
                                    norm_groups=self.norm_groups)
                else:
                    down = SDDownsample(ch, ch, self.conv_resample, n)
                blocks.append([down])
                chans.append(ch)
                ds *= 2
        self.input_blocks = blocks

        self.middle_block = [
            ResBlock(ch, ted, ch, self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm, spatial_dims=n,
                     norm_groups=self.norm_groups),
            AttnBlock(ch, self._heads(ch), new_order=self.use_new_attention_order,
                      norm_groups=self.norm_groups),
            ResBlock(ch, ted, ch, self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm, spatial_dims=n,
                     norm_groups=self.norm_groups),
        ]

        out_blocks = []
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = chans.pop()
                layers = [ResBlock(ch + ich, ted, mult * mc, self.dropout,
                                   use_scale_shift_norm=self.use_scale_shift_norm,
                                   spatial_dims=n, norm_groups=self.norm_groups)]
                ch = mult * mc
                if ds in self.attention_resolutions:
                    layers.append(AttnBlock(ch, self._heads(ch, upsample=True),
                                            new_order=self.use_new_attention_order,
                                            norm_groups=self.norm_groups))
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        layers.append(ResBlock(ch, ted, ch, self.dropout,
                                               use_scale_shift_norm=self.use_scale_shift_norm,
                                               spatial_dims=n, up=True,
                                               norm_groups=self.norm_groups))
                    else:
                        layers.append(SDUpsample(ch, ch, self.conv_resample, n))
                    ds //= 2
                out_blocks.append(layers)
        self.output_blocks = out_blocks

        self.out_0 = _gn32("out_0", self.norm_groups)
        self.out_2 = _conv(self.out_channels, n, 3, zero_init=True,
                           in_ch=mc, name="out_2")

    def __call__(
        self,
        x_t,
        t=None,
        condition=None,
        self_cond=None,
        cond_mask=None,
        train: bool = False,
        context=None,  # [B, T, context_dim] for use_spatial_transformer
    ) -> Tuple[jnp.ndarray, list]:
        assert self_cond is None, "UNetOpenAI has no self-conditioning (use models.UNet)"
        emb = self.time_embed_2(nn.silu(self.time_embed_0(
            sd_timestep_embedding(t, self.model_channels))))
        if condition is not None and self.num_classes is not None:
            lab = self.label_emb(condition)
            if cond_mask is not None:
                lab = lab * cond_mask.astype(lab.dtype)[:, None]
            emb = emb + lab
        # keep bf16 (compute_dtype) programs bf16: the f32 sinusoidal
        # embedding otherwise re-promotes every downstream activation
        emb = emb.astype(x_t.dtype)

        def apply(layer, h):
            # the stem conv (input_blocks.0.0) takes no embedding; spatial
            # transformers take the cross-attention context instead
            # (TimestepEmbedSequential dispatch, unet_openai.py:74-88)
            if isinstance(layer, nn.Conv):
                return layer(h)
            if isinstance(layer, SDSpatialTransformer):
                return layer(h, context)
            return layer(h, emb, train)

        hs = []
        h = x_t
        for layers in self.input_blocks:
            for layer in layers:
                h = apply(layer, h)
            hs.append(h)
        for layer in self.middle_block:
            h = apply(layer, h)
        for layers in self.output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for layer in layers:
                h = apply(layer, h)
        y = self.out_2(nn.silu(_group_norm_f32(self.out_0, h.astype(x_t.dtype))))
        return y, []


class SDAttentionPool(nn.Module):
    """CLIP-style attention pooling (unet_openai.py:32-59): prepend the mean
    token, add a learned positional embedding, one QKVAttention (qkv-major
    layout) pass, return the pooled first token."""

    embed_dim: int
    num_head_channels: int
    output_dim: int
    spatial_tokens: int  # spatial**2 at the pooled resolution

    def setup(self):
        n = self.spatial_tokens + 1
        self.positional_embedding = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / self.embed_dim ** 0.5,
            (self.embed_dim, n))
        self.qkv_proj = _dense(3 * self.embed_dim, self.embed_dim,
                               name="qkv_proj")
        self.c_proj = _dense(self.output_dim, self.embed_dim, name="c_proj")

    def __call__(self, x):
        b, *spatial, c = x.shape
        h = x.reshape(b, -1, c)
        h = jnp.concatenate([jnp.mean(h, axis=1, keepdims=True), h], axis=1)
        h = h + self.positional_embedding.T[None].astype(h.dtype)
        qkv = self.qkv_proj(h)
        heads = self.embed_dim // self.num_head_channels
        d = c // heads
        n = qkv.shape[1]
        # qkv-major channel layout (QKVAttention, unet_openai.py:379-406)
        q, k, v = [a.reshape(b, n, heads * d)
                   for a in jnp.split(qkv.reshape(b, n, 3, heads, d), 3, axis=2)]
        out = compute_attention(q, k, v, heads, scale=d ** -0.25)
        return self.c_proj(out)[:, 0]


class EncoderUNetOpenAI(nn.Module):
    """The half (encoder-only) UNet classifier (unet_openai.py:747-961) with
    all four pooling heads: 'adaptive' (GN->SiLU->global-avg->zero 1x1),
    'attention' (GN->SiLU->AttentionPool2d), 'spatial' and 'spatial_v2'
    (MLPs over concatenated per-stage spatial means). Returns [N, K]."""

    image_size: int = 32
    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    spatial_dims: int = 2
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    pool: str = "adaptive"
    norm_groups: int = 32

    def setup(self):
        mc = self.model_channels
        ted = mc * 4
        n = self.spatial_dims
        heads = lambda ch: (self.num_heads if self.num_head_channels == -1
                            else ch // self.num_head_channels)

        self.time_embed_0 = _dense(ted, mc, name="time_embed_0")
        self.time_embed_2 = _dense(ted, ted, name="time_embed_2")

        blocks = [[_conv(mc, n, 3, in_ch=self.in_channels)]]
        ch, ds = mc, 1
        feature_size = mc
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                layers = [SDResBlock(ch, ted, mult * mc, self.dropout,
                                     use_scale_shift_norm=self.use_scale_shift_norm,
                                     spatial_dims=n, norm_groups=self.norm_groups)]
                ch = mult * mc
                if ds in self.attention_resolutions:
                    layers.append(SDAttentionBlock(
                        ch, heads(ch), new_order=self.use_new_attention_order,
                        norm_groups=self.norm_groups))
                blocks.append(layers)
                feature_size += ch
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    blocks.append([SDResBlock(
                        ch, ted, ch, self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        spatial_dims=n, down=True, norm_groups=self.norm_groups)])
                else:
                    blocks.append([SDDownsample(ch, ch, self.conv_resample, n)])
                ds *= 2
                feature_size += ch
        self.input_blocks = blocks
        self._ds = ds
        self._feature_size = feature_size + ch

        self.middle_block = [
            SDResBlock(ch, ted, ch, self.dropout,
                       use_scale_shift_norm=self.use_scale_shift_norm,
                       spatial_dims=n, norm_groups=self.norm_groups),
            SDAttentionBlock(ch, heads(ch),
                             new_order=self.use_new_attention_order,
                             norm_groups=self.norm_groups),
            SDResBlock(ch, ted, ch, self.dropout,
                       use_scale_shift_norm=self.use_scale_shift_norm,
                       spatial_dims=n, norm_groups=self.norm_groups),
        ]

        if self.pool == "adaptive":
            self.out_0 = _gn32("out_0", self.norm_groups)
            self.out_3 = _conv(self.out_channels, n, 1, pad=0, zero_init=True,
                               in_ch=ch, name="out_3")
        elif self.pool == "attention":
            assert self.num_head_channels != -1
            self.out_0 = _gn32("out_0", self.norm_groups)
            self.out_2 = SDAttentionPool(
                ch, self.num_head_channels, self.out_channels,
                (self.image_size // ds) ** 2, name="out_2")
        elif self.pool == "spatial":
            self.out_0 = _dense(2048, self._feature_size, name="out_0")
            self.out_2 = _dense(self.out_channels, 2048, name="out_2")
        elif self.pool == "spatial_v2":
            self.out_0 = _dense(2048, self._feature_size, name="out_0")
            self.out_1 = _gn32("out_1", self.norm_groups)
            self.out_3 = _dense(self.out_channels, 2048, name="out_3")
        else:
            raise NotImplementedError(f"Unexpected {self.pool} pooling")

    def __call__(self, x, t, train: bool = False):
        emb = self.time_embed_2(nn.silu(self.time_embed_0(
            sd_timestep_embedding(t, self.model_channels)))).astype(x.dtype)
        spatial_axes = tuple(range(1, 1 + self.spatial_dims))

        results = []
        h = x
        for layers in self.input_blocks:
            for layer in layers:
                h = layer(h) if isinstance(layer, nn.Conv) else layer(h, emb, train)
            if self.pool.startswith("spatial"):
                results.append(jnp.mean(h, axis=spatial_axes))
        for layer in self.middle_block:
            h = layer(h, emb, train)

        if self.pool == "adaptive":
            h = nn.silu(_group_norm_f32(self.out_0, h))
            h = jnp.mean(h, axis=spatial_axes, keepdims=True)
            return self.out_3(h).reshape(h.shape[0], -1)
        if self.pool == "attention":
            return self.out_2(nn.silu(_group_norm_f32(self.out_0, h)))
        results.append(jnp.mean(h, axis=spatial_axes))
        h = jnp.concatenate(results, axis=-1)
        if self.pool == "spatial":
            return self.out_2(nn.relu(self.out_0(h)))
        return self.out_3(nn.silu(_group_norm_f32(self.out_1, self.out_0(h))))


# ---------------------------------------------------------------------------
# torch state_dict -> flax params converter
# ---------------------------------------------------------------------------

_NORM_LEAF = re.compile(
    r"(^|/)(in_layers_0|out_layers_0|norm|out_0|norm1|norm2|norm3)/weight$"
)


def _openai_key_to_path(key: str, ndim: int = None) -> str:
    key = re.sub(r"\.(\d+)", r"_\1", key)  # numeric indices join their parent
    key = key.replace(".", "/")
    if key == "label_emb/weight":
        return "label_emb/embedding"
    if key.endswith("/weight"):
        # 1-D weights are norm scales (GroupNorm/LayerNorm); anything wider
        # is a conv/linear kernel. Falls back to the name rule when the
        # shape is unknown.
        is_norm = (ndim == 1) if ndim is not None else bool(_NORM_LEAF.search(key))
        return key[: -len("weight")] + ("scale" if is_norm else "kernel")
    return key


def convert_openai_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Reference ``UNetModel.state_dict()`` (numpy-valued) -> flax params."""
    from medfusion_tpu.utils.torch_compat import set_in_tree

    params: Dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(val)
        path = _openai_key_to_path(key, arr.ndim)
        if path.endswith("/kernel"):
            if arr.ndim >= 4:  # conv nd: [O, I, *k] -> [*k, I, O]
                nsp = arr.ndim - 2
                arr = np.ascontiguousarray(
                    np.transpose(arr, (*range(2, nsp + 2), 1, 0)))
            elif arr.ndim == 3:  # conv1d used as a linear (qkv/proj_out)
                assert arr.shape[-1] == 1, f"{key}: non-pointwise conv1d {arr.shape}"
                arr = np.ascontiguousarray(arr[:, :, 0].T)
            else:  # nn.Linear
                arr = np.ascontiguousarray(arr.T)
        set_in_tree(params, path, arr)
    return params
