"""diffusers-style latent embedders (second latent-embedder family).

Capability parity with the reference's vendored diffusers VAE stack
(``/root/reference/medical_diffusion/external/diffusers/vae.py`` +
``unet_blocks.py`` / ``resnet.py`` / ``attention.py``): the
``AutoencoderKL`` / ``VQModel`` architecture — pre-norm ResnetBlock2D
(eps 1e-6) encoder/decoder, a UNetMidBlock2D with single-head spatial
attention, asymmetric-padded stride-2 downsampling (``downsample_padding=0``
+ pad (0,1,0,1), resnet.py:87-94), quant/post-quant 1x1 convs, and the
un-clamped diagonal-Gaussian posterior with the /batch KL
(vae.py:297-343).

Quirks of the *vendored* copy kept faithfully (they differ from upstream
diffusers): ``block_out_channels`` has one more entry than
``down_block_types`` (Encoder indexes ``block_out_channels[i+1]``,
vae.py:41-44) and every level downsamples (``is_final_block`` is hardwired
False, vae.py:45).

The public contract matches the in-house family
(:mod:`medfusion_tpu.models.latent_embedders`): ``__call__(x, train) ->
(pred, pred_vertical, emb_loss)``, ``encode`` (rng collection ``'sample'``
for the KL posterior), ``decode`` — so both families drive the same AE/GAN
train steps and DiffusionPipeline.

Weight parity: :func:`convert_diffusers_vae_state_dict`; exact-forward tests
in ``tests/test_latent_embedders_diffusers.py``.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.models.latent_embedders import VectorQuantizer
from medfusion_tpu.models.unet_lucidrains import Conv


def _gn(groups: int, name: str, eps: float = 1e-6) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=groups, epsilon=eps, name=name)


class DResnetBlock(nn.Module):
    """Pre-norm GN->act->conv x2 + 1x1 shortcut, optional additive time
    embedding between the convs (diffusers/resnet.py:249-363).

    Full ResnetBlock2D option set: separate ``groups_out`` for norm2,
    ``output_scale_factor`` divisor on the residual sum, ``use_in_shortcut``
    override, in-block up/down resampling (``updown`` in {'none', 'up_fir',
    'down_fir', 'up', 'down', 'up_sde', 'down_sde'} — resnet.py:306-324;
    the non-FIR variants are the parameterless Upsample2D/Downsample2D
    use_conv=False paths) and the 'mish' nonlinearity. Defaults reproduce
    the scale-factor-1 VAE configuration."""

    in_channels: int
    out_channels: int
    groups: int = 32
    temb_channels: Optional[int] = None
    eps: float = 1e-6
    groups_out: Optional[int] = None
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    updown: str = "none"
    non_linearity: str = "swish"

    def setup(self):
        import medfusion_tpu.nn.functional as F

        self.norm1 = _gn(self.groups, "norm1", self.eps)
        self.conv1 = Conv(self.in_channels, self.out_channels, 3, name="conv1")
        if self.temb_channels is not None:
            self.time_emb_proj = nn.Dense(
                self.out_channels, kernel_init=F.torch_linear_kernel_init,
                bias_init=F.make_torch_bias_init(self.temb_channels),
                name="time_emb_proj")
        g2 = self.groups if self.groups_out is None else self.groups_out
        self.norm2 = _gn(g2, "norm2", self.eps)
        self.conv2 = Conv(self.out_channels, self.out_channels, 3, name="conv2")
        if self._shortcut():
            self.conv_shortcut = Conv(self.in_channels, self.out_channels, 1,
                                      padding=0, name="conv_shortcut")

    def _shortcut(self) -> bool:
        if self.use_in_shortcut is not None:
            return self.use_in_shortcut
        return self.in_channels != self.out_channels

    def _act(self, x):
        if self.non_linearity == "mish":
            return x * jnp.tanh(jax.nn.softplus(x))
        return nn.silu(x)

    def _resample(self, x):
        from medfusion_tpu.models.diffusers_blocks import (
            fir_downsample_2d, fir_upsample_2d)

        if self.updown in ("up", "up_sde"):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.updown == "up_fir":
            return fir_upsample_2d(x)
        if self.updown == "down_fir":
            return fir_downsample_2d(x)
        if self.updown == "down_sde":
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        if self.updown == "down":  # Downsample2D(use_conv=False) = AvgPool2d(2)
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x

    def __call__(self, x, temb=None, train: bool = False):
        h = self._act(self.norm1(x))
        if self.updown != "none":
            x = self._resample(x)
            h = self._resample(h)
        h = self.conv1(h)
        if self.temb_channels is not None and temb is not None:
            h = h + self.time_emb_proj(self._act(temb))[:, None, None, :]
        h = self.conv2(self._act(self.norm2(h)))
        if self._shortcut():
            x = self.conv_shortcut(x)
        out = x + h
        if self.output_scale_factor != 1.0:
            out = out / self.output_scale_factor
        return out


class DAttentionBlock(nn.Module):
    """Single-head (when ``num_head_channels`` is None) spatial attention with
    separate q/k/v linears and the double-scaled f32 softmax
    (diffusers/attention.py:9-93)."""

    channels: int
    num_head_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    rescale_output_factor: float = 1.0

    def setup(self):
        import medfusion_tpu.nn.functional as F

        self.group_norm = _gn(self.groups, "group_norm", self.eps)
        dense = lambda name: nn.Dense(
            self.channels, kernel_init=F.torch_linear_kernel_init,
            bias_init=F.make_torch_bias_init(self.channels), name=name)
        self.query = dense("query")
        self.key = dense("key")
        self.value = dense("value")
        self.proj_attn = dense("proj_attn")

    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        heads = (c // self.num_head_channels
                 if self.num_head_channels is not None else 1)
        h = self.group_norm(x).reshape(b, hh * ww, c)
        q, k, v = self.query(h), self.key(h), self.value(h)
        d = c // heads
        q = q.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
        scale = d ** -0.25
        attn = jnp.einsum("bhid,bhjd->bhij", q * scale, k * scale)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        out = self.proj_attn(out).reshape(b, hh, ww, c)
        out = out + x
        if self.rescale_output_factor != 1.0:
            out = out / self.rescale_output_factor
        return out


class DDownsample(nn.Module):
    """3x3 stride-2 conv downsample (resnet.py:54-96). ``padding=0`` is the
    asymmetric (0,1,0,1)-pad flavor the vendored VAE uses
    (``downsample_padding=0``); any other value is the symmetric conv pad."""

    channels: int
    padding: int = 0

    def setup(self):
        self.conv = Conv(self.channels, self.channels, 3, stride=2,
                         padding=self.padding, name="conv")

    def __call__(self, x, train: bool = False):
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(x)


class DUpsample(nn.Module):
    """nearest-2x + 3x3 conv (resnet.py:8-52)."""

    channels: int

    def setup(self):
        self.conv = Conv(self.channels, self.channels, 3, name="conv")

    def __call__(self, x, train: bool = False):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(x)


class DownEncoderBlock(nn.Module):
    """(unet_blocks.py:657-713). The vendored Encoder passes
    ``downsample_padding=0`` and always downsamples (vae.py:45-56 quirk);
    the ``get_down_block`` factory honors the reference defaults
    (``add_downsample``, symmetric ``downsample_padding=1``)."""

    in_channels: int
    out_channels: int
    num_layers: int = 1
    groups: int = 32
    add_downsample: bool = True
    downsample_padding: int = 0

    def setup(self):
        self.resnets = [
            DResnetBlock(self.in_channels if i == 0 else self.out_channels,
                         self.out_channels, self.groups)
            for i in range(self.num_layers)
        ]
        if self.add_downsample:
            self.downsamplers = [DDownsample(self.out_channels,
                                             self.downsample_padding)]

    def __call__(self, x, train: bool = False):
        for r in self.resnets:
            x = r(x, train=train)
        if self.add_downsample:
            for d in self.downsamplers:
                x = d(x, train)
        return x


class UpDecoderBlock(nn.Module):
    """(unet_blocks.py:1233-1283); note num_layers = layers_per_block + 1."""

    in_channels: int
    out_channels: int
    num_layers: int = 2
    groups: int = 32
    add_upsample: bool = True

    def setup(self):
        self.resnets = [
            DResnetBlock(self.in_channels if i == 0 else self.out_channels,
                         self.out_channels, self.groups)
            for i in range(self.num_layers)
        ]
        if self.add_upsample:
            self.upsamplers = [DUpsample(self.out_channels)]

    def __call__(self, x, train: bool = False):
        for r in self.resnets:
            x = r(x, train=train)
        if self.add_upsample:
            for u in self.upsamplers:
                x = u(x, train)
        return x


class MidBlock(nn.Module):
    """Res -> Attn -> Res (unet_blocks.py:208-283, num_layers=1)."""

    channels: int
    groups: int = 32

    def setup(self):
        self.resnets = [DResnetBlock(self.channels, self.channels, self.groups)
                        for _ in range(2)]
        self.attentions = [DAttentionBlock(self.channels, None, self.groups)]

    def __call__(self, x, train: bool = False):
        x = self.resnets[0](x, train=train)
        x = self.attentions[0](x, train=train)
        x = self.resnets[1](x, train=train)
        return x


class DiffusersEncoder(nn.Module):
    """(vae.py:20-97). ``block_out_channels`` has len(down levels)+1 entries
    and EVERY level downsamples — vendored-copy quirks kept."""

    in_channels: int
    out_channels: int
    block_out_channels: Sequence[int]
    layers_per_block: int = 2
    norm_num_groups: int = 32
    double_z: bool = True

    def setup(self):
        chs = self.block_out_channels
        self.conv_in = Conv(self.in_channels, chs[0], 3, name="conv_in")
        self.down_blocks = [
            DownEncoderBlock(chs[i], chs[i + 1], self.layers_per_block,
                             self.norm_num_groups)
            for i in range(len(chs) - 1)
        ]
        self.mid_block = MidBlock(chs[-1], self.norm_num_groups,
                                  name="mid_block")
        self.conv_norm_out = _gn(self.norm_num_groups, "conv_norm_out")
        out_ch = 2 * self.out_channels if self.double_z else self.out_channels
        self.conv_out = Conv(chs[-1], out_ch, 3, name="conv_out")

    def __call__(self, x, train: bool = False):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h, train)
        h = self.mid_block(h, train)
        return self.conv_out(nn.silu(self.conv_norm_out(h)))


class DiffusersDecoder(nn.Module):
    """(vae.py:100-177)."""

    in_channels: int
    out_channels: int
    block_out_channels: Sequence[int]
    layers_per_block: int = 2
    norm_num_groups: int = 32

    def setup(self):
        chs = list(reversed(self.block_out_channels))
        self.conv_in = Conv(self.in_channels, chs[0], 3, name="conv_in")
        self.mid_block = MidBlock(chs[0], self.norm_num_groups,
                                  name="mid_block")
        self.up_blocks = [
            UpDecoderBlock(chs[i], chs[i + 1], self.layers_per_block + 1,
                           self.norm_num_groups)
            for i in range(len(chs) - 1)
        ]
        self.conv_norm_out = _gn(self.norm_num_groups, "conv_norm_out")
        self.conv_out = Conv(chs[-1], self.out_channels, 3, name="conv_out")

    def hidden(self, z, train: bool = False):
        """Pre-``conv_out`` activation — the adaptive-lambda anchor point
        (the vendored VQGAN reads gradients at ``decoder.conv_out.weight``,
        vae.py:698-706)."""
        h = self.conv_in(z)
        h = self.mid_block(h, train)
        for blk in self.up_blocks:
            h = blk(h, train)
        return nn.silu(self.conv_norm_out(h))

    def __call__(self, z, train: bool = False):
        return self.conv_out(self.hidden(z, train))


def _diffusers_gaussian(moments, rng=None, sample=True):
    """Posterior without the logvar clamp; KL summed over everything and
    divided by batch (vae.py:297-331 — the clamp is commented out there)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    kl = 0.5 * jnp.sum(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar) / moments.shape[0]
    if sample:
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    else:
        z = mean
    return z, kl


class AutoencoderKLDiffusers(nn.Module):
    """(vae.py:465-561). In-house latent-embedder contract."""

    in_channels: int = 3
    out_channels: int = 3
    emb_channels: int = 3  # latent_channels
    block_out_channels: Sequence[int] = (32, 64, 128, 128)
    layers_per_block: int = 1
    norm_num_groups: int = 32

    def setup(self):
        self.encoder = DiffusersEncoder(
            self.in_channels, self.emb_channels, self.block_out_channels,
            self.layers_per_block, self.norm_num_groups, double_z=True,
            name="encoder")
        self.decoder = DiffusersDecoder(
            self.emb_channels, self.out_channels, self.block_out_channels,
            self.layers_per_block, self.norm_num_groups, name="decoder")
        self.quant_conv = Conv(2 * self.emb_channels, 2 * self.emb_channels,
                               1, padding=0, name="quant_conv")
        self.post_quant_conv = Conv(self.emb_channels, self.emb_channels, 1,
                                    padding=0, name="post_quant_conv")

    def _moments(self, x, train: bool):
        return self.quant_conv(self.encoder(x, train))

    def encode(self, x, train: bool = False, sample: bool = True):
        rng = self.make_rng("sample") if sample else None
        z, _ = _diffusers_gaussian(self._moments(x, train), rng, sample)
        return z

    def decode(self, z, train: bool = False):
        return self.decoder(self.post_quant_conv(z), train)

    def __call__(self, x, train: bool = False, sample: bool = True):
        rng = self.make_rng("sample") if sample else None
        z, kl = _diffusers_gaussian(self._moments(x, train), rng, sample)
        return self.decode(z, train), [], kl

    def forward_with_hiddens(self, x, train: bool = False,
                             sample: bool = True):
        """(pred, [], emb_loss, h_top, []) — same contract as the in-house
        family; h_top anchors the adversarial trainer's adaptive lambda at
        ``decoder.conv_out`` (vendored VAEWrapper/VQGAN flow)."""
        rng = self.make_rng("sample") if sample else None
        z, kl = _diffusers_gaussian(self._moments(x, train), rng, sample)
        h = self.decoder.hidden(self.post_quant_conv(z), train)
        return self.decoder.conv_out(h), [], kl, h, []


class VQModelDiffusers(nn.Module):
    """(vae.py:346-463). The vendored quantizer default is ``legacy=False``
    whose loss equals the in-house :class:`VectorQuantizer` exactly, so the
    quantizer is shared (codebook init uniform(-1/n, 1/n) in both)."""

    in_channels: int = 3
    out_channels: int = 3
    emb_channels: int = 3
    num_embeddings: int = 256
    block_out_channels: Sequence[int] = (32, 64, 128, 256)
    layers_per_block: int = 1
    norm_num_groups: int = 32

    def setup(self):
        self.encoder = DiffusersEncoder(
            self.in_channels, self.emb_channels, self.block_out_channels,
            self.layers_per_block, self.norm_num_groups, double_z=False,
            name="encoder")
        self.decoder = DiffusersDecoder(
            self.emb_channels, self.out_channels, self.block_out_channels,
            self.layers_per_block, self.norm_num_groups, name="decoder")
        self.quant_conv = Conv(self.emb_channels, self.emb_channels, 1,
                               padding=0, name="quant_conv")
        self.post_quant_conv = Conv(self.emb_channels, self.emb_channels, 1,
                                    padding=0, name="post_quant_conv")
        self.quantize = VectorQuantizer(self.num_embeddings,
                                        self.emb_channels, beta=0.25,
                                        name="quantize")

    def encode(self, x, train: bool = False):
        z = self.quant_conv(self.encoder(x, train))
        z_q, _ = self.quantize(z)
        return z_q

    def decode(self, z_q, train: bool = False):
        return self.decoder(self.post_quant_conv(z_q), train)

    def __call__(self, x, train: bool = False):
        z = self.quant_conv(self.encoder(x, train))
        z_q, emb_loss = self.quantize(z)
        return self.decode(z_q, train), [], emb_loss

    def forward_with_hiddens(self, x, train: bool = False):
        """(pred, [], emb_loss, h_top, []) — see AutoencoderKLDiffusers."""
        z = self.quant_conv(self.encoder(x, train))
        z_q, emb_loss = self.quantize(z)
        h = self.decoder.hidden(self.post_quant_conv(z_q), train)
        return self.decoder.conv_out(h), [], emb_loss, h, []


# ---------------------------------------------------------------------------
# torch state_dict -> flax params converter
# ---------------------------------------------------------------------------

_NORM_LEAF = re.compile(r"(norm1|norm2|group_norm|conv_norm_out)/weight$")


def convert_diffusers_vae_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Vendored ``AutoencoderKL``/``VQModel`` ``state_dict()`` -> flax params."""
    from medfusion_tpu.utils.torch_compat import set_in_tree

    params: Dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(val)
        k = re.sub(r"\.(\d+)", r"_\1", key)
        k = k.replace(".", "/")
        if k == "quantize/embedding/weight":
            set_in_tree(params, "quantize/codebook", arr)
            continue
        if _NORM_LEAF.search(k):
            k = k[: -len("weight")] + "scale"
        elif k.endswith("/weight"):
            k = k[: -len("weight")] + "kernel"
        if k.endswith("/kernel"):
            if arr.ndim == 4:  # conv [O, I, kh, kw] -> [kh, kw, I, O]
                arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:  # nn.Linear (attention q/k/v/proj)
                arr = np.ascontiguousarray(arr.T)
        set_in_tree(params, k, arr)
    return params
