"""lucidrains-style compact DDPM UNet (third estimator family).

Capability parity with the reference's vendored alternative estimator
(``/root/reference/medical_diffusion/external/unet_lucidrains.py:205-332``):
weight-standardized convs (arXiv:1903.10520) + GroupNorm blocks with FiLM
time conditioning, linear attention on every resolution, cosine-sim (l2norm,
scale=10) full attention in the middle, learned-sinusoidal time embedding
option, learned-variance output, self-conditioning — returning the shared
``(y, [])`` estimator contract, so it drops into ``DiffusionPipeline``.

TPU-native: NHWC, kernel standardization fused by XLA into the conv (a pure
elementwise prologue on the weights), attention over flattened tokens.
Weight parity: :func:`convert_lucidrains_state_dict` maps the vendored torch
``state_dict`` onto this module; exact-forward tests in
``tests/test_unet_lucidrains.py``.

The vendored model has no label conditioning (``condition`` is accepted and
ignored, unet_lucidrains.py:293); this port keeps that contract and documents
it rather than silently diverging.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.nn import functional as F


def _eps_for(dtype) -> float:
    # reference: 1e-5 in float32, 1e-3 otherwise (unet_lucidrains.py:76,92)
    return 1e-5 if dtype == jnp.float32 else 1e-3


def _conv_nhwc(x, kernel, bias, stride: int = 1, padding: int = 1):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        [(padding, padding)] * 2, dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class WSConv(nn.Module):
    """Conv with per-output-channel weight standardization
    (unet_lucidrains.py:70-83). Kernel [kh, kw, I, O]; stats over all but O."""

    in_features: int
    features: int
    kernel_size: int = 3
    padding: int = 1

    def setup(self):
        k, fan_in = self.kernel_size, self.in_features * self.kernel_size ** 2
        self.kernel = self.param("kernel", F.torch_conv_kernel_init,
                                 (k, k, self.in_features, self.features))
        self.bias = self.param("bias", F.make_torch_bias_init(fan_in),
                               (self.features,))

    def __call__(self, x):
        eps = _eps_for(x.dtype)
        mean = jnp.mean(self.kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(self.kernel, axis=(0, 1, 2), keepdims=True)
        w = (self.kernel - mean) * jax.lax.rsqrt(var + eps)
        return _conv_nhwc(x, w, self.bias, 1, self.padding)


class Conv(nn.Module):
    """Plain torch-init conv (NHWC)."""

    in_features: int
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True

    def setup(self):
        k = self.kernel_size
        fan_in = self.in_features * k * k
        self.kernel = self.param("kernel", F.torch_conv_kernel_init,
                                 (k, k, self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param("bias", F.make_torch_bias_init(fan_in),
                                   (self.features,))

    def __call__(self, x):
        b = self.bias if self.use_bias else None
        return _conv_nhwc(x, self.kernel, b, self.stride, self.padding)


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm with biased variance and scale-only affine ``g``
    (unet_lucidrains.py:86-95). NHWC: normalizes the last axis."""

    dim: int

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        eps = _eps_for(x.dtype)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * g


class LucidBlock(nn.Module):
    """WSConv -> GroupNorm -> (scale_shift) -> SiLU (unet_lucidrains.py:107-123)."""

    in_dim: int
    dim_out: int
    groups: int = 8

    def setup(self):
        self.proj = WSConv(self.in_dim, self.dim_out, name="proj")
        self.norm = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                                 name="norm")

    def __call__(self, x, scale_shift=None):
        x = self.norm(self.proj(x))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class LucidResnetBlock(nn.Module):
    """Two blocks + FiLM from the time MLP + 1x1 residual
    (unet_lucidrains.py:125-149)."""

    in_dim: int
    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8

    def setup(self):
        if self.time_emb_dim is not None:
            self.mlp_1 = nn.Dense(
                self.dim_out * 2,
                kernel_init=F.torch_linear_kernel_init,
                bias_init=F.make_torch_bias_init(self.time_emb_dim),
                name="mlp_1")
        self.block1 = LucidBlock(self.in_dim, self.dim_out, self.groups,
                                 name="block1")
        self.block2 = LucidBlock(self.dim_out, self.dim_out, self.groups,
                                 name="block2")
        if self.in_dim != self.dim_out:
            self.res_conv = Conv(self.in_dim, self.dim_out, 1, padding=0,
                                 name="res_conv")

    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            te = self.mlp_1(nn.silu(time_emb))[:, None, None, :]
            scale_shift = jnp.split(te, 2, axis=-1)
        h = self.block1(x, scale_shift)
        h = self.block2(h)
        r = self.res_conv(x) if self.in_dim != self.dim_out else x
        return h + r


class LucidLinearAttention(nn.Module):
    """Linear attention: softmax(q over d) . softmax(k over n)
    (unet_lucidrains.py:151-179)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    def setup(self):
        hidden = self.heads * self.dim_head
        self.to_qkv = Conv(self.dim, hidden * 3, 1, padding=0, use_bias=False,
                           name="to_qkv")
        self.to_out_0 = Conv(hidden, self.dim, 1, padding=0, name="to_out_0")
        self.to_out_1 = ChanLayerNorm(self.dim, name="to_out_1")

    def __call__(self, x):
        b, hh, ww, _ = x.shape
        n = hh * ww
        qkv = self.to_qkv(x).reshape(b, n, 3, self.heads, self.dim_head)
        # torch layout 'b (h c) x y -> b h c (x y)': tokens last
        q, k, v = [qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3)]
        q = nn.softmax(q, axis=-2) * self.dim_head ** -0.5
        k = nn.softmax(k, axis=-1)
        v = v / n
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = out.transpose(0, 3, 1, 2).reshape(b, hh, ww, -1)
        return self.to_out_1(self.to_out_0(out))


class LucidAttention(nn.Module):
    """Cosine-sim full attention, fixed scale (unet_lucidrains.py:181-201)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    scale: float = 10.0

    def setup(self):
        hidden = self.heads * self.dim_head
        self.to_qkv = Conv(self.dim, hidden * 3, 1, padding=0, use_bias=False,
                           name="to_qkv")
        self.to_out = Conv(hidden, self.dim, 1, padding=0, name="to_out")

    def __call__(self, x):
        b, hh, ww, _ = x.shape
        n = hh * ww
        qkv = self.to_qkv(x).reshape(b, n, 3, self.heads, self.dim_head)
        # torch layout 'b (h c) x y -> b h c (x y)': [b, h, d, n]; l2norm runs
        # over dim=-1 = the TOKEN axis (unet_lucidrains.py:50-51,193-195) —
        # faithful to the vendored code, quirky as it is.
        q, k, v = [qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3)]
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True).clip(1e-12)
        sim = jnp.einsum("bhdi,bhdj->bhij", q, k) * self.scale
        attn = nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhdj->bhid", attn, v)  # [b, h, n, d]
        out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, -1)
        return self.to_out(out)


class PreNorm(nn.Module):
    dim: int
    fn_kind: str  # 'linear' | 'full'

    def setup(self):
        self.norm = ChanLayerNorm(self.dim, name="norm")
        self.fn = (LucidLinearAttention(self.dim, name="fn")
                   if self.fn_kind == "linear"
                   else LucidAttention(self.dim, name="fn"))

    def __call__(self, x):
        return self.fn(self.norm(x))


class Residual(nn.Module):
    dim: int
    fn_kind: str

    def setup(self):
        self.fn = PreNorm(self.dim, self.fn_kind, name="fn")

    def __call__(self, x):
        return self.fn(x) + x


class LucidUpsample(nn.Module):
    """nearest-2x + 3x3 conv; torch nn.Sequential index 1 holds the conv
    (unet_lucidrains.py:61-65)."""

    in_dim: int
    dim_out: int

    def setup(self):
        self.conv_1 = Conv(self.in_dim, self.dim_out, 3, name="conv_1")

    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv_1(x)


class UNetLucidrains(nn.Module):
    """The vendored lucidrains DDPM UNet (unet_lucidrains.py:205-332)."""

    dim: int = 32
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    learned_sinusoidal_dim: int = 16

    def setup(self):
        init_dim = self.init_dim or self.dim
        in_ch = self.channels * (2 if self.self_condition else 1)
        self.init_conv = Conv(in_ch, init_dim, 7, padding=3, name="init_conv")

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4
        g = self.resnet_block_groups

        if self.learned_sinusoidal_cond:
            self.time_mlp_0_weights = self.param(
                "time_mlp_0_weights", nn.initializers.normal(1.0),
                (self.learned_sinusoidal_dim // 2,))
            fourier_dim = self.learned_sinusoidal_dim + 1
        else:
            fourier_dim = self.dim
        self.time_mlp_1 = nn.Dense(
            time_dim, kernel_init=F.torch_linear_kernel_init,
            bias_init=F.make_torch_bias_init(fourier_dim), name="time_mlp_1")
        self.time_mlp_3 = nn.Dense(
            time_dim, kernel_init=F.torch_linear_kernel_init,
            bias_init=F.make_torch_bias_init(time_dim), name="time_mlp_3")

        downs = []
        for ind, (d_in, d_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            downs.append([
                LucidResnetBlock(d_in, d_in, time_dim, g),
                LucidResnetBlock(d_in, d_in, time_dim, g),
                Residual(d_in, "linear"),
                (Conv(d_in, d_out, 3) if is_last
                 else Conv(d_in, d_out, 4, stride=2, padding=1)),
            ])
        self.downs = downs

        mid = dims[-1]
        self.mid_block1 = LucidResnetBlock(mid, mid, time_dim, g,
                                           name="mid_block1")
        self.mid_attn = Residual(mid, "full", name="mid_attn")
        self.mid_block2 = LucidResnetBlock(mid, mid, time_dim, g,
                                           name="mid_block2")

        ups = []
        for ind, (d_in, d_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            ups.append([
                LucidResnetBlock(d_out + d_in, d_out, time_dim, g),
                LucidResnetBlock(d_out + d_in, d_out, time_dim, g),
                Residual(d_out, "linear"),
                (Conv(d_out, d_in, 3) if is_last
                 else LucidUpsample(d_out, d_in)),
            ])
        self.ups = ups

        default_out = self.channels * (2 if self.learned_variance else 1)
        self._out_dim = self.out_dim or default_out
        self.final_res_block = LucidResnetBlock(self.dim * 2, self.dim,
                                                time_dim, g,
                                                name="final_res_block")
        self.final_conv = Conv(self.dim, self._out_dim, 1, padding=0,
                               name="final_conv")

    def _time_embedding(self, t):
        t = t.astype(jnp.float32)
        if self.learned_sinusoidal_cond:
            freqs = t[:, None] * self.time_mlp_0_weights[None] * 2 * math.pi
            emb = jnp.concatenate(
                [t[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        else:
            half = self.dim // 2
            scale = math.log(10000) / (half - 1)
            freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
            args = t[:, None] * freqs[None]
            emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        return self.time_mlp_3(nn.gelu(self.time_mlp_1(emb), approximate=False))

    def __call__(
        self,
        x_t,
        t=None,
        condition=None,  # accepted and ignored (unet_lucidrains.py:293)
        self_cond=None,
        cond_mask=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, list]:
        if self.self_condition:
            sc = jnp.zeros_like(x_t) if self_cond is None else self_cond
            x_t = jnp.concatenate([sc, x_t], axis=-1)  # self-cond FIRST (:296)

        x = self.init_conv(x_t)
        r = x
        # cast: the f32 sinusoidal embedding must not re-promote a bf16
        # (compute_dtype) program's activations
        emb = self._time_embedding(t).astype(x.dtype)

        h = []
        for block1, block2, attn, downsample in self.downs:
            x = block1(x, emb)
            h.append(x)
            x = block2(x, emb)
            x = attn(x)
            h.append(x)
            x = downsample(x)

        x = self.mid_block1(x, emb)
        x = self.mid_attn(x)
        x = self.mid_block2(x, emb)

        for block1, block2, attn, upsample in self.ups:
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = block1(x, emb)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = block2(x, emb)
            x = attn(x)
            x = upsample(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = self.final_res_block(x, emb)
        return self.final_conv(x), []


# ---------------------------------------------------------------------------
# torch state_dict -> flax params converter
# ---------------------------------------------------------------------------

def convert_lucidrains_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Vendored ``UNet.state_dict()`` (numpy-valued) -> flax params."""
    import re

    from medfusion_tpu.utils.torch_compat import set_in_tree

    params: Dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(val)
        k = re.sub(r"\.(\d+)", r"_\1", key)
        k = k.replace(".", "/")
        # torch module-path -> flax attribute-path fixups
        k = k.replace("time_mlp_0/weights", "time_mlp_0_weights")
        # ups.*.3 is nn.Sequential(Upsample, Conv2d): index 1 is the conv
        k = re.sub(r"(ups_\d+_3)_1/", r"\1/conv_1/", k)
        if k.endswith("/weight"):
            leaf = "scale" if re.search(r"norm/weight$", k) else "kernel"
            k = k[: -len("weight")] + leaf
        if k.endswith("/g"):  # ChanLayerNorm g: (1, C, 1, 1) -> [C]
            arr = arr.reshape(-1)
        if k.endswith("/kernel"):
            if arr.ndim == 4:  # [O, I, kh, kw] -> [kh, kw, I, O]
                arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:  # nn.Linear
                arr = np.ascontiguousarray(arr.T)
        set_in_tree(params, k, arr)
    return params
