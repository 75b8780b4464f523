"""Conv/norm/act building blocks — flax.linen, channels-last (NHWC/NDHWC).

Semantics parity with the reference L1 blocks
(``/root/reference/medical_diffusion/models/utils/conv_blocks.py``):

* ``BasicBlock``    — Conv -> Norm -> Dropout -> Act, optional zero-init conv
  (conv_blocks.py:134-192; note the unusual norm-after-conv order).
* ``BasicResBlock`` — BasicBlock + 1x1-conv skip (conv_blocks.py:194-240).
* ``UnetBasicBlock``/``UnetResBlock`` — two stacked blocks, the LAST conv
  zero-initialized, additive time-embedding broadcast after block 0 (and after
  block 1 for the Basic variant — conv_blocks.py:285-302 vs :347-364).
* ``BasicDown``     — strided conv (or avg-pool), optional PixelUnshuffle
  residual (conv_blocks.py:28-70).
* ``BasicUp``       — nearest-exact resize to the transposed-conv output shape
  then 3x3 conv (or plain resize) (conv_blocks.py:72-131).
* ``DownBlock``/``UpBlock`` — down/up + optional Attention + ConvBlock with
  additive-vs-concat skip joins (conv_blocks.py:368-528).

TPU notes: channels-last keeps convs in XLA's native TPU layout; GroupNorm+SiLU
can be fused via the Pallas kernel in :mod:`medfusion_tpu.ops.group_norm`
(enabled by ``use_fused_norm``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from medfusion_tpu.nn import functional as F

NormName = Union[str, Tuple[str, dict], None]
ActName = Union[str, Tuple[str, dict], None]


def _parse(name):
    if name is None:
        return None, {}
    if isinstance(name, str):
        return name.lower(), {}
    return name[0].lower(), dict(name[1])


def make_act(act_name: ActName):
    """MONAI get_act_layer equivalent."""
    kind, kw = _parse(act_name)
    if kind is None:
        return None
    if kind in ("swish", "silu"):
        return nn.silu
    if kind == "relu":
        return nn.relu
    if kind == "leakyrelu":
        slope = kw.get("negative_slope", 0.01)
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if kind == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if kind == "tanh":
        return jnp.tanh
    raise NotImplementedError(f"activation {act_name!r}")


class FusedGroupNorm(nn.Module):
    """GroupNorm via the Pallas fused kernel; optional fused SiLU epilogue.
    Param names (scale/bias) match nn.GroupNorm for checkpoint compatibility."""

    num_groups: int
    epsilon: float = 1e-5
    affine: bool = True
    apply_silu: bool = False

    @nn.compact
    def __call__(self, x):
        from medfusion_tpu.ops.group_norm import fused_group_norm_silu

        c = x.shape[-1]
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
        else:
            scale = jnp.ones((c,), x.dtype)
            bias = jnp.zeros((c,), x.dtype)
        return fused_group_norm_silu(x, scale, bias, self.num_groups,
                                     eps=self.epsilon, apply_silu=self.apply_silu)


class S2DGroupNorm(nn.Module):
    """GroupNorm applied to a space-to-depth tensor (B, h, w, 4C): exact
    statistics over (h, w, phase, channels-in-group) via ``F.s2d_group_norm``.
    Params (scale/bias, shape (C,)) match nn.GroupNorm — checkpoints
    interchange with the full-res layout."""

    channels: int
    num_groups: int
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.channels,))
            bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        else:
            scale = bias = None
        return F.s2d_group_norm(x, scale, bias, self.num_groups, self.epsilon)


class Norm(nn.Module):
    """MONAI get_norm_layer equivalent (GROUP/BATCH/LAYER/INSTANCE), torch eps.

    ``fuse_silu=True`` (only honored for GROUP + the fused-kernel switch on)
    folds the following SiLU into the Pallas one-pass kernel.

    ``__call__(x, s2d=True)``: ``x`` is space-to-depth (B, h, w, 4C); GROUP
    norm only, computed exactly in that layout (``S2DGroupNorm``)."""

    norm_name: NormName
    channels: int
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, s2d: bool = False):
        from medfusion_tpu import ops

        kind, kw = _parse(self.norm_name)
        if kind is None:
            return x
        if s2d and kind != "group":
            raise ValueError(f"s2d norm supports GROUP only, got {kind!r}")
        if kind == "group":
            num_groups = kw.get("num_groups", 32)
            affine = kw.get("affine", True)
            if s2d:
                return S2DGroupNorm(
                    channels=self.channels,
                    num_groups=num_groups,
                    epsilon=kw.get("eps", 1e-5),
                    affine=affine,
                    name="norm",
                )(x)
            if ops.fused_group_norm_enabled():
                return FusedGroupNorm(
                    num_groups=num_groups,
                    epsilon=kw.get("eps", 1e-5),
                    affine=affine,
                    apply_silu=self.fuse_silu,
                    name="norm",
                )(x)
            return nn.GroupNorm(
                num_groups=num_groups,
                epsilon=kw.get("eps", 1e-5),
                use_bias=affine,
                use_scale=affine,
                name="norm",
            )(x)
        if kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                epsilon=kw.get("eps", 1e-5),
                momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
                name="norm",
            )(x)
        if kind == "layer":
            return nn.LayerNorm(epsilon=kw.get("eps", 1e-5), name="norm")(x)
        if kind == "instance":
            return nn.GroupNorm(
                num_groups=self.channels,
                epsilon=kw.get("eps", 1e-5),
                use_bias=kw.get("affine", False),
                use_scale=kw.get("affine", False),
                name="norm",
            )(x)
        raise NotImplementedError(f"norm {self.norm_name!r}")


class _ConvParams(nn.Module):
    """Raw conv kernel/bias params with nn.Conv's exact names, shapes, and
    init draws (same scope path -> same RNG folds), for compute paths that
    bypass ``nn.Conv.__call__`` (the fused upsample-conv)."""

    kshape: Sequence[int]
    kernel_init: Any
    bias_init: Any
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, tuple(self.kshape))
        b = (self.param("bias", self.bias_init, (self.kshape[-1],))
             if self.use_bias else None)
        return k, b


class ConvND(nn.Module):
    """Conv with MONAI same-ish padding and torch default init.

    Input/kernel layout: [B, *spatial, C] / [*k, I, O].

    ``fused_up2x=True`` (2D, k=3, s=1 only): the input is the LOW-RES tensor
    and the module computes ``conv3x3(nearest-2x-upsample(x))`` via the
    4-phase 2x2 decomposition (``F.fused_up2x_conv`` — same linear map,
    2.25x fewer FLOPs). The param tree is identical to the unfused module
    (checkpoints interchange freely).

    ``__call__(x, s2d=True)`` (2D, s=1, k in {1, 3}): ``x`` is in
    space-to-depth layout (B, h, w, 4*in_ch) and the SAME (k, k, in_ch,
    out_ch) params are applied via the exact s2d decomposition
    (``F.s2d_conv3x3`` / ``F.s2d_conv1x1``), returning s2d output.
    """

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    zero_init: bool = False
    use_bias: bool = True
    fused_up2x: bool = False

    @nn.compact
    def __call__(self, x, s2d: bool = False, s2d_out: bool = False):
        n = self.spatial_dims
        k = F.ensure_tuple(self.kernel_size, n)
        s = F.ensure_tuple(self.stride, n)
        pad = [(p, p) for p in F.get_padding(k, s, n)]
        if s2d_out and not self.fused_up2x:
            raise ValueError("s2d_out is only meaningful with fused_up2x")
        if s2d:
            if self.fused_up2x or n != 2 or s != (1, 1) or k not in ((1, 1), (3, 3)):
                raise ValueError(
                    f"s2d conv requires 2D s=1 k in {{1,3}}, got dims={n} k={k} s={s}")
            in_ch = x.shape[-1] // 4
        else:
            in_ch = x.shape[-1]
        fan_in = in_ch * 1
        for ki in k:
            fan_in *= ki
        if self.zero_init:
            kernel_init = F.zeros_init
            bias_init = F.zeros_init
        else:
            kernel_init = F.torch_conv_kernel_init
            bias_init = F.make_torch_bias_init(fan_in)
        if s2d:
            kernel, bias = _ConvParams(
                k + (in_ch, self.out_channels), kernel_init, bias_init,
                self.use_bias, name="conv")()
            from flax.linen.dtypes import promote_dtype

            x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
            if k == (3, 3):
                return F.s2d_conv3x3(x, kernel, bias)
            return F.s2d_conv1x1(x, kernel, bias)
        if self.fused_up2x:
            if n != 2 or k != (3, 3) or s != (1, 1):
                raise ValueError(
                    f"fused_up2x requires 2D k=3 s=1, got dims={n} k={k} s={s}")
            kernel, bias = _ConvParams(
                (3, 3, in_ch, self.out_channels), kernel_init, bias_init,
                self.use_bias, name="conv")()
            # match nn.Conv's dtype promotion (inputs/params -> common dtype)
            from flax.linen.dtypes import promote_dtype

            x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
            return F.fused_up2x_conv(x, kernel, bias, s2d_out=s2d_out)
        return nn.Conv(
            features=self.out_channels,
            kernel_size=k,
            strides=s,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            name="conv",
        )(x)


class Dense(nn.Module):
    """Linear with torch default init."""

    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=F.zeros_init if self.zero_init else F.torch_linear_kernel_init,
            bias_init=F.zeros_init if self.zero_init else F.make_torch_bias_init(fan_in),
            name="linear",
        )(x)


class BasicBlock(nn.Module):
    """Conv -> Norm -> Dropout -> Act (conv_blocks.py:134-192)."""

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    norm_name: NormName = None
    act_name: ActName = None
    dropout: Optional[float] = None
    zero_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, s2d: bool = False):
        from medfusion_tpu import ops

        if s2d and self.dropout is not None:
            raise ValueError("s2d BasicBlock does not support dropout")
        x = ConvND(
            self.spatial_dims,
            self.out_channels,
            self.kernel_size,
            self.stride,
            zero_init=self.zero_conv,
            name="conv",
        )(x, s2d=s2d)
        norm_kind, _ = _parse(self.norm_name)
        act_kind, _ = _parse(self.act_name)
        # One-pass GroupNorm+SiLU Pallas fusion when the epilogue is pure SiLU.
        fuse = (
            ops.fused_group_norm_enabled()
            and norm_kind == "group"
            and act_kind in ("swish", "silu")
            and self.dropout is None
            and not s2d
        )
        if self.norm_name is not None:
            x = Norm(self.norm_name, self.out_channels, fuse_silu=fuse, name="norm")(
                x, train=train, s2d=s2d
            )
        if fuse:
            return x
        if self.dropout is not None:
            x = nn.Dropout(rate=float(self.dropout), deterministic=not train)(x)
        act = make_act(self.act_name)
        if act is not None:
            x = act(x)
        return x


class BasicResBlock(nn.Module):
    """BasicBlock + 1x1-conv skip (conv_blocks.py:194-240).

    Skip conv exists iff in_channels != out_channels (identity otherwise).
    """

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    norm_name: NormName = None
    act_name: ActName = None
    dropout: Optional[float] = None
    zero_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, s2d: bool = False):
        out = BasicBlock(
            self.spatial_dims,
            self.out_channels,
            self.kernel_size,
            self.stride,
            self.norm_name,
            self.act_name,
            self.dropout,
            self.zero_conv,
            name="basic_block",
        )(x, train=train, s2d=s2d)
        in_ch = x.shape[-1] // 4 if s2d else x.shape[-1]
        if in_ch != self.out_channels:
            residual = ConvND(
                self.spatial_dims, self.out_channels, 1, self.stride, name="conv_res"
            )(x, s2d=s2d)
        else:
            residual = x
        return out + residual


class _UnetBlockBase(nn.Module):
    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    norm_name: NormName = None
    act_name: ActName = None
    dropout: Optional[float] = None
    emb_channels: Optional[int] = None
    blocks: int = 2

    def _embed(self, emb, x):
        """Act -> Linear -> broadcast over spatial dims (conv_blocks.py:279-294)."""
        act = make_act(self.act_name)
        e = act(emb) if act is not None else emb
        e = Dense(self.out_channels, name="local_embedder")(e)
        sp = x.ndim - 2
        return e.reshape(e.shape[0], *([1] * sp), e.shape[-1])


class UnetBasicBlock(_UnetBlockBase):
    """Two BasicBlocks, last zero-init; emb added after each (conv_blocks.py:244-302)."""

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False, s2d: bool = False):
        if s2d and emb is not None:
            raise ValueError("s2d conv blocks do not take an embedding")
        e = self._embed(emb, x) if emb is not None else None
        for i in range(self.blocks):
            x = BasicBlock(
                self.spatial_dims,
                self.out_channels,
                self.kernel_size,
                self.stride,
                self.norm_name,
                self.act_name,
                self.dropout,
                zero_conv=(i == self.blocks - 1),
                name=f"block_{i}",
            )(x, train=train, s2d=s2d)
            if e is not None:
                x = x + e
        return x


class UnetResBlock(_UnetBlockBase):
    """Two BasicResBlocks, last zero-init; emb added after all but the last
    block (conv_blocks.py:305-364)."""

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False, s2d: bool = False):
        if s2d and emb is not None:
            raise ValueError("s2d conv blocks do not take an embedding")
        e = self._embed(emb, x) if emb is not None else None
        for i in range(self.blocks):
            x = BasicResBlock(
                self.spatial_dims,
                self.out_channels,
                self.kernel_size,
                self.stride,
                self.norm_name,
                self.act_name,
                self.dropout,
                zero_conv=(i == self.blocks - 1),
                name=f"block_{i}",
            )(x, train=train, s2d=s2d)
            if e is not None and i < self.blocks - 1:
                x = x + e
        return x


def pixel_unshuffle(x, r: int = 2):
    return rearrange(x, "b (h r1) (w r2) c -> b h w (c r1 r2)", r1=r, r2=r)


def pixel_shuffle(x, r: int = 2):
    return rearrange(x, "b h w (c r1 r2) -> b (h r1) (w r2) c", r1=r, r2=r)


class BasicDown(nn.Module):
    """Strided conv (learnable) or avg-pool downsample (conv_blocks.py:28-70)."""

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 2
    learnable_interpolation: bool = True
    use_res: bool = False

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False):
        if self.learnable_interpolation:
            y = ConvND(
                self.spatial_dims,
                self.out_channels,
                self.kernel_size,
                self.stride,
                name="down_conv",
            )(x)
            if self.use_res:
                y = y + pixel_unshuffle(x)  # 2D only, out = 4*in channels
            return y
        return F.avg_pool_same(x, self.kernel_size, self.stride)


class BasicUp(nn.Module):
    """Nearest-exact resize to the transposed-conv output shape, then 3x3 conv
    when learnable (conv_blocks.py:72-131)."""

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 2
    stride: Union[int, Sequence[int]] = 2
    learnable_interpolation: bool = True
    use_res: bool = False

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False, s2d_out: bool = False):
        new_size = F.up_output_shape(x.shape[1:-1], self.kernel_size, self.stride)
        if s2d_out:
            # s2d decode tail: emit the fused up-conv's four phase outputs as
            # channel blocks (space-to-depth layout) instead of interleaving —
            # the level's remaining blocks then run on the half-res grid.
            if (self.spatial_dims != 2 or self.use_res
                    or not self.learnable_interpolation
                    or tuple(new_size) != tuple(2 * sz for sz in x.shape[1:-1])):
                raise ValueError("s2d_out requires learnable 2D integer-2x up")
            return ConvND(self.spatial_dims, self.out_channels, 3, 1,
                          fused_up2x=True, name="up_conv")(x, s2d_out=True)
        if not self.learnable_interpolation:
            return F.interpolate_nearest_exact(x, new_size)
        import medfusion_tpu.ops as ops

        # exact-math FLOP cut (ops.enable_fused_up_conv): at integer 2x the
        # upsample+conv pair collapses to 4 phase convs on the low-res grid
        # (F.fused_up2x_conv). Param tree identical either way.
        fuse = (ops.fused_up_conv_enabled() and self.spatial_dims == 2
                and tuple(new_size) == tuple(2 * sz for sz in x.shape[1:-1]))
        if fuse:
            y = ConvND(self.spatial_dims, self.out_channels, 3, 1,
                       fused_up2x=True, name="up_conv")(x)
        else:
            y = ConvND(self.spatial_dims, self.out_channels, 3, 1,
                       name="up_conv")(F.interpolate_nearest_exact(x, new_size))
        if self.use_res:
            y = y + pixel_shuffle(x)
        return y


class DownBlock(nn.Module):
    """Down -> Attention -> ConvBlock (conv_blocks.py:368-441)."""

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]]
    downsample_kernel_size: Union[int, Sequence[int]]
    norm_name: NormName
    act_name: ActName
    dropout: Optional[float] = None
    use_res_block: bool = False
    learnable_interpolation: bool = True
    use_attention: str = "none"
    emb_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False):
        from medfusion_tpu.nn.attention import Attention

        n = self.spatial_dims
        enable_down = F.ensure_tuple(self.stride, n) != F.ensure_tuple(1, n)
        if enable_down:
            x = BasicDown(
                n,
                self.out_channels,
                self.downsample_kernel_size,
                self.stride,
                self.learnable_interpolation,
                name="down_op",
            )(x)
        down_ch = x.shape[-1]
        if self.use_attention != "none":
            x = Attention(
                spatial_dims=n,
                out_channels=down_ch,
                num_heads=8,
                ch_per_head=down_ch // 8,
                depth=1,
                norm_name=self.norm_name,
                dropout=self.dropout,
                emb_dim=self.emb_channels,
                attention_type=self.use_attention,
                name="attention",
            )(x, emb, train=train)
        ConvBlock = UnetResBlock if self.use_res_block else UnetBasicBlock
        return ConvBlock(
            n,
            self.out_channels,
            self.kernel_size,
            1,
            self.norm_name,
            self.act_name,
            self.dropout,
            emb_channels=self.emb_channels,
            name="conv_block",
        )(x, emb, train=train)


class UpBlock(nn.Module):
    """Up -> skip-join -> Attention -> ConvBlock (conv_blocks.py:444-528).

    Additive skip when learnable_interpolation (channels match), else concat.
    """

    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]]
    upsample_kernel_size: Union[int, Sequence[int]]
    norm_name: NormName
    act_name: ActName
    dropout: Optional[float] = None
    use_res_block: bool = False
    learnable_interpolation: bool = True
    use_attention: str = "none"
    emb_channels: Optional[int] = None
    skip_channels: int = 0

    @nn.compact
    def __call__(self, x_enc, x_skip=None, emb=None, train: bool = False,
                 s2d_tail: bool = False):
        from medfusion_tpu.nn.attention import Attention

        n = self.spatial_dims
        enable_up = F.ensure_tuple(self.stride, n) != F.ensure_tuple(1, n)
        if s2d_tail:
            # exact space-to-depth execution of the whole level (see
            # F.s2d_conv3x3): up-conv emits phase-block channels, the conv
            # block runs on the half-res grid, caller depth-to-spaces at the
            # very end. Inference-shape path: no skip/attention/embedding.
            if (x_skip is not None or emb is not None
                    or self.use_attention != "none" or not enable_up):
                raise ValueError(
                    "s2d_tail requires a skipless, attention-free, "
                    "embedding-free up level")
            x = BasicUp(
                n, self.out_channels, self.upsample_kernel_size, self.stride,
                self.learnable_interpolation, name="up_op",
            )(x_enc, s2d_out=True)
            ConvBlock = UnetResBlock if self.use_res_block else UnetBasicBlock
            return ConvBlock(
                n, self.out_channels, self.kernel_size, 1, self.norm_name,
                self.act_name, self.dropout, emb_channels=self.emb_channels,
                name="conv_block",
            )(x, None, train=train, s2d=True)
        x = x_enc
        if enable_up:
            x = BasicUp(
                n,
                self.out_channels,
                self.upsample_kernel_size,
                self.stride,
                self.learnable_interpolation,
                name="up_op",
            )(x)
        if x_skip is not None:
            if self.learnable_interpolation:
                x = x + x_skip
            else:
                x = jnp.concatenate([x, x_skip], axis=-1)
        ch = x.shape[-1]
        if self.use_attention != "none":
            x = Attention(
                spatial_dims=n,
                out_channels=ch,
                num_heads=8,
                ch_per_head=ch // 8,
                depth=1,
                norm_name=self.norm_name,
                dropout=self.dropout,
                emb_dim=self.emb_channels,
                attention_type=self.use_attention,
                name="attention",
            )(x, emb, train=train)
        ConvBlock = UnetResBlock if self.use_res_block else UnetBasicBlock
        return ConvBlock(
            n,
            self.out_channels,
            self.kernel_size,
            1,
            self.norm_name,
            self.act_name,
            self.dropout,
            emb_channels=self.emb_channels,
            name="conv_block",
        )(x, emb, train=train)
