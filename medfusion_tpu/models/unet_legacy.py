"""Legacy MONAI-flavored UNet noise estimator.

Parity with the reference's older variant
(``/root/reference/medical_diffusion/models/estimators/unet.py:15-176``):
one DownBlock/UpBlock per level (vs. unet2's num_res_blocks stages), additive
skips when ``learnable_interpolation`` (concat otherwise, handled inside
UpBlock), deep-supervision heads reading the decoder outputs at each level,
same ``(y, y_ver)`` I/O contract as :class:`medfusion_tpu.models.unet.UNet`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from medfusion_tpu.models.embedders import LabelEmbedder, TimeEmbedding
from medfusion_tpu.nn.blocks import (
    BasicBlock,
    DownBlock,
    UnetBasicBlock,
    UnetResBlock,
    UpBlock,
)
from medfusion_tpu.nn.functional import save_add


class UNetLegacy(nn.Module):
    in_ch: int = 1
    out_ch: int = 1
    spatial_dims: int = 2
    hid_chs: Sequence[int] = (32, 64, 128, 256)
    kernel_sizes: Sequence[int] = (1, 3, 3, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    act_name: tuple = ("SWISH", {})
    norm_name: tuple = ("GROUP", {"num_groups": 32, "affine": True})
    time_emb_dim: Optional[int] = None
    use_time_embedder: bool = True
    cond_emb_num_classes: Optional[int] = None
    deep_supervision: object = True
    use_res_block: bool = True
    estimate_variance: bool = False
    use_self_conditioning: bool = False
    dropout: float = 0.0
    learnable_interpolation: bool = True
    use_attention: object = "none"

    @property
    def depth(self) -> int:
        return len(self.strides)

    def setup(self):
        attn = (list(self.use_attention)
                if isinstance(self.use_attention, (list, tuple))
                else [self.use_attention] * self.depth)
        t_dim = self.time_emb_dim or self.hid_chs[0] * 4
        emb_dim = t_dim if self.use_time_embedder else None
        dropout = self.dropout if self.dropout else None
        ConvBlock = UnetResBlock if self.use_res_block else UnetBasicBlock

        if self.use_time_embedder:
            self.time_embedder = TimeEmbedding(emb_dim=t_dim)
        if self.cond_emb_num_classes is not None:
            self.cond_embedder = LabelEmbedder(emb_dim=t_dim,
                                               num_classes=self.cond_emb_num_classes)

        self.inc = ConvBlock(
            self.spatial_dims, self.hid_chs[0], self.kernel_sizes[0], self.strides[0],
            self.norm_name, self.act_name, emb_channels=emb_dim,
        )
        self.encoders = [
            DownBlock(
                self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i],
                self.strides[i], self.kernel_sizes[i], self.norm_name, self.act_name,
                dropout, self.use_res_block, self.learnable_interpolation,
                attn[i], emb_dim,
            )
            for i in range(1, self.depth)
        ]
        self.decoders = [
            UpBlock(
                self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i + 1],
                self.strides[i + 1], self.strides[i + 1], self.norm_name,
                self.act_name, dropout, self.use_res_block,
                self.learnable_interpolation, attn[i], emb_dim,
                skip_channels=self.hid_chs[i],
            )
            for i in range(self.depth - 1)
        ]
        out_ch_hor = self.out_ch * 2 if self.estimate_variance else self.out_ch
        self.outc = BasicBlock(self.spatial_dims, out_ch_hor, 1)
        ds = self.deep_supervision
        if isinstance(ds, bool):
            ds = self.depth - 1 if ds else 0
        self.outc_ver = [
            BasicBlock(self.spatial_dims, self.out_ch, 1) for _ in range(1, ds + 1)
        ]

    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train: bool = False) -> Tuple[jnp.ndarray, list]:
        time_emb = (self.time_embedder(t)
                    if (t is not None and self.use_time_embedder) else None)
        cond_emb = None
        if condition is not None and self.cond_emb_num_classes is not None:
            cond_emb = self.cond_embedder(condition)
            if cond_mask is not None:
                cond_emb = cond_emb * cond_mask.astype(cond_emb.dtype)[:, None]
        emb = save_add(time_emb, cond_emb)
        if emb is not None:
            # keep bf16 (compute_dtype) programs bf16: the f32 sinusoidal
            # embedding otherwise re-promotes every downstream activation
            emb = emb.astype(x_t.dtype)

        if self.use_self_conditioning:
            sc = jnp.zeros_like(x_t) if self_cond is None else self_cond
            x_t = jnp.concatenate([x_t, sc], axis=-1)

        x = [None] * self.depth
        x[0] = self.inc(x_t, emb, train=train)
        for i, enc in enumerate(self.encoders):
            x[i + 1] = enc(x[i], emb, train=train)
        for i in range(len(self.decoders), 0, -1):
            x[i - 1] = self.decoders[i - 1](x[i], x[i - 1], emb, train=train)

        y = self.outc(x[0], train=train)
        y_ver = [head(x[i + 1], train=train) for i, head in enumerate(self.outc_ver)]
        return y, y_ver
