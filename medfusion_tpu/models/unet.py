"""Time/label-conditioned UNet noise estimator.

Capability parity with the reference "unet2"
(``/root/reference/medical_diffusion/models/estimators/unet2.py:15-269``):
OpenAI-style UNet — in_conv BasicBlock; encoder with ``num_res_blocks``
(ConvBlock+Attention) stages per level and BasicDown between levels, every
stage output kept as a skip; middle Conv+Attn+Conv; decoder with
``num_res_blocks+1`` stages per level each consuming one skip via channel
concat, BasicUp after the first stage of each level; zero-init out conv
(2x channels when ``estimate_variance``); optional deep-supervision heads on
the concatenated decoder states (unet2.py:212-219, 257-267).

Deviations (documented, not bugs carried over):
* Self-conditioning concatenates the actual ``self_cond`` tensor; the reference
  concatenates ``x_t`` with itself when self_cond is provided (unet2.py:245 uses
  ``x_t`` where ``self_cond`` was intended).
* Classifier-free guidance uses a per-sample ``cond_mask`` (float [B]) that
  zeroes the label embedding, replacing the reference's "pass condition=None"
  host-side branch (diffusion_pipeline.py:122-123) — this keeps a single jitted
  graph for conditional+unconditional and enables batched CFG in one forward.

Layout: NHWC/NDHWC. t is int/float [B]; condition is int [B].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from medfusion_tpu.nn.attention import Attention
from medfusion_tpu.nn.blocks import (
    BasicBlock,
    BasicDown,
    BasicUp,
    UnetBasicBlock,
    UnetResBlock,
)
from medfusion_tpu.nn.functional import save_add
from medfusion_tpu.models.embedders import LabelEmbedder, TimeEmbedding


class UNet(nn.Module):
    in_ch: int = 1
    out_ch: int = 1
    spatial_dims: int = 2
    hid_chs: Sequence[int] = (256, 256, 512, 1024)
    kernel_sizes: Sequence[int] = (3, 3, 3, 3)
    strides: Sequence[int] = (1, 2, 2, 2)  # last stride ignored (OpenAI convention)
    act_name: tuple = ("SWISH", {})
    norm_name: tuple = ("GROUP", {"num_groups": 32, "affine": True})
    time_emb_dim: Optional[int] = None  # default: hid_chs[0]*4 if None -> reference passes explicit
    use_time_embedder: bool = True
    cond_emb_num_classes: Optional[int] = None  # None -> no label conditioning
    deep_supervision: object = True  # True = depth-2 heads, int = first N heads, False/0 = none
    use_res_block: bool = True
    estimate_variance: bool = False
    use_self_conditioning: bool = False
    dropout: float = 0.0
    learnable_interpolation: bool = True
    use_attention: object = "none"  # str or list[str] per level
    # Heads per attention block: 8 with ch_per_head = hid_chs[i]//8 is the
    # reference geometry (attention_blocks.py defaults). Fewer/wider heads
    # keep the SAME q/k/v/out projection shapes and parameter count — only
    # the softmax grouping changes — and run the attention einsums up to
    # 3.93x faster on TPU (measured, tools/colon_roofline.py: the MXU
    # contracts 128-deep, so d=32 heads run at 1/4 depth). attn_heads=2 at
    # the 256-channel levels gives d=128 — the TPU-native choice for new
    # (non-parity) trainings. Must divide every attended level's width.
    attn_heads: int = 8
    num_res_blocks: int = 2
    # Rematerialize each conv/attention stage under grad (jax.checkpoint):
    # trades ~1 extra forward for O(depth) activation memory — the TPU-native
    # equivalent of the reference's vendored CheckpointFunction
    # (external/stable_diffusion/unet_openai.py grad checkpointing).
    remat: bool = False

    @property
    def depth(self) -> int:
        return len(self.strides)

    def _attn_types(self):
        ua = self.use_attention
        return list(ua) if isinstance(ua, (list, tuple)) else [ua] * self.depth

    def setup(self):
        depth = self.depth
        attn = self._attn_types()
        if self.attn_heads < 1:
            raise ValueError(f"attn_heads must be >= 1, got {self.attn_heads}")
        # Every attended width must split evenly into heads, or the q/k/v
        # projection widths silently floor (hid_chs[i]//attn_heads * attn_heads
        # != hid_chs[i]) and the param tree stops matching the documented
        # "same params at any head count" invariant. Level i attends at
        # hid_chs[i] (encoder + middle) AND hid_chs[i-1] (decoder k=0 stage).
        for i in range(1, depth):
            if attn[i] == "none":
                continue
            for ch in {self.hid_chs[i], self.hid_chs[i - 1]}:
                if ch % self.attn_heads:
                    raise ValueError(
                        f"attn_heads={self.attn_heads} does not divide attended "
                        f"level width {ch} (hid_chs={tuple(self.hid_chs)}, "
                        f"use_attention level {i}={attn[i]!r})")
        nrb = self.num_res_blocks
        t_dim = self.time_emb_dim or self.hid_chs[0] * 4
        self._time_emb_dim = t_dim if self.use_time_embedder else None
        norm, act = self.norm_name, self.act_name
        ConvBlock = UnetResBlock if self.use_res_block else UnetBasicBlock
        if self.remat:
            ConvBlock = nn.remat(ConvBlock, static_argnums=(2,))
        dropout = self.dropout if self.dropout else None

        if self.use_time_embedder:
            self.time_embedder = TimeEmbedding(emb_dim=t_dim)
        if self.cond_emb_num_classes is not None:
            self.cond_embedder = LabelEmbedder(
                emb_dim=t_dim, num_classes=self.cond_emb_num_classes
            )

        self.in_conv = BasicBlock(
            self.spatial_dims, self.hid_chs[0], self.kernel_sizes[0], self.strides[0]
        )

        # Encoder: per level i in [1, depth): nrb x (ConvBlock, Attention), then
        # BasicDown if i < depth-1 (unet2.py:71-118).
        in_blocks = []
        for i in range(1, depth):
            for k in range(nrb):
                in_blocks.append(
                    (
                        "conv_attn",
                        ConvBlock(
                            self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i], 1,
                            norm, act, dropout, emb_channels=self._time_emb_dim,
                        ),
                        Attention(
                            self.spatial_dims, self.hid_chs[i], self.attn_heads,
                            self.hid_chs[i] // self.attn_heads,
                            norm, dropout, self._time_emb_dim, 1, attn[i],
                        ),
                    )
                )
            if i < depth - 1:
                in_blocks.append(
                    (
                        "down",
                        BasicDown(
                            self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i],
                            self.strides[i], self.learnable_interpolation,
                        ),
                        None,
                    )
                )
        self.in_blocks = in_blocks

        self.middle_conv_1 = ConvBlock(
            self.spatial_dims, self.hid_chs[-1], self.kernel_sizes[-1], 1,
            norm, act, dropout, emb_channels=self._time_emb_dim,
        )
        self.middle_attn = Attention(
            self.spatial_dims, self.hid_chs[-1], self.attn_heads,
            self.hid_chs[-1] // self.attn_heads,
            norm, dropout, self._time_emb_dim, 1, attn[-1],
        )
        self.middle_conv_2 = ConvBlock(
            self.spatial_dims, self.hid_chs[-1], self.kernel_sizes[-1], 1,
            norm, act, dropout, emb_channels=self._time_emb_dim,
        )

        # Decoder (unet2.py:160-208): per level i in [1, depth): nrb+1 stages;
        # stage k=0 outputs hid_chs[i-1] (and upsamples when i>1), others hid_chs[i].
        out_blocks = []
        for i in range(1, depth):
            for k in range(nrb + 1):
                out_ch_k = self.hid_chs[i - 1 if k == 0 else i]
                up = None
                if i > 1 and k == 0:
                    up = BasicUp(
                        self.spatial_dims, out_ch_k, self.strides[i], self.strides[i],
                        self.learnable_interpolation,
                    )
                out_blocks.append(
                    (
                        ConvBlock(
                            self.spatial_dims, out_ch_k, self.kernel_sizes[i], 1,
                            norm, act, dropout, emb_channels=self._time_emb_dim,
                        ),
                        Attention(
                            self.spatial_dims, out_ch_k, self.attn_heads,
                            out_ch_k // self.attn_heads,
                            norm, dropout, self._time_emb_dim, 1, attn[i],
                        ),
                        up,
                    )
                )
        self.out_blocks = out_blocks

        out_ch_hor = self.out_ch * 2 if self.estimate_variance else self.out_ch
        self.outc = BasicBlock(self.spatial_dims, out_ch_hor, 1, zero_conv=True)
        ds = self.deep_supervision
        if isinstance(ds, bool):
            ds = depth - 2 if ds else 0
        self.outc_ver = [
            BasicBlock(self.spatial_dims, self.out_ch, 1, zero_conv=True)
            for _ in range(2, ds + 2)
        ]

    def embed(self, t=None, condition=None, cond_mask=None):
        """Summed time+label embedding (unet2.py:233-241)."""
        time_emb = self.time_embedder(t) if (t is not None and self.use_time_embedder) else None
        cond_emb = None
        if condition is not None and self.cond_emb_num_classes is not None:
            cond_emb = self.cond_embedder(condition)
            if cond_mask is not None:
                cond_emb = cond_emb * cond_mask.astype(cond_emb.dtype)[:, None]
        return save_add(time_emb, cond_emb)

    def encode_features(self, x_t, emb, self_cond=None, train: bool = False):
        """Encoder half: in_conv + down path. Returns the skip stack as a
        tuple (static structure — scan-carry compatible for the
        encoder-propagation fast sampler)."""
        if self.use_self_conditioning:
            sc = jnp.zeros_like(x_t) if self_cond is None else self_cond
            x_t = jnp.concatenate([x_t, sc], axis=-1)
        x = [self.in_conv(x_t, train=train)]
        for kind, block, attn_block in self.in_blocks:
            h = x[-1]
            if kind == "down":
                h = block(h, emb, train=train)
            else:
                h = block(h, emb, train=train)
                h = attn_block(h, emb, train=train)
            x.append(h)
        return tuple(x)

    def decode_features(self, skips, emb, train: bool = False) -> Tuple[jnp.ndarray, list]:
        """Middle + decoder half consuming the skip stack."""
        x = list(skips)
        h = self.middle_conv_1(x[-1], emb, train=train)
        h = self.middle_attn(h, emb, train=train)
        h = self.middle_conv_2(h, emb, train=train)

        y_ver = []
        nrb1 = self.num_res_blocks + 1
        for i in range(len(self.out_blocks), 0, -1):
            h = jnp.concatenate([h, x.pop()], axis=-1)
            d, j = i // nrb1, i % nrb1 - 1
            if (len(self.outc_ver) >= d > 0) and (j == 0):
                y_ver.append(self.outc_ver[d - 1](h, train=train))
            conv_block, attn_block, up = self.out_blocks[i - 1]
            h = conv_block(h, emb, train=train)
            h = attn_block(h, emb, train=train)
            if up is not None:
                h = up(h, emb, train=train)

        y = self.outc(h, train=train)
        return y, y_ver[::-1]

    def __call__(
        self,
        x_t,
        t=None,
        condition=None,
        self_cond=None,
        cond_mask=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, list]:
        emb = self.embed(t, condition, cond_mask)
        if emb is not None:
            # The sinusoidal features are computed in float32; left uncast,
            # the f32 embedding add re-promotes EVERY downstream activation
            # of a bf16 (compute_dtype) program to f32. XLA's bf16
            # propagation silently demotes the convs again on TPU, but the
            # Pallas attention custom-calls are opaque to that pass and were
            # measured running f32 dots with f32 block caps (round 4).
            emb = emb.astype(x_t.dtype)
        skips = self.encode_features(x_t, emb, self_cond, train=train)
        return self.decode_features(skips, emb, train=train)
