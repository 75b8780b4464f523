"""Attention blocks — flax.linen, channels-last.

Parity with ``/root/reference/medical_diffusion/models/utils/attention_blocks.py``:

* ``compute_attention`` — OpenAI-style double scaling softmax((q*s)(k*s)^T)v with
  s = ch_per_head**-0.25 (attention_blocks.py:35-43).
* ``LinearTransformer`` — single-layer self/cross attention: GroupNorm pre-norm,
  1x1 q/k/v projections, zero-init out projection, residual iff shapes match
  (attention_blocks.py:128-195). "Linear" is the reference's name for the
  single-layer variant (it is ordinary softmax attention, not linear attention).
* ``BasicTransformerBlock`` — self-attn + optional cross-attn + GEGLU MLP
  (attention_blocks.py:200-231).
* ``SpatialTransformer`` — norm -> 1x1 in-proj -> N transformer blocks -> 1x1
  out-proj + residual (attention_blocks.py:233-288).
* ``Attention`` — dispatcher over {'none','linear','spatial'}
  (attention_blocks.py:291-335).

TPU: token counts here are <= 64*64; a fused Pallas flash-attention kernel
(:mod:`medfusion_tpu.ops.flash_attention`) can be enabled globally via
``medfusion_tpu.ops.use_flash_attention`` and is numerically equivalent.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from medfusion_tpu.nn.blocks import Dense, Norm, make_act, NormName
from medfusion_tpu.nn import functional as F


def compute_attention(q, k, v, num_heads: int, scale: float):
    """q: [B, N, H*D], k/v: [B, N', H*D] -> [B, N, H*D].

    Double-scaled softmax attention (attention_blocks.py:35-43).
    """
    from medfusion_tpu import ops

    if ops.flash_attention_enabled():
        # token-layout kernel: all heads in one program instance, no
        # b n (h d) <-> b h n d HBM transposes (round-4 measured win)
        return ops.flash_attention_tokens(q, k, v, num_heads, scale)
    from medfusion_tpu.ops.flash_attention import naive_attention

    q = rearrange(q, "b n (h d) -> b h n d", h=num_heads)
    k = rearrange(k, "b n (h d) -> b h n d", h=num_heads)
    v = rearrange(v, "b n (h d) -> b h n d", h=num_heads)
    out = naive_attention(q, k, v, scale)
    return rearrange(out, "b h n d -> b n (h d)")


def _flatten_tokens(x):
    """[B, *spatial, C] -> [B, N, C], returning spatial shape."""
    b, *spatial, c = x.shape
    return x.reshape(b, -1, c), tuple(spatial)


def _as_tokens(embedding, ndim_x):
    """Reference reshapes a 2-D embedding [B, E] to one spatial token
    (attention_blocks.py:102-103,172-173)."""
    if embedding.ndim == 2:
        return embedding[:, None, :]
    b, *_, c = embedding.shape
    return embedding.reshape(b, -1, c)


class LinearTransformer(nn.Module):
    """Single-layer self/cross attention (attention_blocks.py:128-195)."""

    spatial_dims: int
    out_channels: int
    num_heads: int
    ch_per_head: int = 32
    norm_name: NormName = ("GROUP", {"num_groups": 32, "affine": True})
    dropout: Optional[float] = None
    emb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, embedding=None, train: bool = False):
        hid = self.num_heads * self.ch_per_head
        scale = self.ch_per_head**-0.25
        x_n = Norm(self.norm_name, x.shape[-1], name="norm_x")(x, train=train)
        if embedding is None:
            emb_tok = None
        else:
            emb_tok = _as_tokens(embedding, x.ndim)
        x_tok, spatial = _flatten_tokens(x_n)
        kv_tok = x_tok if emb_tok is None else emb_tok

        if kv_tok is not x_tok and kv_tok.shape[1] == 1:
            # Single-KV-token cross-attention (the label-embedding case,
            # attention_blocks.py:172-173): softmax over ONE key is exactly
            # 1.0 for every query regardless of q/k, so the output is just
            # the value projection broadcast over tokens. Skips the full-N
            # q projection and both attention einsums (which are
            # MXU-hostile [N,D]x[D,1] gemvs) — bit-identical math, measured
            # win on the spatial-attention sampling program. to_q/to_k are
            # still applied to one token so the param tree (and the torch
            # converter contract) is unchanged.
            _ = Dense(hid, name="to_q")(x_tok[:, :1])
            _ = Dense(hid, name="to_k")(kv_tok)
            v = Dense(hid, name="to_v")(kv_tok)
            out = jnp.broadcast_to(v, (v.shape[0], x_tok.shape[1], hid))
        else:
            q = Dense(hid, name="to_q")(x_tok)
            k = Dense(hid, name="to_k")(kv_tok)
            v = Dense(hid, name="to_v")(kv_tok)
            out = compute_attention(q, k, v, self.num_heads, scale)
        out = Dense(self.out_channels, zero_init=True, name="to_out")(out)
        if self.dropout is not None:
            out = nn.Dropout(rate=float(self.dropout), deterministic=not train)(out)
        out = out.reshape(x.shape[0], *spatial, self.out_channels)
        if out.shape == x.shape:
            out = x + out
        return out


class GEGLU(nn.Module):
    """LayerNorm (over channels) -> Linear to 2*out -> x * gelu(gate)
    (attention_blocks.py:11-25). torch GELU is exact (erf)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        proj = Dense(self.out_channels * 2, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    """self-attn (+ cross-attn) + GEGLU MLP (attention_blocks.py:200-231)."""

    spatial_dims: int
    out_channels: int
    num_heads: int
    ch_per_head: int = 32
    norm_name: NormName = ("GROUP", {"num_groups": 32, "affine": True})
    dropout: Optional[float] = None
    emb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, embedding=None, train: bool = False):
        in_ch = x.shape[-1]
        x = LinearTransformer(
            self.spatial_dims, in_ch, self.num_heads, self.ch_per_head,
            self.norm_name, self.dropout, None, name="self_atn",
        )(x, train=train)
        if embedding is not None:
            x = LinearTransformer(
                self.spatial_dims, in_ch, self.num_heads, self.ch_per_head,
                self.norm_name, self.dropout, self.emb_dim, name="cros_atn",
            )(x, embedding, train=train)
        from medfusion_tpu import ops

        if (ops.fused_geglu_enabled() and self.dropout is None
                and self.out_channels == in_ch):
            # Fused LN+GEGLU+proj_out kernel (ops/geglu.py): create the SAME
            # child modules on one token so the param tree (and the torch
            # converter contract) is unchanged, then read their weights and
            # run the fused op — the 4x-expansion intermediates never touch
            # HBM. Dropout (None on every sampling path) and the
            # channels-differ branch (whose output the reference discards)
            # fall back.
            gg = GEGLU(in_ch * 4, name="geglu")
            _ = gg(x.reshape(x.shape[0], -1, in_ch)[:, :1])
            po = Dense(self.out_channels, name="proj_out")
            _ = po(jnp.zeros((1, 1, in_ch * 4), x.dtype))
            p = self.variables["params"]
            out = ops.fused_geglu_mlp(
                x,
                p["geglu"]["norm"]["scale"], p["geglu"]["norm"]["bias"],
                p["geglu"]["proj"]["linear"]["kernel"],
                p["geglu"]["proj"]["linear"]["bias"],
                p["proj_out"]["linear"]["kernel"],
                p["proj_out"]["linear"]["bias"],
            )
        else:
            h = GEGLU(in_ch * 4, name="geglu")(x)
            if self.dropout is not None:
                h = nn.Dropout(rate=float(self.dropout),
                               deterministic=not train)(h)
            out = Dense(self.out_channels, name="proj_out")(h)
        if out.shape[-1] == x.shape[-1]:
            return out + x
        return x  # parity: reference returns x (not out) when channels differ


class SpatialTransformer(nn.Module):
    """norm -> 1x1 proj_in -> N blocks -> 1x1 proj_out + residual
    (attention_blocks.py:233-288)."""

    spatial_dims: int
    out_channels: int
    num_heads: int
    ch_per_head: int = 32
    norm_name: NormName = ("GROUP", {"num_groups": 32, "affine": True})
    dropout: Optional[float] = None
    emb_dim: Optional[int] = None
    depth: int = 1

    @nn.compact
    def __call__(self, x, embedding=None, train: bool = False):
        hid = self.num_heads * self.ch_per_head
        h = Norm(self.norm_name, x.shape[-1], name="norm")(x, train=train)
        h = Dense(hid, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.spatial_dims, hid, self.num_heads, self.ch_per_head,
                self.norm_name, self.dropout, self.emb_dim, name=f"block_{i}",
            )(h, embedding, train=train)
        h = Dense(self.out_channels, name="proj_out")(h)
        if h.shape == x.shape:
            return h + x
        return h


class Attention(nn.Module):
    """Dispatcher over attention_type in {'none','linear','spatial'}
    (attention_blocks.py:291-335)."""

    spatial_dims: int
    out_channels: int
    num_heads: int = 8
    ch_per_head: int = 32
    norm_name: NormName = ("GROUP", {"num_groups": 32, "affine": True})
    dropout: Optional[float] = None
    emb_dim: Optional[int] = None
    depth: int = 1
    attention_type: str = "linear"

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False):
        if self.attention_type == "spatial":
            return SpatialTransformer(
                self.spatial_dims, self.out_channels, self.num_heads,
                self.ch_per_head, self.norm_name, self.dropout, self.emb_dim,
                self.depth, name="attention",
            )(x, emb, train=train)
        if self.attention_type == "linear":
            return LinearTransformer(
                self.spatial_dims, self.out_channels, self.num_heads,
                self.ch_per_head, self.norm_name, self.dropout, self.emb_dim,
                name="attention",
            )(x, emb, train=train)
        return x
