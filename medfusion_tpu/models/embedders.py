"""Time & label embedders.

Parity with ``/root/reference/medical_diffusion/models/embedders/``:
* ``SinusoidalPosEmb`` — time_embedder.py:7-28 (sin|cos concat, optional flip,
  odd-dim zero pad, downscale_freq_shift).
* ``LearnedSinusoidalPosEmb`` — time_embedder.py:31-48 (crowsonkb).
* ``TimeEmbedding`` — time_embedder.py:52-75 (pos-emb(dim/4) -> Linear -> SiLU
  -> Linear(dim); reference typo 'TimeEmbbeding' not carried over).
* ``LabelEmbedder`` — cond_embedders.py:6-24 (nn.Embedding lookup).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from medfusion_tpu.nn.blocks import Dense, make_act


class SinusoidalPosEmb(nn.Module):
    emb_dim: int = 16
    downscale_freq_shift: float = 1.0
    max_period: int = 10000
    flip_sin_to_cos: bool = False

    @nn.compact
    def __call__(self, x):
        half_dim = self.emb_dim // 2
        exponent = math.log(self.max_period) / (half_dim - self.downscale_freq_shift)
        freqs = jnp.exp(-exponent * jnp.arange(half_dim, dtype=jnp.float32))
        emb = x.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        if self.flip_sin_to_cos:
            emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
        if self.emb_dim % 2 == 1:
            emb = jnp.pad(emb, ((0, 0), (0, 1)))
        return emb


class LearnedSinusoidalPosEmb(nn.Module):
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        half_dim = self.emb_dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half_dim,))
        x = x.astype(jnp.float32)[:, None]
        freqs = x * w[None, :] * 2 * math.pi
        out = jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        if self.emb_dim % 2 == 1:
            out = jnp.pad(out, ((0, 0), (0, 1)))
        return out


class TimeEmbedding(nn.Module):
    """pos_emb(emb_dim//4) -> Linear(emb_dim) -> SiLU -> Linear(emb_dim)."""

    emb_dim: int = 64
    pos_embedder: type = SinusoidalPosEmb
    pos_emb_dim: Optional[int] = None
    act_name: tuple = ("SWISH", {})

    @nn.compact
    def __call__(self, time):
        pos_dim = self.pos_emb_dim if self.pos_emb_dim is not None else self.emb_dim // 4
        h = self.pos_embedder(pos_dim, name="pos_embedder")(time)
        h = Dense(self.emb_dim, name="linear_0")(h)
        h = make_act(self.act_name)(h)
        return Dense(self.emb_dim, name="linear_1")(h)


class LabelEmbedder(nn.Module):
    """Integer label -> learned embedding [B, emb_dim]."""

    emb_dim: int = 32
    num_classes: int = 2

    @nn.compact
    def __call__(self, condition):
        # torch nn.Embedding init: N(0, 1)
        table = nn.Embed(
            self.num_classes,
            self.emb_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="embedding",
        )
        return table(condition.astype(jnp.int32))
