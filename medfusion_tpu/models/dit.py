"""DiT — Diffusion Transformer noise estimator (Peebles & Xie,
arXiv:2212.09748), a sixth estimator family BEYOND the reference (which
ships only convolutional UNets, /root/reference/medical_diffusion/models/
estimators/): pure-transformer latent diffusion, the TPU-natural
architecture — every FLOP is a large batched matmul on the MXU, the
token sequence is exactly the shape class the Pallas flash-attention
kernel (:mod:`medfusion_tpu.ops.flash_attention`) accelerates in BOTH
directions, and the rule-based tensor-parallel / FSDP partition specs
(:mod:`medfusion_tpu.parallel.mesh`) shard its Dense kernels with no
model-specific rules.

Architecture (faithful to the paper; no pretrained weights are loadable in
this image, so parameter naming follows this repo's explicit-child-name
convention rather than a torch checkpoint layout):

* patchify: [B,H,W,C] -> [B, N=(H/p)(W/p), p*p*C] -> Dense(hidden). A
  reshape+matmul is mathematically identical to the paper's
  kernel=stride=p conv and maps straight onto the MXU.
* fixed 2-D sin-cos positional embedding (not learned; any consistent
  coordinate order is equivalent absent pretrained weights).
* timestep embedder: 256-dim sinusoidal -> Dense -> SiLU -> Dense.
* label embedder: Embed(num_classes + 1) whose LAST row is the learned
  null (classifier-free) embedding — selected per-sample where
  ``cond_mask == 0`` (this repo's single-graph CFG convention,
  pipelines/diffusion.py) or when ``condition is None``.
* DiT block with adaLN-Zero: LayerNorm (no affine) -> modulate(shift,
  scale) -> MHSA / MLP(GELU-tanh), each residual branch scaled by a
  zero-initialized gate — so a fresh DiT is the identity + zero output
  head, matching the zero-init out-head convention of the UNet families.
* final layer: adaLN modulate -> zero-init Dense to p*p*out_ch ->
  unpatchify. ``learn_sigma`` doubles the output channels for the
  pipeline's ``estimate_variance`` channel-split contract.

Interface matches every other estimator family:
``(x_t, t, condition, self_cond, cond_mask, train) -> (pred, [])``.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _xavier(scale: float = 1.0):
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def sincos_2d_pos_embed(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h*w, embed_dim] fixed 2-D sin-cos positional table (paper App. A /
    the standard MAE recipe): half the channels encode the row coordinate,
    half the column, each as an interleaved sin/cos frequency bank."""
    if embed_dim % 4 != 0:
        raise ValueError("sincos_2d_pos_embed needs embed_dim % 4 == 0")

    def one_axis(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    emb = np.concatenate(
        [one_axis(embed_dim // 2, gy), one_axis(embed_dim // 2, gx)], axis=1)
    return emb.astype(np.float32)


class DiTTimestepEmbedder(nn.Module):
    """256-dim sinusoidal frequencies -> MLP (paper §3.2)."""

    hidden_size: int
    freq_embed_size: int = 256

    @nn.compact
    def __call__(self, t):
        half = self.freq_embed_size // 2
        freqs = jnp.exp(
            -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        h = nn.Dense(self.hidden_size, kernel_init=nn.initializers.normal(0.02),
                     name="mlp_0")(emb)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size,
                        kernel_init=nn.initializers.normal(0.02),
                        name="mlp_2")(h)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """Transformer block with adaLN-Zero conditioning (paper Fig. 3).

    ``moe_experts`` swaps the dense MLP for a routed expert MLP
    (:class:`medfusion_tpu.parallel.moe.MoEMLP` — expert-parallel under a
    mesh, DiT-MoE style); attention stays dense.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    moe_experts: Optional[int] = None
    moe_num_selected: int = 2
    moe_capacity_factor: float = 1.25
    moe_expert_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * self.hidden_size,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN_modulation")(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          name="norm1")
        h = _modulate(ln(x), shift_msa, scale_msa)
        qkv = nn.Dense(3 * self.hidden_size, kernel_init=_xavier(),
                       name="attn_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # double-scale convention of compute_attention: (q*s)(k*s) = qk/sqrt(d)
        from medfusion_tpu.nn.attention import compute_attention

        head_dim = self.hidden_size // self.num_heads
        a = compute_attention(q, k, v, self.num_heads, head_dim ** -0.25)
        a = nn.Dense(self.hidden_size, kernel_init=_xavier(),
                     name="attn_proj")(a)
        x = x + gate_msa[:, None, :] * a

        ln2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                           name="norm2")
        h2 = _modulate(ln2(x), shift_mlp, scale_mlp)
        if self.moe_experts is not None:
            from medfusion_tpu.parallel.moe import MoEMLP

            h2 = MoEMLP(self.hidden_size,
                        int(self.hidden_size * self.mlp_ratio),
                        self.moe_experts,
                        num_selected=self.moe_num_selected,
                        capacity_factor=self.moe_capacity_factor,
                        expert_axis=self.moe_expert_axis,
                        name="moe_mlp")(h2)
        else:
            h2 = nn.Dense(int(self.hidden_size * self.mlp_ratio),
                          kernel_init=_xavier(), name="mlp_fc1")(h2)
            h2 = nn.gelu(h2, approximate=True)
            h2 = nn.Dense(self.hidden_size, kernel_init=_xavier(),
                          name="mlp_fc2")(h2)
        return x + gate_mlp[:, None, :] * h2


class DiTFinalLayer(nn.Module):
    hidden_size: int
    patch_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(2 * self.hidden_size,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          name="norm_final")
        x = _modulate(ln(x), shift, scale)
        return nn.Dense(self.patch_size * self.patch_size * self.out_channels,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="linear")(x)


class DiT(nn.Module):
    """Class-conditional latent Diffusion Transformer.

    ``in_ch`` latent channels, square-or-rectangular inputs whose sides are
    divisible by ``patch_size``. ``learn_sigma`` doubles the output channels
    (pipeline ``estimate_variance`` contract); ``use_self_conditioning``
    concatenates the previous x0-estimate channel-wise like the UNet family.
    """

    in_ch: int
    patch_size: int = 2
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    cond_emb_num_classes: Optional[int] = None
    learn_sigma: bool = False
    use_self_conditioning: bool = False
    # DiT-MoE: every moe_every-th block's MLP becomes a routed expert MLP
    moe_experts: Optional[int] = None
    moe_every: int = 2
    moe_num_selected: int = 2
    moe_capacity_factor: float = 1.25
    moe_expert_axis: Optional[str] = None  # pin a2a sharding (moe.py)

    def setup(self):
        if self.hidden_size % self.num_heads:
            raise ValueError(
                f"hidden_size {self.hidden_size} must be divisible by "
                f"num_heads {self.num_heads}")
        if self.hidden_size % 4:
            raise ValueError("hidden_size must be divisible by 4 (the 2-D "
                             "sin-cos pos-embed splits it in quarters)")
        self.x_embedder = nn.Dense(self.hidden_size, kernel_init=_xavier(),
                                   name="x_embedder")
        self.t_embedder = DiTTimestepEmbedder(self.hidden_size,
                                              name="t_embedder")
        if self.cond_emb_num_classes is not None:
            # +1: the last row is the learned null/CFG embedding
            self.y_embedder = nn.Embed(
                self.cond_emb_num_classes + 1, self.hidden_size,
                embedding_init=nn.initializers.normal(0.02),
                name="y_embedder")
        self.blocks = [
            DiTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                     moe_experts=(self.moe_experts
                                  if self.moe_experts is not None
                                  and i % self.moe_every == self.moe_every - 1
                                  else None),
                     moe_num_selected=self.moe_num_selected,
                     moe_capacity_factor=self.moe_capacity_factor,
                     moe_expert_axis=self.moe_expert_axis,
                     name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.final_layer = DiTFinalLayer(
            self.hidden_size, self.patch_size,
            self.in_ch * (2 if self.learn_sigma else 1), name="final_layer")

    def _patchify(self, x):
        b, hh, ww, c = x.shape
        p = self.patch_size
        if hh % p or ww % p:
            raise ValueError(f"input {hh}x{ww} not divisible by patch {p}")
        gh, gw = hh // p, ww // p
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
        return x.reshape(b, gh * gw, p * p * c), gh, gw

    def _unpatchify(self, x, gh, gw, out_c):
        b = x.shape[0]
        p = self.patch_size
        x = x.reshape(b, gh, gw, p, p, out_c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, p, gw, p, C]
        return x.reshape(b, gh * p, gw * p, out_c)

    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train: bool = False):
        if self.use_self_conditioning:
            sc = jnp.zeros_like(x_t) if self_cond is None else self_cond
            x_t = jnp.concatenate([x_t, sc], axis=-1)
        tokens, gh, gw = self._patchify(x_t)
        x = self.x_embedder(tokens)
        pos = jnp.asarray(sincos_2d_pos_embed(self.hidden_size, gh, gw))
        x = x + pos[None].astype(x.dtype)

        c = self.t_embedder(jnp.zeros((x.shape[0],), jnp.int32) if t is None
                            else t)
        if self.cond_emb_num_classes is not None:
            null_row = jnp.full((x.shape[0],), self.cond_emb_num_classes,
                                jnp.int32)
            if condition is None:
                y = self.y_embedder(null_row)
            else:
                y_cond = self.y_embedder(condition.astype(jnp.int32))
                y_null = self.y_embedder(null_row)
                if cond_mask is not None:
                    m = cond_mask.astype(y_cond.dtype)[:, None]
                    y = m * y_cond + (1.0 - m) * y_null
                else:
                    y = y_cond
            c = c + y
        # cast: the f32 sinusoidal embedding must not re-promote a bf16
        # (compute_dtype) program's activations
        c = c.astype(x.dtype)

        for block in self.blocks:
            x = block(x, c)
        out = self.final_layer(x, c)
        out_c = self.in_ch * (2 if self.learn_sigma else 1)
        return self._unpatchify(out, gh, gw, out_c), []
