"""Fused GEGLU transformer-MLP Pallas TPU kernel.

The reference's transformer MLP (``attention_blocks.py:11-25`` GEGLU +
the ``proj_out`` linear of ``BasicTransformerBlock:200-231``) is, per
token row: LayerNorm -> Linear to 2F -> split -> h * gelu(gate) -> Linear
back to C. On the XLA path the [M, 2F] projection output and the [M, F]
gated product round-trip through HBM between the two matmuls — at the
chest 1024-token level that is ~400 MB of intermediate traffic per block
application and the measured op runs at ~33% of its matmul roofline
(tools/attn_profile.py, round 4).

This kernel streams the F dimension: grid (m_blocks, f_blocks), the
LayerNormed activation block is computed once per m block into VMEM
scratch, each f step multiplies one [C, BF] column chunk of the up
projection (h and gate halves), applies the gate in-register, and
accumulates the [BM, C] output contribution through the corresponding
[BF, C] row chunk of the down projection — no [M, 2F] or [M, F]
intermediate ever touches HBM.

Dtype policy mirrors :mod:`.flash_attention`: MXU dots in the input dtype
with f32 accumulation, LayerNorm statistics in f32 (flax's
``use_fast_variance`` formula), the gate nonlinearity evaluated in f32 on
input-dtype-rounded operands (the XLA path's own rounding points).

Differentiation: ``fused_geglu_mlp`` carries a ``jax.custom_vjp`` whose
backward re-derives gradients from the plain-XLA reference formula
(:func:`geglu_mlp_reference`) — the same recompute strategy as the fused
GroupNorm kernel (ops/group_norm.py): activation memory stays O(x), and
the backward is exactly XLA's own, fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_M = 256
DEFAULT_BLOCK_F = 512
_SQRT2 = 1.4142135623730951


def _dot(a, b):
    return jax.lax.dot_general(a, b, ((((1,), (0,))), ((), ())),
                               preferred_element_type=jnp.float32)


def _gelu_exact_f32(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / _SQRT2))


def _erf_approx_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below the bf16 rounding the production path carries). Mosaic has no
    ``erf`` lowering (NotImplementedError at compile), so the kernel uses
    this; the XLA reference keeps the exact erf."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel_f32(x):
    return x * 0.5 * (1.0 + _erf_approx_f32(x / _SQRT2))


def _layernorm_f32(x, scale, bias, eps=1e-5):
    """flax nn.LayerNorm(use_fast_variance=True) math in f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def geglu_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Plain-XLA reference: the exact module-path formula
    (nn/attention.py GEGLU + proj_out). x: [M, C]; w1: [C, 2F] with the h
    half in columns [:F] and the gate half in [F:]; w2: [F, C]."""
    in_dt = x.dtype
    f = w2.shape[0]
    xn = _layernorm_f32(x, ln_scale, ln_bias).astype(in_dt)
    proj = (xn @ w1 + b1).astype(in_dt)
    h, gate = proj[:, :f], proj[:, f:]
    g = (h.astype(jnp.float32)
         * _gelu_exact_f32(gate.astype(jnp.float32))).astype(in_dt)
    return (g @ w2 + b2).astype(in_dt)


def _kernel(x_ref, lns_ref, lnb_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref,
            w2_ref, b2_ref, o_ref, xn_scratch, acc_scratch, *, n_f_blocks):
    j = pl.program_id(1)
    in_dt = x_ref.dtype

    @pl.when(j == 0)
    def _():
        xn = _layernorm_f32(x_ref[...], lns_ref[0], lnb_ref[0])
        xn_scratch[...] = xn.astype(in_dt)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    xb = xn_scratch[...]
    h = _dot(xb, w1h_ref[...]) + b1h_ref[0].astype(jnp.float32)
    gate = _dot(xb, w1g_ref[...]) + b1g_ref[0].astype(jnp.float32)
    # round at the XLA path's own rounding points, then gate in f32
    h = h.astype(in_dt).astype(jnp.float32)
    gate = gate.astype(in_dt).astype(jnp.float32)
    g = (h * _gelu_kernel_f32(gate)).astype(in_dt)
    acc_scratch[...] += _dot(g, w2_ref[...])

    @pl.when(j == n_f_blocks - 1)
    def _():
        o_ref[...] = (acc_scratch[...]
                      + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_call(x, ln_scale, ln_bias, w1h, w1g, b1h, b1g, w2, b2,
                block_m, block_f, interpret):
    m, c = x.shape
    f, c_out = w2.shape
    n_f_blocks = f // block_f
    kernel = functools.partial(_kernel, n_f_blocks=n_f_blocks)
    return pl.pallas_call(
        kernel,
        grid=(m // block_m, n_f_blocks),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_f), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_f), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_f, c_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, c), x.dtype),
            pltpu.VMEM((block_m, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), w1h, w1g,
      b1h.reshape(1, -1), b1g.reshape(1, -1), w2, b2.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, block_m, block_f, interpret):
    f = w2.shape[0]
    return _fused_call(x, ln_scale, ln_bias, w1[:, :f], w1[:, f:], b1[:f],
                       b1[f:], w2, b2, block_m, block_f, interpret)


def _fused_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, block_m, block_f,
               interpret):
    out = _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, block_m, block_f,
                 interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_bwd(block_m, block_f, interpret, res, dout):
    # XLA-recompute backward: grads of the reference formula (identical
    # math), fused by XLA — same strategy as the fused GroupNorm
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(geglu_mlp_reference, x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(dout)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_geglu_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    block_m: int = DEFAULT_BLOCK_M,
                    block_f: int = DEFAULT_BLOCK_F,
                    interpret: bool = False):
    """LayerNorm -> GEGLU (2F up-projection, h * gelu(gate)) -> down
    projection, fused (see module docstring). x: [M, C] or [B, N, C].

    Falls back to the plain-XLA reference when the blocking does not divide
    the shapes (tiny test geometries) — like :func:`flash_attention`, an
    explicit call otherwise always runs the kernel so interpret-mode tests
    exercise the streaming accumulation for real."""
    orig_shape = x.shape
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    m, c = x.shape
    f, c_out = w2.shape
    if w1.shape != (c, 2 * f):
        raise ValueError(f"w1 {w1.shape} does not match C={c}, 2F={2 * f}")
    block_m = min(block_m, m)
    block_f = min(block_f, f)
    if (m % block_m or f % block_f or c % 128 or c_out % 128
            or block_f % 128 or block_m % 8):
        out = geglu_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2)
    else:
        interpret = interpret or jax.default_backend() == "cpu"
        out = _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, block_m, block_f,
                     interpret)
    return (out.reshape(*orig_shape[:-1], c_out)
            if len(orig_shape) > 2 else out)
