"""Fused GroupNorm + SiLU Pallas TPU kernel.

The UNet/VAE hot path is Conv -> GroupNorm -> SiLU (conv_blocks.py:134-192
order). XLA fuses the elementwise tail but materializes the normalization
stats pass separately; this kernel computes stats + normalize + affine + SiLU
in ONE VMEM-resident pass per batch row — one HBM read, one HBM write.

Layout: channels-last [B, *spatial, C], groups along C. Grid = (B,); each
program holds one [S, C] row block in VMEM (S = prod(spatial)). All shipped
model configs keep S*C*4B well under VMEM (latent UNet: 32*32*1024*4 = 4 MB);
:func:`fused_group_norm_silu` falls back to the pure-XLA path above that.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_VMEM_LIMIT_BYTES = 3 * 1024 * 1024  # per-block cap; pipeline double-buffers in+out


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float,
            apply_silu: bool):
    """Reshape-free group statistics: channel sums are mapped to groups (and
    back) with a [C, G] membership matmul — Mosaic rejects [S, G, C/G] vector
    shape casts, and the matmul rides the MXU anyway."""
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    s, c = x.shape
    cg = c // num_groups
    # membership[c, g] = 1.0 iff channel c belongs to group g
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch_ids // cg == g_ids).astype(jnp.float32)  # [C, G]

    colsum = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    mean_g = jax.lax.dot_general(colsum, member, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / (s * cg)  # [1, G]
    mean_c = jax.lax.dot_general(mean_g, member, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [1, C]
    xc = x - mean_c
    sqsum = jnp.sum(xc * xc, axis=0, keepdims=True)  # [1, C]
    var_g = jax.lax.dot_general(sqsum, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / (s * cg)
    var_c = jax.lax.dot_general(var_g, member, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    xn = xc * jax.lax.rsqrt(var_c + eps) * scale_ref[0] + bias_ref[0]
    if apply_silu:
        xn = xn * jax.nn.sigmoid(xn)
    o_ref[0] = xn.astype(o_ref.dtype)


def group_norm_silu_reference(x, scale, bias, num_groups: int, eps: float = 1e-5,
                              apply_silu: bool = True):
    """Pure-XLA reference/fallback (identical math, fp32 stats)."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    xn = xn * scale + bias
    if apply_silu:
        xn = xn * jax.nn.sigmoid(xn)
    return xn.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu",
                                             "c_tile", "interpret"))
def _pallas_group_norm_silu(x, scale, bias, num_groups: int, eps: float,
                            apply_silu: bool, c_tile: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c = x.shape[0], x.shape[-1]
    s = math.prod(x.shape[1:-1])
    cg = c // num_groups
    x2 = x.reshape(b, s, c)
    # Grid tiles the channel dim by whole groups: each block holds every
    # spatial position of c_tile channels (c_tile/cg complete groups), so the
    # stats are block-local and VMEM stays ~s*c_tile*4 bytes.
    kernel = functools.partial(_kernel, num_groups=c_tile // cg, eps=eps,
                               apply_silu=apply_silu)
    out = pl.pallas_call(
        kernel,
        grid=(b, c // c_tile),
        in_specs=[
            pl.BlockSpec((1, s, c_tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c_tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_gn_diff(x, scale, bias, num_groups, eps, apply_silu, c_tile, interpret):
    return _pallas_group_norm_silu(x, scale, bias, num_groups, eps, apply_silu,
                                   c_tile, interpret)


def _fused_gn_diff_fwd(x, scale, bias, num_groups, eps, apply_silu, c_tile,
                       interpret):
    out = _pallas_group_norm_silu(x, scale, bias, num_groups, eps, apply_silu,
                                  c_tile, interpret)
    return out, (x, scale, bias)


def _fused_gn_diff_bwd(num_groups, eps, apply_silu, c_tile, interpret, res, g):
    # Backward recomputes through the identical-math XLA reference — GN stats
    # are cheap relative to the surrounding convs, and XLA fuses the whole VJP.
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_silu_reference(x_, s_, b_, num_groups,
                                                     eps, apply_silu),
        x, scale, bias)
    return vjp(g)


_fused_gn_diff.defvjp(_fused_gn_diff_fwd, _fused_gn_diff_bwd)


def fused_group_norm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5,
                          apply_silu: bool = True, interpret: bool = False):
    """GroupNorm(+SiLU), Pallas when the row block fits VMEM, XLA otherwise.

    Differentiable: the Pallas path carries a custom VJP whose backward
    recomputes via :func:`group_norm_silu_reference` (identical fp32 math)."""
    s = math.prod(x.shape[1:-1])
    c = x.shape[-1]
    if c % num_groups != 0:
        return group_norm_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
    cg = c // num_groups
    unit = math.lcm(cg, 128)  # whole groups, lane-aligned
    if c % unit != 0 or s * unit * 4 > _VMEM_LIMIT_BYTES:
        return group_norm_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
    # largest unit-multiple tile that divides C and fits the VMEM budget
    c_tile = unit
    for mult in range(c // unit, 0, -1):
        cand = unit * mult
        if c % cand == 0 and s * cand * 4 <= _VMEM_LIMIT_BYTES:
            c_tile = cand
            break
    interpret = interpret or jax.default_backend() == "cpu"  # no Mosaic on CPU
    return _fused_gn_diff(x, scale, bias, num_groups, eps, apply_silu,
                          c_tile, interpret)
