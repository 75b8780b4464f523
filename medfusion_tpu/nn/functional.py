"""Low-level functional ops with exact PyTorch/MONAI semantics, channels-last.

Parity notes (reference file:line):
* ``get_padding`` — MONAI ``dynunet_block.get_padding``: pad = (k - s + 1) // 2
  per spatial dim (used by every conv in conv_blocks.py).
* ``interpolate_nearest_exact`` — torch ``F.interpolate(mode='nearest-exact')``
  (conv_blocks.py:124, the only upsampling mode on the main path).
* ``interpolate_area`` — torch ``F.interpolate(mode='area')`` == adaptive
  average pooling (deep-supervision target downscaling,
  diffusion_pipeline.py:142,181; latent_embedders.py:545).
* torch-style initializers for conv/linear so from-scratch training matches the
  reference's init distribution (kaiming_uniform(a=sqrt(5)) + fan-in uniform bias).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

IntOrSeq = Union[int, Sequence[int]]


def ensure_tuple(x: IntOrSeq, n: int) -> Tuple[int, ...]:
    if isinstance(x, (tuple, list)):
        assert len(x) == n, f"expected length {n}, got {x}"
        return tuple(int(v) for v in x)
    return (int(x),) * n


def get_padding(kernel_size: IntOrSeq, stride: IntOrSeq, n: int) -> Tuple[int, ...]:
    """MONAI get_padding: (k - s + 1) // 2 per dim (must be >= 0)."""
    k = ensure_tuple(kernel_size, n)
    s = ensure_tuple(stride, n)
    pad = tuple((ki - si + 1) // 2 for ki, si in zip(k, s))
    if min(pad) < 0:
        raise ValueError(f"padding < 0 for kernel {k} stride {s}")
    return pad


def up_output_shape(
    in_shape: Sequence[int], kernel_size: IntOrSeq, stride: IntOrSeq
) -> Tuple[int, ...]:
    """BasicUp.calc_shape (conv_blocks.py:101-102):
    (size-1)*stride + kernel - 2*get_padding(kernel, stride)."""
    n = len(in_shape)
    k = ensure_tuple(kernel_size, n)
    s = ensure_tuple(stride, n)
    p = get_padding(k, s, n)
    return tuple((sz - 1) * si + ki - 2 * pi for sz, ki, si, pi in zip(in_shape, k, s, p))


def _take_or_repeat(x: jnp.ndarray, idx: np.ndarray, axis: int,
                    in_sz: int, out_sz: int) -> jnp.ndarray:
    """Apply a constant per-axis resize index. When the index is exactly an
    integer-ratio repeat ([0,0,1,1,...] for 2x — true for every nearest AND
    nearest-exact integer upscale), use expand+broadcast+reshape instead of
    ``jnp.take``: XLA lowers the constant-index gather as a real gather on
    TPU while the broadcast is a free layout op (decode-path win, PARITY.md
    round-5 decode roofline). Bit-identical elements either way."""
    r = out_sz // in_sz
    if r * in_sz == out_sz and np.array_equal(
            idx, np.repeat(np.arange(in_sz), r)):
        ax = axis
        x = jnp.expand_dims(x, ax + 1)
        shape = x.shape[:ax + 1] + (r,) + x.shape[ax + 2:]
        x = jnp.broadcast_to(x, shape)
        return x.reshape(x.shape[:ax] + (out_sz,) + x.shape[ax + 2:])
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def interpolate_nearest_exact(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest-exact') for channels-last [B, *spatial, C].

    src = min(floor((dst + 0.5) * in/out), in-1) per dim.
    """
    spatial = x.shape[1:-1]
    assert len(spatial) == len(size)
    for axis, (in_sz, out_sz) in enumerate(zip(spatial, size)):
        if in_sz == out_sz:
            continue
        scale = in_sz / out_sz
        idx = np.minimum(np.floor((np.arange(out_sz) + 0.5) * scale).astype(np.int32), in_sz - 1)
        x = _take_or_repeat(x, idx, axis + 1, in_sz, out_sz)
    return x


# "phase4" = four separate 2x2 phase convs (the measured round-5 default);
# "stacked" = the same four phase kernels stacked along output channels in
# ONE (1,1)-padded 2x2 conv + phase slicing — identical math. A/B'd on the
# v5e (tools/decode_profile.py --up-ab, DECODE_UPAB_r05.json): stacked
# LOSES narrowly at the shipped widths (decode 21.28 vs 21.05 ms, UNet step
# 10.10 vs 10.07) — the 4C-output conv does not pay for its extra padding
# row/col at C>=64. phase4 stays the default by measurement.
FUSED_UP_VARIANT = "phase4"


def fused_up2x_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray | None,
                    s2d_out: bool = False) -> jnp.ndarray:
    """``conv3x3(nearest-2x-upsample(x))`` as FOUR 2x2 phase convs on the
    LOW-RES grid + pixel-shuffle interleave — the same linear map with
    16 MACs per output pixel instead of 36 (2.25x fewer FLOPs).

    Exactness: every 3x3 window on the 2x-upsampled grid (source index
    ``j//2``, true for nearest AND nearest-exact at integer ratio 2) reads at
    most 2 distinct source pixels per axis; taps that land on the same source
    pixel have their WEIGHTS summed, so each output parity class
    (even/odd row x even/odd col) is an exact 2x2 convolution:

    * even outputs ``2m``:   upsampled rows (2m-1, 2m, 2m+1) -> sources
      (m-1, m, m) -> row taps ``[w0, w1+w2]`` over (m-1, m), pad (1, 0);
    * odd outputs ``2m+1``:  sources (m, m, m+1) -> ``[w0+w1, w2]`` over
      (m, m+1), pad (0, 1).

    f32 outputs match the unfused path to ~2e-7 max-rel (one weight-add
    reassociation per tap pair); gradients are the transposed phase convs.
    NHWC / HWIO (3, 3, I, O); upsample+conv FLOPs are ~46% of the VAE decode
    and the UNet decoder's BasicUp path (PARITY.md round-5 decode roofline).
    """
    w = kernel
    even = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], w.dtype)
    odd = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]], w.dtype)

    def phase_kernel(pr, pc):
        comb_r, comb_c = (even, odd)[pr], (even, odd)[pc]
        return jnp.einsum("ri,cj,ijab->rcab", comb_r, comb_c, w)

    b, h, wd, _ = x.shape
    c = w.shape[-1]
    if FUSED_UP_VARIANT == "stacked":
        # ONE 2x2 conv with the four phase kernels STACKED along output
        # channels on a (1,1)-padded input — identical per-channel dot
        # products, but a single conv with 4x the output channels (full
        # MXU lane utilization at the decoder's 64-ch levels) instead of
        # four narrow ones. Window position i on the padded input covers
        # sources (i-1, i): even phases read rows [0:h] (sources m-1, m),
        # odd phases read rows [1:h+1] (sources m, m+1) of the SAME conv.
        ks = jnp.concatenate([phase_kernel(0, 0), phase_kernel(0, 1),
                              phase_kernel(1, 0), phase_kernel(1, 1)],
                             axis=-1)
        yp = jax.lax.conv_general_dilated(
            x, ks, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        phases = [yp[:, :h, :wd, 0:c], yp[:, :h, 1:, c:2 * c],
                  yp[:, 1:, :wd, 2 * c:3 * c], yp[:, 1:, 1:, 3 * c:]]
    else:
        pads = {0: (1, 0), 1: (0, 1)}
        phases = [jax.lax.conv_general_dilated(
            x, phase_kernel(pr, pc), (1, 1), [pads[pr], pads[pc]],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for pr, pc in ((0, 0), (0, 1), (1, 0), (1, 1))]
    if s2d_out:
        # space-to-depth layout (phase-block channel order q*C + c,
        # q = pr*2 + pc) — for the s2d decode tail, which keeps the whole
        # final decoder level on the half-res grid (see s2d_conv3x3).
        y = jnp.concatenate(phases, axis=-1)
        return y if bias is None else y + jnp.tile(bias, 4)
    y = jnp.stack(phases, axis=3)
    y = y.reshape(b, h, wd, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, 2 * h, 2 * wd, c)
    return y if bias is None else y + bias


# ---------------------------------------------------------------------------
# Space-to-depth decode tail (2D).
#
# Motivation (measured, UP_LEVEL_AB_r05.json / S2D_PROBE_r05.json): the final
# VAE decoder level runs 3x3 convs at 256^2 with C=64 — output channels map to
# MXU lanes, so C=64 caps lane utilization at 50% and the conv measures 0.17
# of v5e bf16 peak, the slowest op in the decode program. Keeping the level in
# space-to-depth layout (half-res grid, 4C channels) turns each 3x3 conv into
# ONE 2x2 conv with 4C in / 4C out channels (full lanes; 16/9 the MACs but
# ~2.6x the measured rate), GroupNorm into an exact phase-aware reduction, and
# the 1x1 head into a block-diagonal matmul, with a single depth-to-space at
# the very end. All maps below are EXACT (same linear algebra, reassociated).
#
# Layout convention: channel index q*C + c with phase q = pr*2 + pc, where
# (pr, pc) = (row, col) parity of the full-res pixel (matches the
# fused_up2x_conv stacked-variant phase order).
# ---------------------------------------------------------------------------

# tap map of the s2d 2x2 window: for output-row parity p, kernel row dr of the
# original 3x3 conv lands at (window offset a, input row-phase q) — and the
# same table applies to columns. Derivation in s2d_conv3x3's docstring.
_S2D_TAPS = {
    (0, 0, 1): 0, (0, 1, 0): 1, (0, 1, 1): 2,  # even parity: (p, a, q) -> dr
    (1, 0, 0): 0, (1, 0, 1): 1, (1, 1, 0): 2,  # odd parity
}


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2h, 2w, C) -> (B, h, w, 4C), phase-block channel order q*C + c."""
    b, H, W, c = x.shape
    y = x.reshape(b, H // 2, 2, W // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, H // 2, W // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, 4C) -> (B, 2h, 2w, C) — inverse of space_to_depth2."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def s2d_kernel_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> the (2, 2, 4Cin, 4Cout) space-to-depth kernel.

    Block (qin, qout) of window tap (a, b) is W[dr, dc] when the tap table
    maps ((pr, a, qr) -> dr, (pc, b, qc) -> dc) for qin = qr*2+qc,
    qout = pr*2+pc, else zero (7/16 of the blocks are zero)."""
    cin, cout = w.shape[2], w.shape[3]
    zeros = jnp.zeros((cin, cout), w.dtype)
    rows_ab = []
    for a in range(2):
        cols_ab = []
        for b in range(2):
            qin_rows = []
            for qr in range(2):
                for qc in range(2):
                    qout_cols = []
                    for pr in range(2):
                        for pc in range(2):
                            dr = _S2D_TAPS.get((pr, a, qr))
                            dc = _S2D_TAPS.get((pc, b, qc))
                            qout_cols.append(zeros if dr is None or dc is None
                                             else w[dr, dc])
                    qin_rows.append(jnp.concatenate(qout_cols, axis=-1))
            cols_ab.append(jnp.concatenate(qin_rows, axis=0))
        rows_ab.append(jnp.stack(cols_ab, axis=0))
    return jnp.stack(rows_ab, axis=0)


def s2d_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None) -> jnp.ndarray:
    """3x3 stride-1 same-pad conv, executed in space-to-depth layout.

    ``x`` is (B, h, w, 4Cin) (s2d of the (B, 2h, 2w, Cin) tensor); ``kernel``
    the ORIGINAL (3, 3, Cin, Cout) weights. Output pixel (2m+pr, 2n+pc) reads
    full-res rows 2m+pr-1 .. 2m+pr+1, i.e. s2d rows {m-1, m} for even pr and
    {m, m+1} for odd pr — so on a (1,1)-over-padded input ONE 2x2 conv with
    the 4Cout-stacked s2d kernel computes every phase; even phases slice
    window rows [0:h], odd rows [1:h+1] (same for columns). Exact: each tap
    of the original conv appears exactly once in the s2d kernel."""
    h, w = x.shape[1], x.shape[2]
    c_out = kernel.shape[-1]
    k2 = s2d_kernel_3x3(kernel)
    yp = jax.lax.conv_general_dilated(
        x, k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    phases = [yp[:, :h, :w, 0:c_out],
              yp[:, :h, 1:, c_out:2 * c_out],
              yp[:, 1:, :w, 2 * c_out:3 * c_out],
              yp[:, 1:, 1:, 3 * c_out:]]
    y = jnp.concatenate(phases, axis=-1)
    return y if bias is None else y + jnp.tile(bias, 4)


def s2d_conv1x1(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None) -> jnp.ndarray:
    """1x1 conv in s2d layout == the same (Cin, Cout) matmul per phase block."""
    b, h, w, c4 = x.shape
    cin = kernel.shape[-2]
    wmat = kernel.reshape(cin, kernel.shape[-1])
    y = jnp.einsum("bhwqc,cd->bhwqd", x.reshape(b, h, w, 4, cin), wmat)
    y = y.reshape(b, h, w, 4 * kernel.shape[-1])
    return y if bias is None else y + jnp.tile(bias, 4)


def s2d_group_norm(x: jnp.ndarray, scale: jnp.ndarray | None,
                   bias: jnp.ndarray | None, num_groups: int,
                   eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the ORIGINAL (B, 2h, 2w, C) tensor, computed in s2d
    layout: statistics reduce over (h, w, phase, channels-in-group) — the
    exact same element set as the full-res reduction (flax protocol: f32
    mean / E[x^2] stats, var = E[x^2] - E[x]^2).

    Layout discipline (measured, tools/s2d_probe3.py): the big tensor is
    touched ONLY by spatial reductions and one elementwise apply in its
    native (B, h, w, 4C) layout — an earlier version that reshaped it to
    (..., 4, g, C/g) forced relayout copies XLA could not fuse with the
    phase-sliced conv producer and erased the whole tail's win. The per-
    channel -> per-group bookkeeping happens on (B, 4C)-sized arrays."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    gsz = c // num_groups
    x32 = x.astype(jnp.float32)
    # per-s2d-channel spatial sums (fusable reductions, no relayout) ...
    s1 = jnp.sum(x32, axis=(1, 2))            # (B, 4C)
    s2 = jnp.sum(jnp.square(x32), axis=(1, 2))
    # ... folded to per-group stats on the tiny side: channel q*C + c
    # belongs to group (c // gsz) for every phase q
    grp1 = jnp.sum(s1.reshape(b, 4, num_groups, gsz), axis=(1, 3))  # (B, G)
    grp2 = jnp.sum(s2.reshape(b, 4, num_groups, gsz), axis=(1, 3))
    n = 4.0 * h * w * gsz
    mu = grp1 / n
    var = grp2 / n - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)            # (B, G)
    # per-s2d-channel gain/shift, gathered from the group stats
    group_of = jnp.tile(jnp.repeat(jnp.arange(num_groups), gsz), 4)  # (4C,)
    inv_c = inv[:, group_of]                  # (B, 4C)
    mu_c = mu[:, group_of]
    if scale is not None:
        sc4 = jnp.tile(scale.astype(jnp.float32), 4)
        gain = inv_c * sc4[None, :]
    else:
        gain = inv_c
    shift = -mu_c * gain
    if bias is not None:
        shift = shift + jnp.tile(bias.astype(jnp.float32), 4)[None, :]
    y = x32 * gain[:, None, None, :] + shift[:, None, None, :]
    return y.astype(x.dtype)


def interpolate_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest'): src = min(floor(dst * in/out), in-1)."""
    spatial = x.shape[1:-1]
    for axis, (in_sz, out_sz) in enumerate(zip(spatial, size)):
        if in_sz == out_sz:
            continue
        scale = in_sz / out_sz
        idx = np.minimum(np.floor(np.arange(out_sz) * scale).astype(np.int32), in_sz - 1)
        x = _take_or_repeat(x, idx, axis + 1, in_sz, out_sz)
    return x


def interpolate_area(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """torch F.interpolate(mode='area') == adaptive average pool, channels-last.

    Bin b covers [floor(b*in/out), ceil((b+1)*in/out)). Implemented as a per-axis
    bin-membership matmul (dense [out, in] averaging matrix) — MXU-friendly and
    static-shaped.
    """
    spatial = x.shape[1:-1]
    for axis, (in_sz, out_sz) in enumerate(zip(spatial, size)):
        if in_sz == out_sz:
            continue
        starts = np.floor(np.arange(out_sz) * in_sz / out_sz).astype(np.int64)
        ends = np.ceil((np.arange(out_sz) + 1) * in_sz / out_sz).astype(np.int64)
        w = np.zeros((out_sz, in_sz), dtype=np.float32)
        for b in range(out_sz):
            w[b, starts[b]:ends[b]] = 1.0 / (ends[b] - starts[b])
        x = jnp.moveaxis(
            jnp.tensordot(jnp.asarray(w, x.dtype), jnp.moveaxis(x, axis + 1, 0), axes=([1], [0])),
            0,
            axis + 1,
        )
    return x


def avg_pool_same(x: jnp.ndarray, kernel_size: IntOrSeq, stride: IntOrSeq) -> jnp.ndarray:
    """torch AvgPool with MONAI padding (count_include_pad=True, torch default)."""
    n = x.ndim - 2
    k = ensure_tuple(kernel_size, n)
    s = ensure_tuple(stride, n)
    p = get_padding(k, s, n)
    window = (1,) + k + (1,)
    strides = (1,) + s + (1,)
    padding = ((0, 0),) + tuple((pi, pi) for pi in p) + ((0, 0),)
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    return out / math.prod(k)


def save_add(*args):
    """None-tolerant sum (conv_blocks.py:16-18)."""
    args = [a for a in args if a is not None]
    return sum(args[1:], args[0]) if args else None


# ---------------------------------------------------------------------------
# torch-style initializers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on a [*k, I, O] kernel (torch conv default)."""
    fan_in = math.prod(shape[:-1])  # I * prod(k)
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on an [I, O] kernel (torch Linear default)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
