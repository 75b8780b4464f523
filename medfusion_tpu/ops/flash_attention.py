"""Blockwise (flash) attention Pallas TPU kernels — forward AND backward.

Replaces the reference's full-matrix softmax attention
(``attention_blocks.py:35-43``: materializes [B*H, N, N']) with an online-
softmax kernel that never materializes the attention matrix in HBM. Keeps the
reference's OpenAI double scaling: logits = (q*s) . (k*s)^T, s = d^{-1/4}.

The reference's attention sits on the TRAINING graph of every
``use_attention != 'none'`` config (attention_blocks.py:35-43 under
autograd), so this kernel must be differentiable too. ``flash_attention``
carries a :func:`jax.custom_vjp`:

* forward — the online-softmax kernel, additionally writing the per-row
  logsumexp L = m + log(sum exp(s - m)) needed to reconstruct P = exp(S - L)
  in the backward without a second softmax pass;
* backward — two Pallas kernels implementing the standard flash backward:
  with D = rowsum(dO * O),
      dV = P^T dO,   dS = P * (dO V^T - D),   dQ = s^2 dS K,   dK = s^2 dS^T Q
  (s^2 because the double scaling makes S = s^2 Q K^T). The dQ kernel tiles
  queries and loops KV blocks; the dK/dV kernel tiles KV and loops Q blocks,
  so neither re-materializes the attention matrix.

Layout [B, H, N, D]. Grid = (B*H, blocks); the inner loop runs over the other
operand's blocks with VMEM-resident accumulators. Token counts in this
framework are <= 64*64 = 4096 and head dim is <= 128 (SURVEY.md §5), so full
K/V ([N, D] <= 2 MB fp32) always fits VMEM alongside the block operands.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Round-4 on-chip sweep at the 1024-token spatial level ([32,8,1024,32]
# bf16, marginal-cost timing): full blocks win — the online-softmax
# recurrence costs more than it saves at these sizes (1024x1024 1.00 ms vs
# 512x512 1.36 vs XLA 2.33; the f32->input-dtype dot change is another
# 1.37x on top of round 3's kernel). VMEM comfortably holds the f32
# [1024,1024] probability block.
DEFAULT_BLOCK_Q = 1024
# Below this KV length the naive XLA softmax path is faster on-chip than
# the Pallas kernel. Round-4 re-sweep after the input-dtype-dot change
# (bf16, marginal-cost timing): 256 tokens/D=64 flash 0.140 ms vs XLA
# 0.226 (kernel now WINS — round 2's 1024 threshold is obsolete); 64
# tokens/D=128 XLA 0.0076 vs flash 0.095 (block padding dominates). The
# ops package wrapper applies this; the kernel itself does not.
MIN_KV_TOKENS = 256
# Layout crossover for the multi-head token-layout kernel
# (:func:`flash_attention_tokens`). Round-4 on-chip layout x block A/B
# (tools/mha_layout_ab.py, B=32 bf16, ms/application): at 256 tokens the
# token-layout kernel wins (0.121 vs head-layout 0.162 vs XLA 0.252 —
# no HBM head transposes and the whole level fits one program instance);
# at >= 1024 tokens the per-head kernel wins despite paying the
# b n (h d) <-> b h n d transposes (1024: 1.07 vs 1.39; 4096 colon level:
# 17.2 vs 19.6) because the 8-way static head unroll forces 512-capped
# blocks (scoped-VMEM budget) while the per-head kernel runs full 1024
# blocks. The ops package wrapper applies this; the kernel itself does not.
HEAD_LAYOUT_MIN_TOKENS = 1024
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e30


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                block_k: int, n_kv: int):
    # MXU dots run in the INPUT dtype with f32 accumulation (_dot's
    # preferred_element_type): for bf16 inputs this is numerically identical
    # to upcasting first (bf16 products are exact in f32) but runs at the
    # bf16 MXU rate instead of the ~4x-slower f32 passes — measured 2x on
    # the 1024-token spatial level. Softmax statistics stay f32; only the
    # probability block is rounded back to the input dtype for the p.v dot,
    # exactly the naive XLA path's own bf16 semantics (f32 inputs round-trip
    # unchanged, so the interpret-mode equivalence tests are bit-identical).
    in_dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, in_dt)  # [BQ, D]
    bq = q.shape[0]
    d = q.shape[1]
    num_kv = n_kv // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :] * jnp.asarray(scale, in_dt)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = _dot(q, k, ((1,), (1,)))  # [BQ, BK] f32
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + _dot(p.astype(in_dt), v, ((1,), (0,)))
        return m_new, l_new, acc

    m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m_fin, l_fin, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_fin[:, None]).astype(o_ref.dtype)
    # lse is laid out [BH, N, 1]: queries on the sublane dim (Mosaic requires
    # the last two block dims to be (8k, 128k) or full — (BQ, 1) qualifies),
    # and [BQ, 1] is directly the column shape the backward kernels broadcast.
    lse_ref[0] = (m_fin + jnp.log(l_fin))[:, None].astype(lse_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                   sc2: float, block_k: int, n_kv: int):
    """dQ = s^2 * sum_j P_j (dO V_j^T - D) K_j, queries tiled, KV looped.

    Same dtype policy as the forward: dots in the input dtype with f32
    accumulation, statistics and the ds product in f32 (rounded back to the
    input dtype only as a dot operand — a no-op for f32 inputs)."""
    in_dt = q_ref.dtype
    q = q_ref[0]  # [BQ, D]
    do = do_ref[0]  # [BQ, Dv]
    lse = lse_ref[0].astype(jnp.float32)  # [BQ, 1]
    delta = delta_ref[0].astype(jnp.float32)  # [BQ, 1]
    num_kv = n_kv // block_k

    def body(i, acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = sc2 * _dot(q, k, ((1,), (1,)))  # [BQ, BK] f32
        p = jnp.exp(s - lse)
        dp = _dot(do, v, ((1,), (1,)))  # [BQ, BK] f32
        ds = p * (dp - delta)
        return acc + _dot(ds.astype(in_dt), k, ((1,), (0,)))  # [BQ, D]

    acc0 = jnp.zeros(q.shape, jnp.float32)
    acc = jax.lax.fori_loop(0, num_kv, body, acc0)
    dq_ref[0] = (sc2 * acc).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                    dv_ref, *, sc2: float, block_q: int, n_q: int):
    """dK = s^2 dS^T Q, dV = P^T dO — KV tiled, queries looped. Input-dtype
    dots with f32 accumulation (see :func:`_bwd_dq_kernel`)."""
    in_dt = k_ref.dtype
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]  # [BK, Dv]
    num_q = n_q // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)  # [BQ, 1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = sc2 * _dot(q, k, ((1,), (1,)))  # [BQ, BK] f32
        p = jnp.exp(s - lse)
        dv_acc = dv_acc + _dot(p.astype(in_dt), do, ((0,), (0,)))  # [BK, Dv]
        dp = _dot(do, v, ((1,), (1,)))  # [BQ, BK] f32
        ds = p * (dp - delta)
        dk_acc = dk_acc + _dot(ds.astype(in_dt), q, ((0,), (0,)))  # [BK, D]
        return dk_acc, dv_acc

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = (sc2 * dk_acc).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _fwd_call(q, k, v, scale, block_q, block_k, interpret):
    """Run the forward kernel; returns (o [BH,N,D], lse [BH,N]) flattened."""
    bh, n, d = q.shape
    m = k.shape[1]
    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=block_k, n_kv=m)
    return pl.pallas_call(
        kernel,
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    o, _ = _fwd_call(q, k, v, scale, block_q, block_k, interpret)
    return o


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _fwd_call(q, k, v, scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    bh, n, d = q.shape
    m = k.shape[1]
    sc2 = scale * scale
    # D_i = rowsum(dO * O): cheap elementwise+reduce, left to XLA fusion.
    # [BH, N, 1] — same sublane-major layout as lse.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)

    dq_kernel = functools.partial(_bwd_dq_kernel, sc2=sc2, block_k=block_k, n_kv=m)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dkv_kernel = functools.partial(_bwd_dkv_kernel, sc2=sc2, block_q=block_q, n_q=n)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, m // block_k),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m, d), k.dtype),
            jax.ShapeDtypeStruct((bh, m, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def naive_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Reference XLA attention with the double-scale convention
    ((q*scale)·(k*scale), attention_blocks.py:35-43) — the ONE definition
    shared by the kernel's non-dividing-shape fallback, the short-sequence
    dispatch in the ops wrapper, and the flash-disabled module path."""
    sm = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale), axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", sm, v)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: [B, H, N, D], k/v: [B, H, M, D] -> [B, H, N, D]. Differentiable.

    ``scale`` is applied to BOTH q and k (reference double scaling). Falls back
    to the naive einsum path ONLY for shapes the blocking doesn't divide
    (cross attention with a single embedding token, tiny test shapes) — an
    explicit call always runs the kernel where possible, so the interpret-mode
    equivalence tests genuinely exercise the flash recurrence. The
    speed-motivated short-sequence dispatch (``MIN_KV_TOKENS``) lives in the
    :mod:`medfusion_tpu.ops` package wrapper, not here.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    if jnp.dtype(q.dtype).itemsize >= 4:
        # f32 operands double every VMEM-resident block; full 1024 blocks
        # exceed the 16 MB scoped-vmem budget on v5e. 512 is the measured
        # round-3 f32 sweet spot (the bf16 sampling path keeps full blocks).
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    # fall back when the blocking doesn't divide OR the KV side is tiny
    # (m < 8 — e.g. single-embedding-token cross attention — would run the
    # Mosaic kernel with a sub-sublane [BQ, m] tile for no possible gain)
    if n % block_q or m % block_k or m < 8:
        return naive_attention(q, k, v, scale)
    interpret = interpret or jax.default_backend() == "cpu"  # no Mosaic on CPU

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    out = _flash(qf, kf, vf, scale, block_q, block_k, interpret)
    return out.reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# Token-layout multi-head kernel (round 4): [B, N, H*D] in, [B, N, H*D] out.
# One program instance per (batch, q-block) computes ALL heads from the
# layout the transformer blocks naturally hold, so the b n (h d) -> b h n d
# rearrange transposes (2 HBM round-trips of every operand) disappear, and
# per-instance overheads amortize across heads. The per-head math is the
# same online-softmax recurrence as _fwd_kernel.
# ---------------------------------------------------------------------------


def _fwd_mha_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                    num_heads: int, block_k: int, n_kv: int):
    in_dt = q_ref.dtype
    hd = q_ref.shape[-1]
    d = hd // num_heads
    num_kv = n_kv // block_k
    sc = jnp.asarray(scale, in_dt)
    lses = []
    for h in range(num_heads):  # static unroll; lane-offset slices stay in VMEM
        lo = h * d
        q = q_ref[0, :, lo:lo + d] * sc
        bq = q.shape[0]

        def body(i, carry, lo=lo):
            m_prev, l_prev, acc = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), lo:lo + d] * sc
            v = v_ref[0, pl.ds(i * block_k, block_k), lo:lo + d]
            s = _dot(q, k, ((1,), (1,)))  # [BQ, BK] f32
            m_cur = jnp.max(s, axis=1)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new[:, None])
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1)
            acc = acc * alpha[:, None] + _dot(p.astype(in_dt), v, ((1,), (0,)))
            return m_new, l_new, acc

        m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq,), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        m_fin, l_fin, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
        o_ref[0, :, lo:lo + d] = (acc / l_fin[:, None]).astype(o_ref.dtype)
        lses.append((m_fin + jnp.log(l_fin))[:, None])
    lse_ref[0] = jnp.concatenate(lses, axis=1).astype(lse_ref.dtype)


def _fwd_mha_call(q, k, v, num_heads, scale, block_q, block_k, interpret):
    b, n, hd = q.shape
    m = k.shape[1]
    kernel = functools.partial(_fwd_mha_kernel, scale=scale,
                               num_heads=num_heads, block_k=block_k, n_kv=m)
    return pl.pallas_call(
        kernel,
        grid=(b, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, num_heads), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, n, num_heads), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _to_bhnd(x, num_heads):
    b, n, hd = x.shape
    d = hd // num_heads
    return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).reshape(
        b * num_heads, n, d)


def _from_bhnd(x, b, num_heads):
    bh, n, d = x.shape
    return x.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3).reshape(
        b, n, num_heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_mha(q, k, v, num_heads, scale, block_q, block_k, interpret):
    o, _ = _fwd_mha_call(q, k, v, num_heads, scale, block_q, block_k,
                         interpret)
    return o


def _flash_mha_fwd(q, k, v, num_heads, scale, block_q, block_k, interpret):
    o, lse = _fwd_mha_call(q, k, v, num_heads, scale, block_q, block_k,
                           interpret)
    return o, (q, k, v, o, lse)


def _flash_mha_bwd(num_heads, scale, block_q, block_k, interpret, res, do):
    # Backward reuses the per-head [BH, N, D] kernels; the transposes it
    # pays sit on the training path only — sampling never runs this.
    q, k, v, o, lse = res
    b = q.shape[0]
    qf, kf, vf = (_to_bhnd(x, num_heads) for x in (q, k, v))
    of = _to_bhnd(o, num_heads)
    dof = _to_bhnd(do, num_heads)
    # lse [B, N, H] -> [BH, N, 1]
    lsef = lse.transpose(0, 2, 1).reshape(b * num_heads, q.shape[1], 1)
    dqf, dkf, dvf = _flash_bwd(scale, block_q, block_k, interpret,
                               (qf, kf, vf, of, lsef), dof)
    return (_from_bhnd(dqf, b, num_heads), _from_bhnd(dkf, b, num_heads),
            _from_bhnd(dvf, b, num_heads))


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def flash_attention_tokens(q, k, v, num_heads: int, scale: float,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool = False):
    """Token-layout flash attention: q [B, N, H*D], k/v [B, M, H*D] ->
    [B, N, H*D] — no head transposes on the forward path. Differentiable
    (backward routes through the per-head kernels). ``num_heads`` must
    divide the feature dim (ValueError otherwise); for any other
    non-dividing blocking it falls back to rearrange +
    :func:`flash_attention` (which itself falls back to naive XLA)."""
    b, n, hd = q.shape
    m = k.shape[1]
    if hd % num_heads:
        # no layout can split this — fail loudly instead of letting the
        # fallback's reshape raise an opaque TypeError
        raise ValueError(
            f"feature dim {hd} is not divisible by num_heads={num_heads}")
    d = hd // num_heads
    cap = 256 if jnp.dtype(q.dtype).itemsize >= 4 else 512
    # the static head unroll keeps live [BQ, BK] f32 score/probability
    # temporaries per head: full 1024x1024 blocks requested 30.5 MB (bf16,
    # hd=256) / 35.5 MB (f32) of scoped VMEM vs the 16 MB budget — 512-
    # (bf16) / 256- (f32) blocks fit with headroom (measured round 4)
    if (block_q, block_k) != (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K) and (
            block_q > cap or block_k > cap):
        warnings.warn(
            f"flash_attention_tokens: clamping explicit block sizes "
            f"({block_q}, {block_k}) to the {cap}-block scoped-VMEM cap "
            f"for dtype {q.dtype}", stacklevel=2)
    block_q, block_k = min(block_q, cap), min(block_k, cap)
    bq = min(block_q, n)
    bk = min(block_k, m)
    if n % bq or m % bk or m < 8 or d % 8 or hd % 128:
        qh = _to_bhnd(q, num_heads).reshape(b, num_heads, n, d)
        kh = _to_bhnd(k, num_heads).reshape(b, num_heads, m, d)
        vh = _to_bhnd(v, num_heads).reshape(b, num_heads, m, d)
        out = flash_attention(qh, kh, vh, scale, block_q=block_q,
                              block_k=block_k, interpret=interpret)
        return _from_bhnd(out.reshape(b * num_heads, n, d), b, num_heads)
    interpret = interpret or jax.default_backend() == "cpu"
    return _flash_mha(q, k, v, num_heads, scale, bq, bk, interpret)
