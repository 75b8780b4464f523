"""Blockwise (flash) attention Pallas TPU kernel.

Replaces the reference's full-matrix softmax attention
(``attention_blocks.py:35-43``: materializes [B*H, N, N']) with an online-
softmax kernel that never materializes the attention matrix in HBM. Keeps the
reference's OpenAI double scaling: logits = (q*s) . (k*s)^T, s = d^{-1/4}.

Layout [B, H, N, D]. Grid = (B*H, N/BQ); the KV loop runs inside the kernel
over N/BK blocks with running (max, sum, acc) — the standard flash recurrence.
Token counts in this framework are <= 64*64 = 4096 (SURVEY.md §5), so block
sizes of 512 keep everything in VMEM with headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_Q = 512
# Below this KV length the naive XLA softmax path is faster on-chip than the
# Pallas kernel (measured: kernel 1.55-1.59x at 1024-4096 tokens, slower at
# the 16-256-token UNet lower levels -- end-to-end A/B in PARITY.md). The
# ops package wrapper applies this; the kernel itself does not.
MIN_KV_TOKENS = 1024
DEFAULT_BLOCK_K = 512
_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, n_kv: int):
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, D]
    bq = q.shape[0]
    d = q.shape[1]
    num_kv = n_kv // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32) * scale
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_fin, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_fin[:, None]).astype(o_ref.dtype)


# pl imported lazily at module level for the kernel's pl.ds
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


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
    """q: [B, H, N, D], k/v: [B, H, M, D] -> [B, H, N, D].

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
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    if n % block_q or m % block_k:
        sm = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale), axis=-1
        )
        return jnp.einsum("bhnm,bhmd->bhnd", sm, v)
    interpret = interpret or jax.default_backend() == "cpu"  # no Mosaic on CPU

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    kernel = functools.partial(_kernel, scale=scale, block_k=block_k, n_kv=m)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
