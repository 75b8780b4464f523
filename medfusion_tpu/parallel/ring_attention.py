"""Sequence-parallel exact attention over a mesh axis (ring attention).

Beyond-reference capability (the reference's attention materializes the full
[B*H, N, N'] matrix on one device, ``attention_blocks.py:35-43``, and its
token counts cap at 32*32=1024 — SURVEY.md §5 marks sequence parallelism
out-of-scope for parity but asks the mesh abstraction to accommodate it).
This module provides it TPU-natively:

* tokens (the flattened spatial axis) are sharded over a mesh axis;
* each device holds one Q/K/V block and rotates the K/V blocks around the
  ring with ``lax.ppermute`` (ICI neighbor exchanges, no all-gather);
* partial results merge with the numerically-stable online-softmax
  (flash-attention) accumulation, so the result is EXACT full attention.

Communication cost: (n_dev - 1) neighbor exchanges of the local K/V block —
bandwidth-optimal on a ring — while attention memory stays
O(N_local * N_local) per device instead of O(N^2).

Matches :func:`medfusion_tpu.nn.attention.compute_attention` semantics
(double-scaled q·k with ``scale``, softmax, ·v) so it can slot under any
attention module when token counts outgrow one chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_attention_local(q, k, v, scale: float, axis_name: str):
    """Per-shard body: q/k/v are the LOCAL [B, H, n_loc, D] blocks."""
    n_dev = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    qs = (q * scale).astype(jnp.float32)
    # derive the accumulators from q so they carry its device-varying type
    # (shard_map vma typing: constants are 'replicated', loop carries must
    # round-trip unchanged)
    acc0 = jnp.zeros_like(qs)  # [B, H, n_loc, D]
    l0 = jnp.zeros_like(qs[..., 0])  # [B, H, n_loc]
    m0 = jnp.zeros_like(qs[..., 0]) - jnp.inf

    def accumulate(k_cur, v_cur, m, l, acc):
        s = jnp.einsum("bhnd,bhmd->bhnm", qs, (k_cur * scale).astype(jnp.float32))
        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p, v_cur.astype(jnp.float32))
        return m_new, l, acc

    # held block first, THEN rotate-and-accumulate n_dev-1 times — rotating
    # inside every iteration would issue one extra K/V neighbor exchange
    # whose result is never consumed (XLA cannot elide a collective)
    m, l, acc = accumulate(k, v, m0, l0, acc0)

    def body(_, carry):
        k_cur, v_cur, m, l, acc = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        m, l, acc = accumulate(k_cur, v_cur, m, l, acc)
        return k_cur, v_cur, m, l, acc

    _, _, _, l, acc = jax.lax.fori_loop(0, n_dev - 1, body, (k, v, m, l, acc))
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, scale: float, axis: str = "data"):
    """Exact attention with the token axis sharded over ``mesh[axis]``.

    q, k, v: [B, H, N, D] with N divisible by the axis size. ``scale`` is
    applied to BOTH q and k (the reference's double-scale convention,
    attention_blocks.py:35-43). Returns [B, H, N, D], token-sharded.
    """
    spec = P(None, None, axis, None)
    # relax the replication/vma check under whichever kwarg this jax spells
    # it as (a dead try/except around CONSTRUCTION never catches anything:
    # old jax fails at call time, not at shard_map construction)
    import inspect

    params = inspect.signature(shard_map).parameters
    extra = ({"check_vma": False} if "check_vma" in params else
             {"check_rep": False} if "check_rep" in params else {})
    fn = shard_map(partial(_ring_attention_local, scale=scale,
                           axis_name=axis),
                   mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                   **extra)
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return fn(q, k, v)
