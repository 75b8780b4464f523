"""On-chip A/B: three separate self-attention q/k/v projections vs one
fused [C, 3*HD] matmul, at the chest spatial-attention levels (B=32, bf16).

Three arms per level, all returning q+k+v so downstream work is identical
and the marginal difference isolates the projection cost:

- ``split``: three ``x @ W_i + b_i`` dots (the shipped module layout —
  XLA sees three dots sharing one operand).
- ``fused_concat``: per-call ``x @ concat(Wq,Wk,Wv) + concat(b)`` — what a
  module-level fusion would execute, since the params must stay three
  leaves for the torch-converter contract (concat cost included).
- ``fused_pre``: the concat hoisted out of the timed op — the unreachable
  upper bound (single fused param leaf), to show how much the per-call
  concat costs.

Also times the full self-attention (projections + attention + out-proj)
with split vs fused projections, since the isolated win may wash out.

Run ALONE on the chip:  python tools/qkv_fused_ab.py
"""

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import sys

sys.path.insert(0, ".")

from _timing import time_op  # noqa: E402

from medfusion_tpu.ops.flash_attention import naive_attention  # noqa: E402
from einops import rearrange  # noqa: E402

B = 32


def level(n, ch):
    heads = 8
    d = ch // heads
    scale = d ** -0.25
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (B, n, ch), jnp.bfloat16)
    wq, wk, wv = (jax.random.normal(k, (ch, ch), jnp.bfloat16) * 0.02
                  for k in ks[1:4])
    bq, bk, bv = (jnp.zeros((ch,), jnp.bfloat16) for _ in range(3))
    w_fused = jnp.concatenate([wq, wk, wv], axis=1)
    b_fused = jnp.concatenate([bq, bk, bv])
    wo = jax.random.normal(ks[4], (ch, ch), jnp.bfloat16) * 0.02

    def proj_split(h):
        q = h @ wq + bq
        k = h @ wk + bk
        v = h @ wv + bv
        return (q + k + v).astype(h.dtype)

    def proj_fused_concat(h):
        w = jnp.concatenate([wq, wk, wv], axis=1)
        b = jnp.concatenate([bq, bk, bv])
        qkv = h @ w + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (q + k + v).astype(h.dtype)

    def proj_fused_pre(h):
        qkv = h @ w_fused + b_fused
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (q + k + v).astype(h.dtype)

    def attn(q, k, v):
        qh = rearrange(q, "b n (hh dd) -> b hh n dd", hh=heads)
        kh = rearrange(k, "b n (hh dd) -> b hh n dd", hh=heads)
        vh = rearrange(v, "b n (hh dd) -> b hh n dd", hh=heads)
        o = naive_attention(qh, kh, vh, scale)
        return rearrange(o, "b hh n dd -> b n (hh dd)")

    def self_attn_split(h):
        q = h @ wq + bq
        k = h @ wk + bk
        v = h @ wv + bv
        return (attn(q, k, v) @ wo).astype(h.dtype)

    def self_attn_fused(h):
        w = jnp.concatenate([wq, wk, wv], axis=1)
        qkv = h @ w + jnp.concatenate([bq, bk, bv])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (attn(q, k, v) @ wo).astype(h.dtype)

    rec = {"tokens": n, "ch": ch}
    rec["proj_split_ms"] = time_op(proj_split, x) * 1e3
    rec["proj_fused_concat_ms"] = time_op(proj_fused_concat, x) * 1e3
    rec["proj_fused_pre_ms"] = time_op(proj_fused_pre, x) * 1e3
    rec["self_attn_split_ms"] = time_op(self_attn_split, x) * 1e3
    rec["self_attn_fused_ms"] = time_op(self_attn_fused, x) * 1e3
    return rec


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rows = []
    for n, ch in ((1024, 256), (256, 512), (64, 1024), (4096, 128)):
        r = level(n, ch)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "qkv fusion A/B (B=32, bf16, ms/app)",
                      "levels": rows}))


if __name__ == "__main__":
    main()
