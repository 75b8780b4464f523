"""On-chip time decomposition of the spatial-attention block (round-3
verdict ask #3: find where the non-conv MFU goes before optimizing).

Times each sub-op of ``nn.attention.SpatialTransformer`` at the chest
sampling geometries (B=32, bf16): full block, GroupNorm, proj_in/out pair,
self-attention (XLA vs Pallas flash), cross-attention with the 1-token
label embedding (generic softmax path vs the broadcast shortcut), GEGLU MLP.

Timing: chained applications inside ONE jitted ``lax.fori_loop``
(shape-preserving residual composition), scalar-checksum fetch
(block_until_ready returns early through the axon tunnel), and the
per-application cost is the MARGINAL difference between a 900-iter and a
100-iter loop — a single dispatch+fetch through the tunnel costs ~25 ms
(measured this round; "hundreds of us" in round 1), so dividing one loop's
wall time by its trip count buries every sub-ms op under dispatch overhead.

Run ALONE on the chip:  python tools/attn_profile.py
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import sys

sys.path.insert(0, ".")

from medfusion_tpu.nn.attention import (  # noqa: E402
    GEGLU,
    LinearTransformer,
    SpatialTransformer,
    compute_attention,
)
from medfusion_tpu.nn.blocks import Dense, Norm  # noqa: E402
import medfusion_tpu.ops as ops  # noqa: E402

from _timing import time_op  # noqa: E402

B = 32
EMB = 1024
NORM = ("GROUP", {"num_groups": 32, "affine": True})


def bf16_params(module, *args, rngs=None):
    p = module.init(rngs or jax.random.PRNGKey(0), *args)["params"]
    return jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), p)


def profile_level(hw, ch):
    n = hw * hw
    heads, dph = 8, ch // 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, ch),
                          jnp.bfloat16)
    xt = x.reshape(B, n, ch)
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB), jnp.bfloat16)
    out = {"tokens": n, "ch": ch}

    # full spatial transformer (self + cross(1 tok) + GEGLU)
    st = SpatialTransformer(2, ch, heads, dph, NORM, emb_dim=EMB)
    p_st = bf16_params(st, x, emb)
    out["spatial_block_ms"] = time_op(
        lambda h: st.apply({"params": p_st}, h, emb), x) * 1e3

    # GroupNorm alone
    gn = Norm(NORM, ch)
    p_gn = bf16_params(gn, x)
    out["groupnorm_ms"] = time_op(lambda h: gn.apply({"params": p_gn}, h),
                                  x) * 1e3

    # 1x1 proj pair (in+out) on tokens
    d1, d2 = Dense(ch), Dense(ch)
    p1, p2 = bf16_params(d1, xt), bf16_params(d2, xt)
    out["proj_pair_ms"] = time_op(
        lambda h: d2.apply({"params": p2}, d1.apply({"params": p1}, h)),
        xt) * 1e3

    # self-attention core (qkv proj + attention + out proj) via
    # LinearTransformer with no embedding
    lt = LinearTransformer(2, ch, heads, dph, NORM)
    p_lt = bf16_params(lt, x)
    ops.enable_flash_attention(False)
    out["self_attn_xla_ms"] = time_op(
        lambda h: lt.apply({"params": p_lt}, h), x) * 1e3
    ops.enable_flash_attention(True)
    out["self_attn_flash_ms"] = time_op(
        lambda h: lt.apply({"params": p_lt}, h), x) * 1e3
    ops.enable_flash_attention(False)

    # cross-attention with the 1-token embedding: shipped shortcut vs the
    # generic softmax path (reconstructed inline from the same math)
    ct = LinearTransformer(2, ch, heads, dph, NORM, emb_dim=EMB)
    p_ct = bf16_params(ct, x, emb)
    out["cross_attn_shortcut_ms"] = time_op(
        lambda h: ct.apply({"params": p_ct}, h, emb), x) * 1e3

    def cross_generic(h):
        def dense(p, t):
            return t @ p["linear"]["kernel"] + p["linear"]["bias"]

        h_n = gn.apply({"params": p_ct["norm_x"]}, h)
        tok = h_n.reshape(B, n, ch)
        q = dense(p_ct["to_q"], tok)
        k = dense(p_ct["to_k"], emb[:, None, :])
        v = dense(p_ct["to_v"], emb[:, None, :])
        o = compute_attention(q, k, v, heads, dph ** -0.25)
        return h + dense(p_ct["to_out"], o).reshape(h.shape)

    out["cross_attn_generic_ms"] = time_op(cross_generic, x) * 1e3

    # GEGLU MLP (4x expansion + out proj, LayerNorm included)
    gg = GEGLU(ch * 4)
    p_gg = bf16_params(gg, xt)
    dout = Dense(ch)
    p_do = bf16_params(dout, jnp.zeros((B, n, ch * 4), jnp.bfloat16))
    out["geglu_mlp_ms"] = time_op(
        lambda h: dout.apply({"params": p_do}, gg.apply({"params": p_gg}, h)),
        xt) * 1e3
    return out


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rows = []
    for hw, ch in ((32, 256), (16, 512), (8, 1024)):
        r = profile_level(hw, ch)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "spatial-attention block decomposition "
                                "(B=32, bf16, ms per application)",
                      "levels": rows}))


if __name__ == "__main__":
    main()
