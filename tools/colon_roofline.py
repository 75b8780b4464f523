"""Colon spatial-attention roofline (round-4 verdict ask #3): quantify the
D=32 structural cap at the 4096-token level with MEASUREMENTS, and sweep
flash block shapes at that geometry for any remaining win.

The colon program (512^2 images, latent 4x64x64, UNet hid 256/256/512/1024,
spatial attention at every level — reference attention_blocks.py:35-43 at
streamlit/pages/colon.py geometry) runs at 0.414 MFU vs chest's 0.579. The
4096-token level is [B=32, H=8, N=4096, D=32]: both flash dots contract or
emit along D=32 — a quarter of the MXU's 128-deep systolic contraction —
so the level has a structural ceiling no block shape can lift.

Measured evidence, all on the SAME kernel code:

1. D-cap A/B: flash at [32,8,4096,32] (colon geometry) vs [32,2,4096,128]
   (2 heads x 128 — IDENTICAL total FLOPs, H*D fixed at 256, same token
   count). The speed ratio IS the measured D=32 penalty, with every other
   variable held.
2. Block sweep at [32,8,4096,32]: block_q x block_k over the feasible grid
   (VMEM-OOM configs caught per-config — Mosaic raises at compile time).
3. XLA naive arm at the same level for reference.
4. Implied program bound: from XLA cost-analysis FLOP split of the colon
   UNet (attention vs conv) + the measured best attention rate + the
   measured conv-program MFU (0.79, bench headline), compute the maximum
   MFU ANY scheduling of this program could reach — the number that decides
   whether 0.5 overall is reachable at D=32.

Timing: marginal fori_loop protocol (tools/_timing.py).
Run ALONE on the chip:  python tools/colon_roofline.py
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")

from einops import rearrange  # noqa: E402

from _timing import time_op  # noqa: E402

from medfusion_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention,
    naive_attention,
)

B = 32
PEAK = 197e12
CONV_MFU = 0.79  # measured bench headline (conv-only chest program)


def attn_flops(b, h, n, d):
    # qk^T + pv, 2 FLOPs per MAC
    return 2 * 2 * b * h * n * n * d


def measure(label, h, d, bq=None, bk=None, n=4096):
    """ms/application + achieved TFLOP/s of self-attention at
    [B, h, n, d] bf16 (token-layout input, kernel-layout inside)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, n, h * d), jnp.bfloat16)
    scale = d ** -0.25

    def op(t):
        q = rearrange(t, "b n (hh dd) -> b hh n dd", hh=h)
        kw = {} if bq is None else {"block_q": bq, "block_k": bk}
        o = flash_attention(q, q, q, scale, **kw)
        return rearrange(o, "b hh n dd -> b n (hh dd)")

    ms = time_op(op, x) * 1e3
    tflops = attn_flops(B, h, n, d) / (ms / 1e3) / 1e12
    rec = {"arm": label, "ms": round(ms, 3), "tflops": round(tflops, 1),
           "mxu_frac": round(tflops * 1e12 / PEAK, 3)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rows = []

    # 1. the D-cap A/B (identical FLOPs, H*D = 256 fixed)
    base = measure("colon level d=32 (8 heads, default blocks)", 8, 32)
    rows.append(base)
    wide = measure("same FLOPs d=128 (2 heads, default blocks)", 2, 128)
    rows.append(wide)
    rows.append({"arm": "measured D=32 penalty",
                 "ratio": round(base["ms"] / wide["ms"], 3)})
    print(json.dumps(rows[-1]), flush=True)

    # 2. block sweep at the colon geometry
    best = base
    for bq, bk in ((2048, 1024), (1024, 2048), (512, 1024), (1024, 512),
                   (2048, 2048), (4096, 1024), (512, 4096)):
        try:
            r = measure(f"d=32 blocks {bq}x{bk}", 8, 32, bq, bk)
            rows.append(r)
            if r["ms"] < best["ms"]:
                best = r
        except Exception as e:  # per-config: Mosaic VMEM OOM reports, not crash
            rec = {"arm": f"d=32 blocks {bq}x{bk}",
                   "error": f"{type(e).__name__}: {e}"[:120]}
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    # 3. XLA naive arm (materializes the [4096,4096] logits)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4096, 256), jnp.bfloat16)

    def xla(t):
        q = rearrange(t, "b n (hh dd) -> b hh n dd", hh=8)
        o = naive_attention(q, q, q, 32 ** -0.25)
        return rearrange(o, "b hh n dd -> b n (hh dd)")

    try:
        ms = time_op(xla, x) * 1e3
        tf = attn_flops(B, 8, 4096, 32) / (ms / 1e3) / 1e12
        rows.append({"arm": "XLA naive", "ms": round(ms, 3),
                     "tflops": round(tf, 1)})
        print(json.dumps(rows[-1]), flush=True)
    except Exception as e:
        rows.append({"arm": "XLA naive", "error": str(e)[:120]})
        print(json.dumps(rows[-1]), flush=True)

    # 4. implied program bound from the FLOP split of the full colon UNet
    from medfusion_tpu.models.unet import UNet

    def flops_of(model, z_shape):
        # Everything on CPU: eager init at B=32 with naive 4096-token
        # attention materializes [32,8,4096,4096] logits (17 GiB) and OOMs
        # the v5e if it runs on the default (TPU) device. Params are
        # batch-independent, so init at B=1; cost-analyze at full B.
        key = jax.random.PRNGKey(0)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            z1 = jnp.zeros((1,) + z_shape[1:], jnp.bfloat16)
            t1 = jnp.zeros((1,), jnp.int32)
            params = jax.jit(model.init)(key, z1, t1, t1)["params"]
            params = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), params)
            z = jax.ShapeDtypeStruct(z_shape, jnp.bfloat16)
            t0 = jax.ShapeDtypeStruct((z_shape[0],), jnp.int32)
            f = lambda p, zz, tt: model.apply({"params": p}, zz, tt, tt)
            c = jax.jit(f).lower(params, z, t0).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return float(c.get("flops", 0.0))

    common = dict(in_ch=4, out_ch=4, hid_chs=(256, 256, 512, 1024),
                  kernel_sizes=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                  time_emb_dim=1024, cond_emb_num_classes=2,
                  deep_supervision=0)
    z_shape = (B, 64, 64, 4)
    f_attn_model = flops_of(UNet(use_attention="spatial", **common), z_shape)
    f_conv_model = flops_of(UNet(use_attention="none", **common), z_shape)
    f_extra = f_attn_model - f_conv_model  # attention blocks incl projections
    # pure attention einsum FLOPs (the D-capped part), from the exact colon
    # census (models/unet.py topology at latent 64^2, hid 256/256/512/1024,
    # nrb=2): encoder level-i attention runs BEFORE the down at the incoming
    # resolution; decoder stage k=0 upsamples AFTER its attention. Apps
    # (N tokens, head dim d, count): 5@4096/d32 (enc 2 + dec 3), 4@1024/d64 +
    # 1@1024/d32, 5@256/d128 (incl middle) + 1@256/d64. The projections and
    # GEGLU MLP inside f_extra contract over >=256 channels and run at
    # conv-like rates; only the einsums are D-capped.
    f_eins = sum(attn_flops(B, 8, n, d) * apps for n, d, apps in
                 ((4096, 32, 5), (1024, 64, 4), (1024, 32, 1),
                  (256, 128, 5), (256, 64, 1)))
    # per-level measured rates for the bound: the kernel at each level's
    # exact (n, d); the flash wrapper dispatches n<MIN_KV_TOKENS levels to
    # XLA, but those levels are <2% of the einsum FLOPs — kernel rate is a
    # fair stand-in
    r1024_64 = measure("level 1024/d=64 (default blocks)", 8, 64, n=1024)
    r256_128 = measure("level 256/d=128 (default blocks)", 8, 128, n=256)
    rows += [r1024_64, r256_128]
    rate = {
        (4096, 32): best["tflops"], (1024, 32): best["tflops"],
        (1024, 64): r1024_64["tflops"], (256, 64): r1024_64["tflops"],
        (256, 128): r256_128["tflops"],
    }
    census = ((4096, 32, 5), (1024, 64, 4), (1024, 32, 1),
              (256, 128, 5), (256, 64, 1))
    t_eins = sum(attn_flops(B, 8, n, d) * apps / (rate[(n, d)] * 1e12)
                 for n, d, apps in census)
    t_rest = (f_attn_model - f_eins) / (CONV_MFU * PEAK)
    bound = f_attn_model / (t_eins + t_rest) / PEAK

    # 5. the same bound under the wide-head product config (attn_heads=2:
    # same projection shapes/FLOPs, heads*d fixed, d -> 4x). Measure the
    # kernel at each wide geometry; einsum FLOPs are unchanged.
    w1024_256 = measure("wide 1024/d=256 (2 heads)", 2, 256, n=1024)
    w256_512 = measure("wide 256/d=512 (2 heads)", 2, 512, n=256)
    rows += [w1024_256, w256_512]
    rate_w = {
        (4096, 32): wide["tflops"], (1024, 32): wide["tflops"],
        (1024, 64): w1024_256["tflops"], (256, 64): w1024_256["tflops"],
        (256, 128): w256_512["tflops"],
    }
    t_eins_w = sum(attn_flops(B, 8, n, d) * apps / (rate_w[(n, d)] * 1e12)
                   for n, d, apps in census)
    bound_wide = f_attn_model / (t_eins_w + t_rest) / PEAK
    summary = {
        "metric": "colon spatial roofline (B=32, bf16)",
        "unet_flops_tflop": round(f_attn_model / 1e12, 3),
        "attention_block_extra_tflop": round(f_extra / 1e12, 3),
        "attention_einsum_tflop_est": round(f_eins / 1e12, 3),
        "best_attention_arm": best,
        "implied_max_program_mfu": round(bound, 3),
        "implied_max_program_mfu_wide_heads": round(bound_wide, 3),
        "note": "bound assumes every non-einsum FLOP at the measured "
                "conv-program rate (0.79) and every attention einsum at the "
                "best measured kernel rate — an upper bound no schedule of "
                "this model can beat at D=32; the wide-heads row is the same "
                "bound under attn_heads=2 (d=128/256/512, same FLOPs/params)",
        "levels": rows,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
