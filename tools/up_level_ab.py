"""Per-LEVEL fused-up variant A/B on the v5e — phase4 vs stacked vs unfused
at each chest-VAE decoder geometry, separately.

Motivation: DECODE_UPAB_r05.json A/B'd the variants ALL-OR-NOTHING over the
whole decode and phase4 won by 1.1%. But the two variants have opposite MXU
profiles: phase4 runs four narrow convs whose OUTPUT channels map to MXU
lanes (C_out=64 at the 256^2 level -> <=50% lane utilization), while stacked
runs ONE conv with 4*C_out outputs (full lanes at every shipped width) at
the price of a padded row/col. If stacked wins the low-channel levels and
loses the wide ones, a channel-aware "auto" variant beats both — this tool
measures exactly that, one level at a time.

Also times the per-level BasicBlock 3x3 convs and a GN+SiLU tail so the
decode roofline (PARITY round-5) gets a per-level breakdown instead of a
whole-program number.

Protocol: tools/_timing.time_chained (chained fori_loop, scalar checksum,
marginal over iters — the CLAUDE.md tunnel-timing rule). bf16, B=32.

Run ALONE on the chip:  python tools/up_level_ab.py
Writes UP_LEVEL_AB_r05.json next to the repo root.
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")

from medfusion_tpu.nn import functional as F  # noqa: E402
from _timing import time_chained  # noqa: E402

V5E_PEAK = 197e12
B = 32

# chest VAE decode up levels: (H_in, W_in, C_in, C_out)
LEVELS = [(32, 32, 512, 256), (64, 64, 256, 128), (128, 128, 128, 64)]


def time_arm(fn, x, iters=100):
    return time_chained(lambda z: jnp.sum(fn(z)).astype(jnp.float32), x,
                        iters=iters)


def main():
    key = jax.random.PRNGKey(0)
    out = {"levels": [], "block_convs": [], "gn_silu": []}

    for (h, w, cin, cout) in LEVELS:
        x = jax.random.normal(key, (B, h, w, cin), jnp.bfloat16)
        k = (jax.random.normal(key, (3, 3, cin, cout), jnp.float32)
             * (9 * cin) ** -0.5).astype(jnp.bfloat16)
        # real (phase-decomposed) FLOPs: 16 MACs / output px; semantic: 36
        real_tf = 2 * B * (2 * h) * (2 * w) * 4 * cin * cout / 1e12
        sem_tf = real_tf * 36 / 16

        def unfused(z, k=k, h=h, w=w):
            up = F.interpolate_nearest_exact(z, (2 * h, 2 * w))
            return jax.lax.conv_general_dilated(
                up, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        rec = {"geom": f"{h}x{w} {cin}->{cout}", "sem_tflops": round(sem_tf, 4)}
        for arm in ("unfused", "phase4", "stacked"):
            if arm == "unfused":
                ms = time_arm(unfused, x)
                eff = sem_tf / (ms / 1e3) / 1e12
            else:
                F.FUSED_UP_VARIANT = arm
                try:
                    ms = time_arm(lambda z, k=k: F.fused_up2x_conv(z, k, None), x)
                finally:
                    F.FUSED_UP_VARIANT = "phase4"
                eff = real_tf / (ms / 1e3) / 1e12
            rec[arm] = {"ms": round(ms, 4), "real_tflops_rate": round(eff, 1),
                        "mxu_frac": round(eff * 1e12 / V5E_PEAK, 3)}
            print(json.dumps({"level": rec["geom"], "arm": arm, **rec[arm]}),
                  flush=True)
        out["levels"].append(rec)

    # per-level block convs (3x3 C->C at the POST-up resolution)
    for (res, c) in ((64, 256), (128, 128), (256, 64)):
        x = jax.random.normal(key, (B, res, res, c), jnp.bfloat16)
        k = (jax.random.normal(key, (3, 3, c, c), jnp.float32)
             * (9 * c) ** -0.5).astype(jnp.bfloat16)

        def conv(z, k=k):
            return jax.lax.conv_general_dilated(
                z, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        tf = 2 * B * res * res * 9 * c * c / 1e12
        ms = time_arm(conv, x)
        eff = tf / (ms / 1e3) / 1e12
        rec = {"geom": f"{res}^2 {c}->{c}", "ms": round(ms, 4),
               "tflops_rate": round(eff, 1),
               "mxu_frac": round(eff * 1e12 / V5E_PEAK, 3)}
        print(json.dumps(rec), flush=True)
        out["block_convs"].append(rec)

    # GN+SiLU tails at the two widest-activation levels (bandwidth rows)
    import flax.linen as nn

    for (res, c) in ((256, 64), (128, 128)):
        gn = nn.GroupNorm(num_groups=min(32, c), use_bias=True, use_scale=True)
        x = jax.random.normal(key, (B, res, res, c), jnp.bfloat16)
        p = gn.init(key, x)

        def f(z, gn=gn, p=p):
            return jax.nn.silu(gn.apply(p, z))

        ms = time_arm(f, x)
        gb = 2 * B * res * res * c * 2 / 1e9  # read + write, bf16
        rec = {"geom": f"{res}^2 c={c}", "ms": round(ms, 4),
               "min_gb_moved": round(gb, 3),
               "achieved_gbps": round(gb / (ms / 1e3), 1)}
        print(json.dumps(rec), flush=True)
        out["gn_silu"].append(rec)

    with open("UP_LEVEL_AB_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote UP_LEVEL_AB_r05.json", flush=True)


if __name__ == "__main__":
    main()
