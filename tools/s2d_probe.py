"""One-off probe: would a space-to-depth TAIL beat the shipped layout at the
chest decoder's final level (256^2, C=64)?  Times the exact s2d compute
patterns (2x2 stacked conv incl. pad/slice/concat, phase-aware GN+SiLU)
against the measured stock arms from UP_LEVEL_AB_r05.json.

Run ALONE on the chip:  python tools/s2d_probe.py
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")
from _timing import time_chained  # noqa: E402

B, H, C = 32, 128, 64  # s2d grid of the 256^2 C=64 level: (128, 128, 256)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, 4 * C), jnp.bfloat16)
    # s2d kernel of a 3x3 conv: 2x2 window, 4C -> 4C channels (9/16 dense)
    k = (jax.random.normal(key, (2, 2, 4 * C, 4 * C), jnp.float32)
         * (4 * 4 * C) ** -0.5).astype(jnp.bfloat16)

    def s2d_conv(z):
        yp = jax.lax.conv_general_dilated(
            z, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # per-phase window slices (even rows read [0:H], odd read [1:H+1])
        c = C
        phases = [yp[:, :H, :H, 0:c], yp[:, :H, 1:, c:2 * c],
                  yp[:, 1:, :H, 2 * c:3 * c], yp[:, 1:, 1:, 3 * c:]]
        return jnp.concatenate(phases, axis=-1)

    def s2d_gn_silu(z):
        g = 8  # GROUP num_groups=8 over the ORIGINAL C=64
        v = z.reshape(B, H, H, 4, g, C // g)
        mu = jnp.mean(v.astype(jnp.float32), axis=(1, 2, 3, 5), keepdims=True)
        var = jnp.mean(jnp.square(v.astype(jnp.float32)), axis=(1, 2, 3, 5),
                       keepdims=True) - jnp.square(mu)
        y = (v - mu.astype(v.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(v.dtype)
        return jax.nn.silu(y).reshape(z.shape)

    recs = {}
    for name, fn in (("s2d_conv_2x2_256ch", s2d_conv),
                     ("s2d_gn_silu", s2d_gn_silu)):
        ms = time_chained(lambda z, fn=fn: jnp.sum(fn(z)).astype(jnp.float32),
                         x, iters=100)
        recs[name] = round(ms, 4)
        print(json.dumps({"arm": name, "ms": recs[name]}), flush=True)

    # reference points from UP_LEVEL_AB_r05.json (stock layout)
    recs["stock_conv3x3_256sq_64ch_ms"] = 4.5323
    recs["stock_gn_silu_256sq_64ch_ms"] = 1.9415
    print(json.dumps(recs), flush=True)


if __name__ == "__main__":
    main()
