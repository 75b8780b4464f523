"""Second-stage s2d probe: where does the 2x2 stacked conv's time go, and
does a two-half-conv split (full 128-lane outputs, row padding per parity)
beat the single over-padded conv?  Run ALONE on the chip."""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")
from _timing import time_chained  # noqa: E402

B, H, C = 32, 128, 64


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, 4 * C), jnp.bfloat16)
    k = (jax.random.normal(key, (2, 2, 4 * C, 4 * C), jnp.float32)
         * (16 * C) ** -0.5).astype(jnp.bfloat16)
    kh = k[:, :, :, :2 * C]  # 4C -> 2C half kernels
    dn = ("NHWC", "HWIO", "NHWC")

    def raw(z):  # floor: VALID 2x2 conv, no padding/slice overhead
        return jax.lax.conv_general_dilated(z, k, (1, 1), [(0, 0), (0, 0)],
                                            dimension_numbers=dn)

    def padded_noslice(z):
        return jax.lax.conv_general_dilated(z, k, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn)

    def stacked(z):  # the probe-1 shape: pad + 4 slices + concat
        yp = jax.lax.conv_general_dilated(z, k, (1, 1), [(1, 1), (1, 1)],
                                          dimension_numbers=dn)
        c = C
        ph = [yp[:, :H, :H, 0:c], yp[:, :H, 1:, c:2 * c],
              yp[:, 1:, :H, 2 * c:3 * c], yp[:, 1:, 1:, 3 * c:]]
        return jnp.concatenate(ph, axis=-1)

    def halves(z):  # two convs, each 4C->2C (full lanes), row pad per parity
        ye = jax.lax.conv_general_dilated(z, kh, (1, 1), [(1, 0), (1, 1)],
                                          dimension_numbers=dn)
        yo = jax.lax.conv_general_dilated(z, kh, (1, 1), [(0, 1), (1, 1)],
                                          dimension_numbers=dn)
        c = C
        ph = [ye[:, :, :H, 0:c], ye[:, :, 1:, c:2 * c],
              yo[:, :, :H, 0:c], yo[:, :, 1:, c:2 * c]]
        return jnp.concatenate(ph, axis=-1)

    recs = {}
    for name, fn in (("raw_valid", raw), ("padded_noslice", padded_noslice),
                     ("stacked_slices", stacked), ("two_halves", halves)):
        ms = time_chained(lambda z, fn=fn: jnp.sum(fn(z)).astype(jnp.float32),
                         x, iters=100)
        recs[name] = round(ms, 4)
        print(json.dumps({"arm": name, "ms": recs[name]}), flush=True)
    print(json.dumps(recs), flush=True)


if __name__ == "__main__":
    main()
