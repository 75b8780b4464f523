"""Third-stage s2d probe: the end-to-end s2d decode tail LOST 3.7 ms
(24.66 vs 20.96, /tmp/s2dab.log) while every isolated op won — find which
composed piece regresses. Times the REAL modules (UpBlock level-3 geometry,
outc head) stock vs s2d, plus intra-tail piece timings.

Run ALONE on the chip:  python tools/s2d_probe3.py
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")

from medfusion_tpu import ops  # noqa: E402
from medfusion_tpu.nn.blocks import BasicBlock, UpBlock  # noqa: E402
from medfusion_tpu.nn import functional as F  # noqa: E402
from _timing import time_chained  # noqa: E402

B = 32
NORM = ("GROUP", {"num_groups": 8, "affine": True})


def main():
    key = jax.random.PRNGKey(0)
    up = UpBlock(2, 64, 3, 2, 2, NORM, ("SWISH", {}), None,
                 use_res_block=True, learnable_interpolation=True)
    x = jax.random.normal(key, (B, 128, 128, 128), jnp.bfloat16)
    x1 = jax.random.normal(key, (1, 128, 128, 128), jnp.float32)
    p = up.init(key, x1)["params"]
    p = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), p)

    recs = {}

    ops.enable_fused_up_conv(True)
    ms = time_chained(lambda z: jnp.sum(up.apply({"params": p}, z)
                                        ).astype(jnp.float32), x, iters=50)
    recs["upblock_stock_fusedup"] = round(ms, 3)
    print(json.dumps({"arm": "upblock stock (fused-up)", "ms": recs["upblock_stock_fusedup"]}), flush=True)

    ms = time_chained(lambda z: jnp.sum(up.apply({"params": p}, z,
                                                 s2d_tail=True)
                                        ).astype(jnp.float32), x, iters=50)
    recs["upblock_s2d"] = round(ms, 3)
    print(json.dumps({"arm": "upblock s2d tail", "ms": recs["upblock_s2d"]}), flush=True)

    # s2d tail + depth_to_space at the end (what decode pays before the head)
    ms = time_chained(lambda z: jnp.sum(F.depth_to_space2(
        up.apply({"params": p}, z, s2d_tail=True))).astype(jnp.float32),
        x, iters=50)
    recs["upblock_s2d_plus_d2s"] = round(ms, 3)
    print(json.dumps({"arm": "upblock s2d + d2s", "ms": recs["upblock_s2d_plus_d2s"]}), flush=True)

    # heads
    outc = BasicBlock(2, 3, 1, zero_conv=True)
    xh = jax.random.normal(key, (B, 256, 256, 64), jnp.bfloat16)
    ph = outc.init(key, jax.random.normal(key, (1, 256, 256, 64)))["params"]
    ph = jax.tree_util.tree_map(lambda v: (v + 0.1).astype(jnp.bfloat16), ph)
    ms = time_chained(lambda z: jnp.sum(outc.apply({"params": ph}, z)
                                        ).astype(jnp.float32), xh, iters=50)
    recs["head_stock"] = round(ms, 3)
    print(json.dumps({"arm": "1x1 head stock 256^2", "ms": recs["head_stock"]}), flush=True)

    xs = jax.random.normal(key, (B, 128, 128, 256), jnp.bfloat16)
    ms = time_chained(lambda z: jnp.sum(F.depth_to_space2(
        outc.apply({"params": ph}, z, s2d=True))).astype(jnp.float32),
        xs, iters=50)
    recs["head_s2d_plus_d2s"] = round(ms, 3)
    print(json.dumps({"arm": "1x1 head s2d + d2s", "ms": recs["head_s2d_plus_d2s"]}), flush=True)

    # intra-tail pieces on the (B,128,128,256) s2d tensor
    w3 = (jax.random.normal(key, (3, 3, 64, 64), jnp.float32) * 0.04).astype(jnp.bfloat16)
    b3 = jnp.zeros((64,), jnp.bfloat16)
    ms = time_chained(lambda z: jnp.sum(F.s2d_conv3x3(z, w3, b3)
                                        ).astype(jnp.float32), xs, iters=100)
    recs["s2d_conv3x3_module_path"] = round(ms, 3)
    print(json.dumps({"arm": "s2d_conv3x3 (kernel built in-graph)", "ms": recs["s2d_conv3x3_module_path"]}), flush=True)

    sc = jnp.ones((64,), jnp.bfloat16); bi = jnp.zeros((64,), jnp.bfloat16)
    ms = time_chained(lambda z: jnp.sum(jax.nn.silu(F.s2d_group_norm(
        z, sc, bi, 8))).astype(jnp.float32), xs, iters=100)
    recs["s2d_gn_silu_fn"] = round(ms, 3)
    print(json.dumps({"arm": "s2d_group_norm+silu (fn)", "ms": recs["s2d_gn_silu_fn"]}), flush=True)

    # norm-free UpBlock arms: isolates the CONV composition from GN effects
    upn = UpBlock(2, 64, 3, 2, 2, None, ("SWISH", {}), None,
                  use_res_block=True, learnable_interpolation=True)
    pn = upn.init(key, x1)["params"]
    pn = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), pn)
    ms = time_chained(lambda z: jnp.sum(upn.apply({"params": pn}, z)
                                        ).astype(jnp.float32), x, iters=50)
    recs["upblock_nonorm_stock"] = round(ms, 3)
    print(json.dumps({"arm": "upblock no-norm stock (fused-up)", "ms": recs["upblock_nonorm_stock"]}), flush=True)
    ms = time_chained(lambda z: jnp.sum(upn.apply({"params": pn}, z,
                                                  s2d_tail=True)
                                        ).astype(jnp.float32), x, iters=50)
    recs["upblock_nonorm_s2d"] = round(ms, 3)
    print(json.dumps({"arm": "upblock no-norm s2d tail", "ms": recs["upblock_nonorm_s2d"]}), flush=True)

    print(json.dumps(recs), flush=True)
    with open("/tmp/s2d_probe3.json", "w") as fh:
        json.dump(recs, fh)


if __name__ == "__main__":
    main()
