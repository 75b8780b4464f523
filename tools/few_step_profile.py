"""Decompose the few-step (distilled/flow 1-NFE) program cost — round-4
verdict ask #4 follow-up to tools/decode_profile.py, which measured
decode-only 23.0 ms and unet-only 10.2 ms (B=32, bf16) yet the full 1-NFE
flow program at 59.7 ms: ~26 ms is unaccounted. Three arms isolate it:

* ``1-NFE chained, decode=False``  — estimator in sampler context
  (velocity wrapper, scan machinery, cond_mask), dispatch amortized over
  ``iters`` chained applications in ONE program (CLAUDE.md tunnel rule);
* ``1-NFE chained, decode=True``   — adds the in-context VAE decode; the
  delta vs arm 1 is decode-in-context (layout/fusion effects included);
* ``1-NFE single-dispatch``        — the bench protocol (one program per
  measurement); the delta vs arm 2 is per-dispatch overhead through the
  axon tunnel, NOT program cost.

Run ALONE on the chip:  python tools/few_step_profile.py [--batch 32]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")

from medfusion_tpu.models.latent_embedders import VAE  # noqa: E402
from medfusion_tpu.models.unet import UNet  # noqa: E402
from medfusion_tpu.pipelines.flow import FlowMatchingPipeline  # noqa: E402

LAT = (32, 32, 8)
IMG = 256


def build():
    vae = VAE(in_channels=3, out_channels=3, emb_channels=LAT[-1],
              hid_chs=(64, 128, 256, 512), deep_supervision=0)
    unet = UNet(in_ch=LAT[-1], out_ch=LAT[-1], hid_chs=(256, 256, 512, 1024),
                kernel_sizes=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                time_emb_dim=1024, cond_emb_num_classes=2,
                deep_supervision=0, use_attention="none")
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    z = jnp.zeros((1,) + LAT, jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    vp = vae.init({"params": key, "sample": key}, x)["params"]
    up = unet.init(key, z, t0, t0)["params"]
    cast = lambda t: jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), t)
    pipe = FlowMatchingPipeline(noise_estimator=unet, latent_embedder=vae,
                                compute_dtype=jnp.bfloat16)
    return pipe, {"noise_estimator": cast(up), "latent_embedder": cast(vp)}


def time_chained(apply_fn, z0, iters=10):
    def run(z_init):
        def body(_, carry):
            z, acc = carry
            s = apply_fn(z)
            return (z_init * (1.0 + 1e-6 * s.astype(z_init.dtype)), acc + s)

        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (z_init, jnp.zeros((), jnp.float32)))
        return acc

    compiled = jax.jit(run).lower(z0).compile()
    float(compiled(z0))
    best = min(_timed(compiled, z0) for _ in range(3))
    return best / iters * 1e3


def _timed(compiled, z0):
    t0 = time.perf_counter()
    float(compiled(z0))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    b = args.batch
    print(f"# devices: {jax.devices()}", flush=True)

    pipe, params = build()
    cond = jnp.zeros((b,), jnp.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b,) + LAT, jnp.float32)

    def one_nfe(decode):
        def f(x):
            out = pipe.denoise(params, x, None, condition=cond, steps=1,
                               guidance_scale=1.0, heun=False, decode=decode)
            return jnp.sum(out).astype(jnp.float32)
        return f

    rows = {}
    ms_nod = time_chained(one_nfe(False), x0)
    rows["chained_1nfe_no_decode_ms"] = round(ms_nod, 3)
    print(json.dumps({"arm": "1-NFE chained decode=False",
                      "ms_per_batch": round(ms_nod, 3),
                      "samples_per_sec": round(b / ms_nod * 1e3, 1)}),
          flush=True)

    ms_dec = time_chained(one_nfe(True), x0)
    rows["chained_1nfe_ms"] = round(ms_dec, 3)
    print(json.dumps({"arm": "1-NFE chained decode=True",
                      "ms_per_batch": round(ms_dec, 3),
                      "samples_per_sec": round(b / ms_dec * 1e3, 1),
                      "decode_in_context_ms": round(ms_dec - ms_nod, 3)}),
          flush=True)

    # bench protocol: one program per measurement, scalar fetch
    def run_single(p, r):
        out = pipe.sample(p, r, b, LAT, condition=cond, steps=1,
                          guidance_scale=1.0, heun=False)
        return jnp.sum(out)

    compiled = jax.jit(run_single).lower(params, jax.random.PRNGKey(0)).compile()
    float(compiled(params, jax.random.PRNGKey(0)))
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        float(compiled(params, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    ms_single = min(times) * 1e3
    rows["single_dispatch_1nfe_ms"] = round(ms_single, 3)
    print(json.dumps({"arm": "1-NFE single-dispatch (bench protocol)",
                      "ms_per_batch": round(ms_single, 3),
                      "samples_per_sec": round(b / ms_single * 1e3, 1),
                      "dispatch_overhead_ms": round(ms_single - ms_dec, 3)}),
          flush=True)

    print(json.dumps({
        "metric": f"1-NFE flow program decomposition (B={b}, bf16)",
        **rows,
    }))


if __name__ == "__main__":
    main()
