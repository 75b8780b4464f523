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

from medfusion_tpu.pipelines.flow import FlowMatchingPipeline  # noqa: E402

LAT = (32, 32, 8)
IMG = 256


def build():
    # same chest flagship models as decode_profile (ONE builder definition —
    # the two profilers must measure the identical program)
    from decode_profile import build as _build_models

    vae, vp, unet, up = _build_models(jnp.bfloat16)
    pipe = FlowMatchingPipeline(noise_estimator=unet, latent_embedder=vae,
                                compute_dtype=jnp.bfloat16)
    return pipe, {"noise_estimator": up, "latent_embedder": vp}


from _timing import time_chained as _time_chained  # noqa: E402


def time_chained(apply_fn, z0, iters=10):
    # the 1-NFE program is ~30+ ms/application — 10 chained iterations
    # amortize dispatch fully within the tool's compile budget
    return _time_chained(apply_fn, z0, iters=iters)


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
