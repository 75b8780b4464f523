"""On-chip cost of classifier guidance on the headline chest program.

Same protocol as bench.py (150-step DDIM, B=32, bf16, decode included) plus
per-step classifier gradients from a guided-diffusion-scale EncoderUNetOpenAI
(random weights — this measures COST, not quality; the guidance adds one
classifier forward + backward per denoise step inside the scan).

Run alone on the chip (one large remote compile):
  python tools/guided_bench.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import sys

sys.path.insert(0, ".")
from bench import DEFAULT_BATCH, STEPS, build  # noqa: E402

from medfusion_tpu.models.unet_openai import EncoderUNetOpenAI  # noqa: E402
from medfusion_tpu.pipelines.diffusion import make_classifier_grad  # noqa: E402


def main():
    batch = DEFAULT_BATCH
    pipe, params = build("chest")

    clf = EncoderUNetOpenAI(
        image_size=32, in_channels=8, model_channels=128, out_channels=2,
        num_res_blocks=2, attention_resolutions=(), channel_mult=(1, 2, 4),
        pool="adaptive")
    key = jax.random.PRNGKey(0)
    clf_params = clf.init(key, jnp.zeros((1, 32, 32, 8)),
                          jnp.zeros((1,), jnp.int32))["params"]
    clf_params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), clf_params)
    label = jnp.zeros((batch,), jnp.int32)
    grad_fn = make_classifier_grad(
        lambda x, t: clf.apply({"params": clf_params},
                               x.astype(jnp.bfloat16), t).astype(jnp.float32),
        label)

    cond = jnp.zeros((batch,), jnp.int32)

    def run(params, rng):
        out = pipe.sample(
            params, rng, batch, (32, 32, 8), condition=cond,
            steps=STEPS, use_ddim=True, guidance_scale=1.0, eta=1.0,
            classifier_grad=grad_fn, classifier_scale=2.0)
        return jnp.sum(out)

    compiled = jax.jit(run).lower(params, jax.random.PRNGKey(0)).compile()
    float(compiled(params, jax.random.PRNGKey(0)))  # settle
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(compiled(params, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    sps = batch / min(times)
    print(json.dumps({
        "metric": "256x256 samples/sec/chip, 150-step DDIM + classifier "
                  "guidance (chest, bf16, EncoderUNetOpenAI-128 grad/step)",
        "value": round(sps, 4), "unit": "samples/s", "batch": batch}))


if __name__ == "__main__":
    main()
