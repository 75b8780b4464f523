"""On-chip A/B: the flagship chest diffusion TRAIN step, fp32 vs
mixed-precision bf16 (bf16 estimator + frozen-VAE-encode forward/backward,
f32 master weights/optimizer/loss — `make_diffusion_train_step(
compute_dtype=jnp.bfloat16)`, CLI `train_diffusion --bf16`).

Protocol: the round-2 training-throughput program (chest config, B=32,
attention 'none', incl. frozen VAE encode of 256^2 inputs — CLAUDE.md
"Training throughput": fp32 measured 58-59 ms/step).

Run alone (two large remote compiles):
  python tools/train_bf16_ab.py [--batch 32] [--steps 20]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import sys

sys.path.insert(0, ".")

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule  # noqa: E402
from medfusion_tpu.models.latent_embedders import VAE  # noqa: E402
from medfusion_tpu.models.unet import UNet  # noqa: E402
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline  # noqa: E402
from medfusion_tpu.train import TrainState, make_diffusion_train_step  # noqa: E402


def build(batch):
    unet = UNet(in_ch=8, out_ch=8, hid_chs=(256, 256, 512, 1024),
                kernel_sizes=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                time_emb_dim=1024, cond_emb_num_classes=2,
                deep_supervision=0, use_attention="none")
    vae = VAE(in_channels=3, out_channels=3, emb_channels=8,
              hid_chs=(64, 128, 256, 512), deep_supervision=0)
    sched = GaussianDiffusionSchedule.create(
        timesteps=1000, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=vae, do_input_centering=False,
                             clip_x0=False)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    unet_params = unet.init(key, z, t0, t0)["params"]
    vae_params = vae.init({"params": key, "sample": key}, x)["params"]
    state = TrainState.create(unet_params, optax.adamw(1e-4))
    rng = np.random.default_rng(0)
    batch_data = {
        "source": jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32)),
        "target": jnp.zeros((batch,), jnp.int32),
    }
    return pipe, state, vae_params, batch_data


def step_flops(jstep, state, vae_params, batch_data):
    """XLA cost-analysis FLOPs of ONE train step (fwd+bwd+optimizer), same
    method as bench.py's sampling MFU. Reuses the ALREADY-COMPILED jit
    instance so this costs no extra remote compile."""
    try:
        lowered = jstep.lower(state, vae_params, batch_data,
                              jax.random.PRNGKey(0))
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 - diagnostics-only path
        print(f"# cost_analysis unavailable: {e}", flush=True)
        return 0.0


def time_steps(pipe, state, vae_params, batch_data, n_steps, compute_dtype):
    jstep = make_diffusion_train_step(pipe, donate=False,
                                      compute_dtype=compute_dtype)
    s, m = jstep(state, vae_params, batch_data, jax.random.PRNGKey(0))
    float(m["loss"])  # compile + settle
    # dispatch all steps asynchronously and block ONCE at the end: a per-step
    # loss fetch through the axon tunnel costs tens of ms of pure latency and
    # was inflating both arms (~90 ms/step measured with per-step sync vs the
    # round-2 58 ms for this program)
    t0 = time.perf_counter()
    for i in range(n_steps):
        s, m = jstep(s, vae_params, batch_data, jax.random.PRNGKey(i + 1))
    loss = float(m["loss"])  # single sync
    dt = (time.perf_counter() - t0) / n_steps
    return dt, loss, jstep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    pipe, state, vae_params, batch_data = build(args.batch)

    dt_f32, loss_f32, _ = time_steps(pipe, state, vae_params, batch_data,
                                     args.steps, None)
    print(f"# f32:  {dt_f32*1e3:.1f} ms/step  loss={loss_f32:.4f}", flush=True)

    dt_bf16, loss_bf16, jstep_bf16 = time_steps(pipe, state, vae_params,
                                                batch_data, args.steps,
                                                jnp.bfloat16)
    print(f"# bf16: {dt_bf16*1e3:.1f} ms/step  loss={loss_bf16:.4f}", flush=True)

    # Training MFU for the bf16 arm: XLA cost-analysis FLOPs of the full
    # step (fwd+bwd+optimizer) / measured time / v5e bf16 peak — same
    # method as bench.py's sampling MFU. (No MFU for the f32 arm: its
    # matmuls don't run at the bf16 peak, so the ratio would be apples to
    # oranges.)
    flops = step_flops(jstep_bf16, state, vae_params, batch_data)
    peak = 197e12  # v5e bf16 peak FLOP/s
    mfu_bf16 = flops / dt_bf16 / peak if flops else None

    print(json.dumps({
        "metric": "chest train step f32 vs bf16 (B=%d, incl VAE encode)" % args.batch,
        "f32_ms": round(dt_f32 * 1e3, 2),
        "bf16_ms": round(dt_bf16 * 1e3, 2),
        "speedup": round(dt_f32 / dt_bf16, 4),
        "samples_per_sec_bf16": round(args.batch / dt_bf16, 2),
        "tflops_per_step": round(flops / 1e12, 3) if flops else None,
        "train_mfu_bf16": round(mfu_bf16, 4) if mfu_bf16 else None,
    }))


if __name__ == "__main__":
    main()
