"""On-chip A/B: attention-enabled diffusion TRAIN step, XLA softmax vs the
Pallas flash kernels (now differentiable — forward + dq/dkv backward kernels).

Protocol: the flagship chest train program (B=32, fp32, frozen-VAE encode of
256^2 inputs included — CLAUDE.md "Training throughput") with
use_attention='spatial' so the top level runs 1024-token softmax attention on
BOTH the forward and backward graph. The ops wrapper's shape-aware dispatch
(MIN_KV_TOKENS, 256 since round 4) routes the 1024- and 256-token levels to
the kernel; the 16-64-token levels stay on XLA where the kernel measures
slower.

Run alone (two large remote compiles):
  python tools/train_flash_ab.py [--batch 32] [--steps 20] [--remat] [--bf16]

``--remat`` rematerializes each conv/attention stage under grad
(jax.checkpoint, the UNet's own switch) — the round-3 verdict #4 lever for
fitting B=32 with attention in v5e HBM: flash already avoids the [N,N]
probability matrix; remat drops the per-stage activations too.
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
import medfusion_tpu.ops as ops  # noqa: E402


def build(batch, remat=False):
    unet = UNet(in_ch=8, out_ch=8, hid_chs=(256, 256, 512, 1024),
                kernel_sizes=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                time_emb_dim=1024, cond_emb_num_classes=2,
                deep_supervision=0, use_attention="spatial", remat=remat)
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


def mem_analysis(pipe, state, vae_params, batch_data, compute_dtype=None):
    """Compile (no execution) and print XLA's HBM accounting — how the
    RESOURCE_EXHAUSTED arms get their 'documented HBM accounting showing it
    truly cannot fit' without a single step running."""
    step = make_diffusion_train_step(pipe, donate=True,
                                     compute_dtype=compute_dtype)
    comp = step.lower(state, vae_params, batch_data,
                      jax.random.PRNGKey(0)).compile()
    ma = comp.memory_analysis()
    if ma is None:
        print("# memory_analysis unavailable on this backend", flush=True)
        return None
    rec = {k: round(getattr(ma, k) / 2**30, 3)
           for k in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "generated_code_size_in_bytes")
           if hasattr(ma, k)}
    # donation aliases args onto outputs, so peak ~ max(arg,out) + temp
    peak = (max(rec.get("argument_size_in_bytes", 0),
                rec.get("output_size_in_bytes", 0))
            + rec.get("temp_size_in_bytes", 0))
    rec["est_peak_gib"] = round(peak, 3)
    print("# mem:", json.dumps(rec), flush=True)
    return rec


def time_steps(pipe, state, vae_params, batch_data, n_steps, compute_dtype=None):
    # donate=True (the train CLIs' default): without donation the async
    # dispatch queue below keeps EVERY in-flight step's full state alive —
    # that, not model capacity, is what produced round 3's "B=32 with
    # attention exceeds v5e HBM" (RESOURCE_EXHAUSTED mid-loop after a clean
    # warmup). Donation holds exactly one state. The incoming state is
    # copied first so the second A/B arm gets fresh, undonated buffers.
    state = jax.tree_util.tree_map(jnp.array, state)
    step = make_diffusion_train_step(pipe, donate=True,
                                     compute_dtype=compute_dtype)
    jstep = step
    # warm (compile)
    s, m = jstep(state, vae_params, batch_data,
                 jax.random.PRNGKey(0))
    float(m["loss"])
    # dispatch all steps asynchronously and block ONCE at the end: a per-step
    # loss fetch through the axon tunnel costs tens of ms of pure latency and
    # was inflating both arms (~90 ms/step measured with per-step sync vs the
    # round-2 58 ms for this program)
    t0 = time.perf_counter()
    for i in range(n_steps):
        s, m = jstep(s, vae_params, batch_data, jax.random.PRNGKey(i + 1))
    loss = float(m["loss"])  # single sync
    dt = (time.perf_counter() - t0) / n_steps
    try:  # HBM accounting for the PARITY record (axon may not expose it)
        st = jax.local_devices()[0].memory_stats() or {}
        peak = st.get("peak_bytes_in_use")
        if peak:
            print(f"# peak HBM: {peak/2**30:.2f} GiB", flush=True)
    except Exception:
        pass
    return dt, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--fused-geglu", action="store_true",
                    help="also enable the fused GEGLU-MLP kernel in the "
                         "flash arm (fwd kernel + XLA-recompute backward)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each conv/attention stage (memory "
                         "for FLOPs; the B=32-with-attention enabler)")
    ap.add_argument("--bf16", action="store_true",
                    help="run BOTH arms in mixed-precision bf16 (composes "
                         "the two measured optimizations; the flash kernel "
                         "then sees bf16 q/k/v)")
    ap.add_argument("--arm", choices=("both", "xla", "flash"), default="both",
                    help="run one arm per PROCESS at the HBM edge: with "
                         "'both', arm 2 shares HBM with arm 1's loaded "
                         "executable + final state — at B=32 that overhead "
                         "is the difference between fitting and "
                         "RESOURCE_EXHAUSTED")
    ap.add_argument("--mem-only", action="store_true",
                    help="compile each requested arm and print XLA's HBM "
                         "accounting WITHOUT executing (for arms that "
                         "RESOURCE_EXHAUST at runtime)")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.bf16 else None
    prec = "bf16" if args.bf16 else "fp32"

    pipe, state, vae_params, batch_data = build(args.batch, args.remat)

    if args.mem_only:
        for arm in (("xla", "flash") if args.arm == "both" else (args.arm,)):
            ops.enable_flash_attention(arm == "flash")
            if arm == "flash" and args.fused_geglu:
                ops.enable_fused_geglu(True)
            print(f"# arm={arm} B={args.batch} {prec}"
                  f"{' remat' if args.remat else ''}", flush=True)
            mem_analysis(pipe, state, vae_params, batch_data, dtype)
        return

    dt_xla = dt_flash = None
    if args.arm in ("both", "xla"):
        ops.enable_flash_attention(False)
        dt_xla, loss_xla = time_steps(pipe, state, vae_params, batch_data,
                                      args.steps, dtype)
        print(f"# xla:   {dt_xla*1e3:.1f} ms/step  loss={loss_xla:.4f}",
              flush=True)

    if args.arm in ("both", "flash"):
        ops.enable_flash_attention(True)
        if args.fused_geglu:
            ops.enable_fused_geglu(True)
        dt_flash, loss_flash = time_steps(pipe, state, vae_params, batch_data,
                                          args.steps, dtype)
        print(f"# flash: {dt_flash*1e3:.1f} ms/step  loss={loss_flash:.4f}",
              flush=True)

    rec = {
        "metric": "chest spatial-attention train step (B=%d, %s%s, incl VAE encode)"
                  % (args.batch, prec, ", remat" if args.remat else ""),
    }
    if dt_xla is not None:
        rec["xla_ms"] = round(dt_xla * 1e3, 2)
        rec["samples_per_sec_xla"] = round(args.batch / dt_xla, 2)
    if dt_flash is not None:
        rec["flash_ms"] = round(dt_flash * 1e3, 2)
        rec["samples_per_sec_flash"] = round(args.batch / dt_flash, 2)
    if dt_xla is not None and dt_flash is not None:
        rec["speedup"] = round(dt_xla / dt_flash, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
