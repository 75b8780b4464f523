"""Headline benchmark: 256x256 samples/sec/chip, 150-step DDIM (chest config).

Protocol parity with the reference bulk-sampling path
(``/root/reference/scripts/helpers/sample_dataset.py:24-41``: DDIM, guidance 1,
conditional, chest latent 8x32x32 -> VAE-decoded 256x256):

* UNet: hid (256,256,512,1024), strides (1,2,2,2), time emb 1024, 2 classes
  (``scripts/train_diffusion.py:83-98``).
* VAE decoder: emb 8, hid (64,128,256,512) (``scripts/train_latent_embedder_2d.py:68-81``).
* The entire 150-step loop + decode is ONE jitted lax.scan program; bf16
  params/activations (BASELINE: fp32 bit-faithful parity is tested in
  tests/, bf16 is the validated production dtype).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"batch", "tflops_per_sample"}.

* ``mfu`` — measured model FLOP utilization: (FLOPs/sample x samples/s) /
  197e12 (v5e bf16 peak). FLOPs/sample comes from XLA's own cost analysis of
  the UNet forward (x150) + VAE decode.
* ``vs_baseline`` — measured throughput / an analytic estimate of the
  reference on A100: the same per-sample FLOPs divided by an assumed
  55 TFLOP/s effective for eager fp32/TF32 torch (~35% of TF32 peak —
  generous for an eager per-step host loop). The reference publishes no
  measured number (BASELINE.md), so this constant is the documented stand-in.
* Batch size: the protocol metric is samples/s/chip; batch is free headroom.
  ``--sweep`` measures B in {32, 64, 128} (3 large remote compiles, run it
  alone); the default single-run batch below is the sweep's winner.

Usage:
  python bench.py            # suite: flow-30-step + 8-step-trailing lines,
                             # then the 150-step headline line LAST (the
                             # driver parses the last line; its "suite" field
                             # carries the variants). Also refreshes
                             # BENCH_SUITE.json at the repo root.
  python bench.py --headline-only  # just the 150-step headline
  python bench.py --batch 64 # one measurement at a chosen batch
  python bench.py --sweep    # full batch sweep, prints one line per batch,
                             # final JSON line is the best
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeat runs skip the multi-minute remote
# TPU compile (cache key = HLO hash; safe across processes).
jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

DEFAULT_BATCH = 32  # round-2 sweep winner (see PARITY.md "Batch sweep")
STEPS = 150

# Flagship latent geometries (BASELINE.md): chest 8ch@32x32 -> 256^2,
# eye 4ch@32x32 -> 256^2, colon 4ch@64x64 -> 512^2 (scripts/sample.py:45,
# streamlit/pages/{chest,eye,colon}.py). The UNet keeps the pinned chest
# trunk (train_diffusion.py:83-98) with the family's latent channels.
PRESETS = {
    "chest": {"latent": (32, 32, 8), "image": 256},
    "eye": {"latent": (32, 32, 4), "image": 256},
    "colon": {"latent": (64, 64, 4), "image": 512},
}
RUNS = 3
V5E_PEAK_FLOPS = 197e12  # bf16
A100_EFFECTIVE_FLOPS = 0.35 * 156e12  # eager torch TF32 estimate, documented above


def build(preset="chest", attention="none", family="diffusion", attn_heads=8):
    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.models.latent_embedders import VAE
    from medfusion_tpu.models.unet import UNet
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

    lat = PRESETS[preset]["latent"]
    img = PRESETS[preset]["image"]
    unet = UNet(in_ch=lat[-1], out_ch=lat[-1], hid_chs=(256, 256, 512, 1024),
                kernel_sizes=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                time_emb_dim=1024, cond_emb_num_classes=2,
                deep_supervision=0, use_attention=attention,
                attn_heads=attn_heads)
    vae = VAE(in_channels=3, out_channels=3, emb_channels=lat[-1],
              hid_chs=(64, 128, 256, 512), deep_supervision=0)
    if family == "flow":
        from medfusion_tpu.pipelines.flow import FlowMatchingPipeline

        pipe = FlowMatchingPipeline(noise_estimator=unet, latent_embedder=vae,
                                    compute_dtype=jnp.bfloat16)
    else:
        sched = GaussianDiffusionSchedule.create(
            timesteps=1000, schedule_strategy="scaled_linear", beta_start=0.002, beta_end=0.02
        )
        pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, latent_embedder=vae,
                                 compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1,) + lat, jnp.float32)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    params = {
        "noise_estimator": unet.init(key, z, t0, t0)["params"],
        "latent_embedder": vae.init({"params": key, "sample": key}, x)["params"],
    }
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
    return pipe, params


def flops_per_sample(pipe, params, preset="chest", nfe=STEPS):
    """One UNet forward x ``nfe`` + one decode, from XLA cost analysis
    (compiled on local CPU — FLOP counts are backend-independent and this
    avoids extra remote-compile round trips).

    SEMANTIC FLOPs: the fused 2x-upsample+conv decomposition (2.25x fewer
    MACs on converted levels) and the s2d decode tail (16/9 the MACs on the
    final decoder level) are forced OFF for the count so every round's
    mfu/tflops_per_sample shares the stock numerator — the measured time
    is the only thing the switches change (PARITY.md fused-up / s2d A/Bs)."""
    import medfusion_tpu.ops as ops

    def flops_of(f, *args):
        prev = ops.fused_up_conv_enabled()
        prev_s2d = ops.s2d_decode_tail_enabled()
        ops.enable_fused_up_conv(False)
        ops.enable_s2d_decode_tail(False)
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                return float(jax.jit(f).lower(*args).compile().cost_analysis()["flops"])
        except Exception:
            return 0.0
        finally:
            ops.enable_fused_up_conv(prev)
            ops.enable_s2d_decode_tail(prev_s2d)

    z1 = jnp.zeros((1,) + PRESETS[preset]["latent"], jnp.bfloat16)
    t1 = jnp.zeros((1,), jnp.int32)
    unet_flops = flops_of(
        lambda p, z, t, c: pipe._apply_estimator(p, z, t, c, None, jnp.ones((1,), z.dtype))[0],
        params, z1, t1, t1,
    )
    decode_flops = flops_of(lambda p, z: pipe.decode_latent(p, z), params, z1)
    return unet_flops * nfe + decode_flops


def run_bench(pipe, params, batch, fps, preset="chest", attention_label="none",
              sampler="ddim", steps=STEPS, eta=1.0, timestep_spacing="linspace",
              amortize=1):
    cond = jnp.zeros((batch,), jnp.int32)
    lat = PRESETS[preset]["latent"]

    def run(params, rng):
        if sampler == "flow":
            out = pipe.sample(params, rng, batch, lat, condition=cond,
                              steps=steps, guidance_scale=1.0, heun=True)
        elif sampler == "edm":
            k_init, _ = jax.random.split(rng)
            x_T = jax.random.normal(k_init, (batch, *lat))
            out = pipe.denoise_edm(params, x_T, condition=cond, steps=steps,
                                   guidance_scale=1.0)
        else:
            out = pipe.sample(
                params, rng, batch, lat, condition=cond,
                steps=steps, use_ddim=True, guidance_scale=1.0, eta=eta,
                timestep_spacing=timestep_spacing,
            )
        # Scalar checksum: forces the full computation while keeping the
        # host transfer at 4 bytes (the axon tunnel's bulk fetch would
        # otherwise dominate the timing).
        return jnp.sum(out)

    compiled = jax.jit(run).lower(params, jax.random.PRNGKey(0)).compile()
    float(compiled(params, jax.random.PRNGKey(0)))  # settle
    times = []
    for i in range(RUNS):
        # amortize > 1 (few-step programs): dispatch K batches async, ONE
        # scalar fetch — a single-device stream executes programs in order,
        # so fetching the last checksum waits for all K. Per-dispatch tunnel
        # latency (~26 ms, tools/few_step_profile.py) amortizes to latency/K,
        # exactly like a production serving loop; the long programs keep the
        # historical single-dispatch protocol (overhead <0.1% at 150 steps).
        keys = [jax.random.PRNGKey(i * amortize + j + 1)
                for j in range(amortize)]
        t0 = time.perf_counter()
        outs = [compiled(params, k) for k in keys]
        float(outs[-1])
        times.append((time.perf_counter() - t0) / amortize)
    dt = min(times)

    import medfusion_tpu.ops as _ops

    samples_per_sec = batch / dt
    mfu = (fps * samples_per_sec / V5E_PEAK_FLOPS) if fps > 0 else float("nan")
    vs = (samples_per_sec / (A100_EFFECTIVE_FLOPS / fps)) if fps > 0 else float("nan")
    img = PRESETS[preset]["image"]
    lat_s = f"{lat[-1]}x{lat[0]}x{lat[1]}"
    ddim_s = f"{steps}-step DDIM" + (
        f" ({timestep_spacing}, eta={eta:g})"
        if (timestep_spacing, eta) != ("linspace", 1.0) else "")
    sampler_s = {"ddim": ddim_s,
                 "edm": f"{steps}-step EDM Heun ({2 * steps - 1} NFE)",
                 "flow": f"{steps}-step flow ODE Heun ({2 * steps - 1} NFE)",
                 }[sampler]
    return {
        "metric": f"{img}x{img} samples/sec/chip ({sampler_s}, {preset} latent {lat_s}, bf16)",
        "attention": attention_label,
        "value": round(samples_per_sec, 4),
        "unit": "samples/s",
        "vs_baseline": round(vs, 4),
        # vs_baseline is analytic, NOT measured: the reference publishes no
        # numbers (BASELINE.md "published": {}); the denominator is the
        # assumption below. value and mfu are the measured, trustworthy fields.
        "baseline_model": "A100 @ 0.35*156 TFLOP/s (assumed, unmeasured)",
        "mfu": round(mfu, 4),
        "batch": batch,
        "tflops_per_sample": round(fps / 1e12, 3),
        # actual trace-time state of the exact up+conv decomposition and the
        # s2d decode tail (mfu's FLOP numerator stays stock either way —
        # see flops_per_sample)
        "fused_up": _ops.fused_up_conv_enabled(),
        "s2d_tail": _ops.s2d_decode_tail_enabled(),
        **({"amortized_dispatch": amortize} if amortize > 1 else {}),
    }


def run_train_bench(batch=DEFAULT_BATCH, n_steps=20):
    """Flagship TRAIN-throughput measurement (round-4 verdict ask #5: make
    the train numbers driver-capturable, not builder-session-reported).

    Protocol = tools/train_bf16_ab.py (chest config, B=32, incl the frozen
    VAE encode of 256^2 inputs; reference train protocol
    ``/root/reference/scripts/train_diffusion.py:55,156-175``): f32 and bf16
    (--bf16 mixed-precision) arms, AMORTIZED-SYNC timing — dispatch n_steps
    async, ONE loss fetch at the end (a per-step float() pays ~20 ms tunnel
    latency). Train MFU only for the bf16 arm (f32 matmuls don't run at the
    bf16 peak, the ratio would be apples-to-oranges). Refreshes
    TRAIN_BENCH.json. Two remote compiles."""
    import numpy as np
    import optax

    import medfusion_tpu.ops as ops
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    pipe, _ = build("chest")
    unet, vae = pipe.noise_estimator, pipe.latent_embedder
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    state = TrainState.create(unet.init(key, z, t0, t0)["params"],
                              optax.adamw(1e-4))
    vae_params = vae.init({"params": key, "sample": key}, x)["params"]
    rng = np.random.default_rng(0)
    batch_data = {
        "source": jnp.asarray(
            rng.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32)),
        "target": jnp.zeros((batch,), jnp.int32),
    }

    def time_arm(compute_dtype):
        jstep = make_diffusion_train_step(pipe, donate=False,
                                          compute_dtype=compute_dtype)
        s, m = jstep(state, vae_params, batch_data, jax.random.PRNGKey(0))
        float(m["loss"])  # compile + settle
        t_start = time.perf_counter()
        for i in range(n_steps):
            s, m = jstep(s, vae_params, batch_data, jax.random.PRNGKey(i + 1))
        float(m["loss"])  # single sync
        return (time.perf_counter() - t_start) / n_steps, jstep

    dt_f32, _ = time_arm(None)
    dt_bf16, jstep = time_arm(jnp.bfloat16)
    try:
        # cost analysis of the EXECUTED program (identical HLO -> persistent
        # compile-cache hit, no extra remote compile). With fused-up enabled
        # the count is the executed (reduced) FLOPs, so train_mfu_bf16 is
        # executed-MFU — the fused_up field records which numerator applies.
        cost = jstep.lower(state, vae_params, batch_data,
                           jax.random.PRNGKey(0)).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — MFU is diagnostics, timing stands
        flops = 0.0
    rec = {
        "metric": f"chest train step, f32 + bf16 arms (B={batch}, incl "
                  "frozen VAE encode)",
        "value": round(batch / dt_bf16, 2),
        "unit": "samples/s (bf16 arm)",
        "f32_ms": round(dt_f32 * 1e3, 2),
        "bf16_ms": round(dt_bf16 * 1e3, 2),
        "bf16_speedup": round(dt_f32 / dt_bf16, 4),
        "batch": batch,
        "tflops_per_step": round(flops / 1e12, 3) if flops else None,
        "train_mfu_bf16": (round(flops / dt_bf16 / V5E_PEAK_FLOPS, 4)
                           if flops else None),
        "fused_up": ops.fused_up_conv_enabled(),
    }
    try:
        with open("TRAIN_BENCH.json", "w") as f:
            json.dump(rec, f, indent=1)
    except OSError:
        pass
    return rec


def _attn_label(args):
    return (args.attention + ("+flash" if args.flash else "")
            + ("+fgeglu" if args.fused_geglu else "")
            + (f"+h{args.attention_heads}" if args.attention_heads != 8 else ""))


def run_suite_extras(batch):
    """Measure the beyond-headline variants on the same chest geometry so the
    driver's default ``python bench.py`` run captures them (round-3 verdict
    ask: flow / few-step numbers must be driver-captured, not
    builder-reported). Each variant is one large remote compile; failures are
    recorded, never fatal to the headline. Returns (printed_records,
    compact_suite_dict)."""
    records, compact = [], {}

    def attempt(key, fn):
        try:
            r = fn()
            records.append(r)
            compact[key] = {"value": r["value"],
                            "mfu": r.get("mfu", r.get("train_mfu_bf16")),
                            "batch": r["batch"]}
            print(json.dumps(r), flush=True)
        except Exception as e:  # noqa: BLE001 — headline must still run
            compact[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"# suite variant {key} failed: {e}", flush=True)

    def _flow():
        pipe, params = build("chest", "none", family="flow")
        fps = flops_per_sample(pipe, params, "chest", nfe=2 * 30 - 1)
        return run_bench(pipe, params, batch, fps, "chest", "none",
                         sampler="flow", steps=30)

    def _fewstep():
        pipe, params = build("chest", "none")
        fps = flops_per_sample(pipe, params, "chest", nfe=8)
        return run_bench(pipe, params, batch, fps, "chest", "none",
                         sampler="ddim", steps=8, eta=0.0,
                         timestep_spacing="trailing", amortize=8)

    def _flow_1nfe():
        # the reflow/CT one-step-student protocol (PARITY "few-step
        # decomposition"): flow Euler, 1 NFE — the program is ~2/3 VAE decode
        pipe, params = build("chest", "none", family="flow")
        fps = flops_per_sample(pipe, params, "chest", nfe=1)
        return run_bench(pipe, params, batch, fps, "chest", "none",
                         sampler="flow", steps=1, amortize=8)

    attempt("flow_30step_heun", _flow)
    attempt("ddim_8step_trailing", _fewstep)
    attempt("flow_1nfe", _flow_1nfe)
    attempt("train_step", lambda: run_train_bench(batch))
    return records, compact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=DEFAULT_BATCH)
    ap.add_argument("--sweep", action="store_true",
                    help="measure B in {32,64,128}; final line = best")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest",
                    help="latent geometry; the driver headline is chest")
    ap.add_argument("--attention", choices=["none", "linear", "spatial"],
                    default="none",
                    help="UNet attention flavor (the pinned chest protocol is "
                         "'none'; 'spatial' measures the attention-enabled "
                         "program, 1024-token softmax at the top level)")
    ap.add_argument("--flash", action="store_true",
                    help="route attention through the Pallas flash kernel")
    ap.add_argument("--attention-heads", type=int, default=8,
                    help="attention heads (8 = reference geometry; 2 = the "
                         "TPU wide-head config, same projection shapes, "
                         "measured 3.93x faster einsums at the colon level)")
    ap.add_argument("--fused-geglu", action="store_true",
                    help="route the transformer MLP through the fused "
                         "LN+GEGLU+proj Pallas kernel (ops/geglu.py; only "
                         "meaningful with --attention spatial)")
    ap.add_argument("--fused-up", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="exact 4-phase 2x2 decomposition of every "
                         "integer-2x upsample+3x3-conv pair (UNet + VAE "
                         "decoder). Default ON — matches the product CLIs; "
                         "measured decode +9.4%%, UNet step +1.5%% "
                         "(PARITY.md round 5). MFU keeps the unfused "
                         "(semantic) FLOP numerator either way")
    ap.add_argument("--s2d-tail", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="exact space-to-depth execution of the final VAE "
                         "decoder level (one full-lane 2x2 conv per lane-"
                         "starved C=64 3x3 conv). Default ON — matches the "
                         "product CLIs; MFU keeps the stock FLOP numerator "
                         "either way")
    ap.add_argument("--sampler", choices=["ddim", "edm", "flow"],
                    default="ddim",
                    help="opt-in EDM (Karras Heun) or rectified-flow ODE "
                         "measurement; the driver headline is 150-step DDIM")
    ap.add_argument("--steps", type=int, default=STEPS,
                    help="sampler step count (headline protocol: 150)")
    ap.add_argument("--train", action="store_true",
                    help="measure ONLY the flagship train step (f32 + bf16 "
                         "arms, amortized-sync protocol) and print its JSON "
                         "line; refreshes TRAIN_BENCH.json. Also runs as "
                         "part of the default suite")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the flow/few-step suite extras (they run by "
                         "default on the plain invocation so the driver "
                         "captures them; ~2 extra remote compiles)")
    args = ap.parse_args()
    if args.flash and args.attention == "none":
        ap.error("--flash has no effect without attention layers; "
                 "add --attention spatial|linear")
    # flip BEFORE any tracing (read at trace time by BasicUp); the FLOP
    # counters force it off around their own lowerings (semantic numerator)
    import medfusion_tpu.ops as _ops

    _ops.enable_fused_up_conv(args.fused_up)
    _ops.enable_s2d_decode_tail(args.s2d_tail)
    if args.train:
        # the train bench IS the flagship chest protocol (see
        # run_train_bench docstring); flags it cannot honor are rejected
        # rather than silently recorded under the wrong config
        ignored = [name for name, off in (
            ("--preset", args.preset != "chest"),
            ("--attention", args.attention != "none"),
            ("--attention-heads", args.attention_heads != 8),
            ("--sampler", args.sampler != "ddim"),
            ("--steps", args.steps != STEPS),
            ("--sweep", args.sweep),
            ("--flash", bool(args.flash)),
            ("--fused-geglu", bool(args.fused_geglu)),
        ) if off]
        if ignored:
            ap.error(f"--train measures the fixed flagship chest train "
                     f"protocol and does not honor: {', '.join(ignored)} "
                     f"(use tools/train_flash_ab.py for attention arms)")
        print(json.dumps(run_train_bench(args.batch)))
        return

    # Suite extras only on the plain driver invocation (every flag at its
    # default): one JSON line per variant, then the headline line LAST with a
    # compact "suite" field so the driver's tail-parse carries all numbers.
    default_run = (not args.sweep and not args.headline_only
                   and args.batch == DEFAULT_BATCH and args.preset == "chest"
                   and args.attention == "none" and not args.flash
                   and not args.fused_geglu and args.attention_heads == 8
                   and args.sampler == "ddim" and args.steps == STEPS
                   and args.fused_up and args.s2d_tail)
    suite_records, suite_compact = ([], None)
    if default_run:
        suite_records, suite_compact = run_suite_extras(args.batch)

    pipe, params = build(args.preset, args.attention,
                         family="flow" if args.sampler == "flow" else "diffusion",
                         attn_heads=args.attention_heads)
    # FLOP counting runs on the XLA path (same math); the Pallas switch is
    # flipped afterwards and read at trace time by compute_attention.
    nfe = (2 * args.steps - 1) if args.sampler in ("edm", "flow") else args.steps
    fps = flops_per_sample(pipe, params, args.preset, nfe=nfe)
    if args.flash:
        import medfusion_tpu.ops as ops

        ops.enable_flash_attention(True)
    if args.fused_geglu:
        import medfusion_tpu.ops as ops

        ops.enable_fused_geglu(True)

    # few-step programs use the amortized-sync protocol (see run_bench);
    # matches the suite's 8-step/1-NFE lines so standalone runs reproduce them
    amortize = 8 if nfe <= 8 else 1
    if args.sweep:
        results = []
        for b in (32, 64, 128):
            r = run_bench(pipe, params, b, fps, args.preset, _attn_label(args),
                          args.sampler, args.steps, amortize=amortize)
            print(f"# batch {b}: {r['value']} samples/s  mfu={r['mfu']}", flush=True)
            results.append(r)
        best = max(results, key=lambda r: r["value"])
    else:
        best = run_bench(pipe, params, args.batch, fps, args.preset,
                         _attn_label(args), args.sampler, args.steps,
                         amortize=amortize)
    if suite_compact is not None:
        best["suite"] = suite_compact
        try:
            with open("BENCH_SUITE.json", "w") as f:
                json.dump({"headline": best, "variants": suite_records}, f,
                          indent=1)
        except OSError:
            pass
    print(json.dumps(best))


if __name__ == "__main__":
    main()
