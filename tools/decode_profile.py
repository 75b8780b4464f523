"""On-chip profile of the VAE DECODE path — the dominant cost of the
few-step/distilled sampling programs (round-4 verdict ask #4: 1-NFE flow ran
at 480 samples/s / 0.268 MFU and ~56% of its FLOPs are decode; nobody had
measured decode alone).

Protocol: chained applications inside ONE jitted ``lax.fori_loop`` (the
CLAUDE.md timing rule for the axon tunnel — per-dispatch latency is
~hundreds of us), input perturbed per iteration so XLA cannot CSE the
chain, scalar checksum fetch. Reports, per arm:

* ms/decode (B=32 amortized), decode-only samples/s;
* decode MFU  = cost-analysis FLOPs / time / 197e12 (v5e bf16 peak);
* achieved HBM bandwidth = cost-analysis bytes accessed / time, vs the
  ~819 GB/s v5e peak — the roofline axis that decides whether the decoder
  is compute- or bandwidth-walled.

Arms: bf16 stock XLA (the shipped program), bf16 + fused GroupNorm+SiLU
(Pallas, decoder shapes differ from the round-2 parity sweep), f32 stock
(contrast). Also times one UNet estimator step and the full 1-NFE flow
sample program so the decode share of the few-step protocol is measured,
not inferred.

Run ALONE on the chip:  python tools/decode_profile.py [--batch 32]
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

V5E_PEAK_FLOPS = 197e12
V5E_HBM_GBPS = 819.0

LAT = (32, 32, 8)
IMG = 256


def build(dtype):
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
    cast = lambda t: jax.tree_util.tree_map(lambda v: v.astype(dtype), t)
    return vae, cast(vp), unet, cast(up)


def cost(f, *args):
    """(flops, bytes_accessed) from XLA cost analysis, compiled on local CPU
    (backend-independent counts; avoids a second remote compile)."""
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            c = jax.jit(f).lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001 — roofline is diagnostics
        print(f"# cost_analysis unavailable: {e}", flush=True)
        return 0.0, 0.0


from _timing import time_chained  # noqa: E402


def decode_arm(batch, dtype, fused_gn, tag, fused_up=False, variant="phase4",
               s2d_tail=False):
    import medfusion_tpu.ops as ops
    from medfusion_tpu.nn import functional as F

    ops.enable_fused_group_norm(fused_gn)
    ops.enable_fused_up_conv(fused_up)
    ops.enable_s2d_decode_tail(s2d_tail)
    F.FUSED_UP_VARIANT = variant
    try:
        vae, vp, _, _ = build(dtype)
        z0 = jax.random.normal(jax.random.PRNGKey(1), (batch,) + LAT, dtype)

        def dec(z):
            out = vae.apply({"params": vp}, z, method=vae.decode)
            return jnp.sum(out).astype(jnp.float32)

        ms = time_chained(dec, z0)
    finally:
        ops.enable_fused_group_norm(False)
        ops.enable_fused_up_conv(False)
        ops.enable_s2d_decode_tail(False)
        F.FUSED_UP_VARIANT = "phase4"
    flops, nbytes = cost(lambda z: vae.apply({"params": vp}, z,
                                             method=vae.decode), z0)
    dt = ms / 1e3
    rec = {
        "arm": tag, "ms_per_decode": round(ms, 3),
        "samples_per_sec": round(batch / dt, 1),
        "decode_mfu": round(flops / dt / V5E_PEAK_FLOPS, 4) if flops else None,
        "achieved_gbps": round(nbytes / dt / 1e9, 1) if nbytes else None,
        "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBPS, 3) if nbytes else None,
        "tflops_per_batch": round(flops / 1e12, 4) if flops else None,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--skip-flow", action="store_true",
                    help="skip the full 1-NFE flow program arm (one extra "
                         "remote compile)")
    ap.add_argument("--up-ab", action="store_true",
                    help="A/B the fused 2x-upsample+conv decomposition "
                         "(ops.enable_fused_up_conv) on decode + the UNet "
                         "step instead of the default arm set. NOTE: the "
                         "fused arm's decode_mfu is SEMANTIC MFU (unfused "
                         "FLOP count / time) so the two arms share a "
                         "numerator; samples/s is the decider")
    ap.add_argument("--s2d-ab", action="store_true",
                    help="A/B the s2d decode tail "
                         "(ops.enable_s2d_decode_tail) on top of fused-up: "
                         "decode arms fused-up vs fused-up + s2d tail; "
                         "semantic MFU numerator as with --up-ab")
    args = ap.parse_args()
    print(f"# devices: {jax.devices()}", flush=True)
    b = args.batch

    if args.s2d_ab:
        rows = [
            decode_arm(b, jnp.bfloat16, False, "decode bf16 fused-up",
                       fused_up=True),
            decode_arm(b, jnp.bfloat16, False, "decode bf16 fused-up + s2d",
                       fused_up=True, s2d_tail=True),
        ]
    elif args.up_ab:
        rows = [
            decode_arm(b, jnp.bfloat16, False, "decode bf16 XLA"),
            decode_arm(b, jnp.bfloat16, False, "decode bf16 fused-up",
                       fused_up=True),
            decode_arm(b, jnp.bfloat16, False, "decode bf16 fused-up stacked",
                       fused_up=True, variant="stacked"),
        ]
    else:
        rows = [
            decode_arm(b, jnp.bfloat16, False, "decode bf16 XLA"),
            decode_arm(b, jnp.bfloat16, True, "decode bf16 fused-GN"),
            decode_arm(b, jnp.float32, False, "decode f32 XLA"),
        ]

    # one UNet estimator step (bf16) for the decode:unet cost ratio
    import medfusion_tpu.ops as ops

    _, _, unet, up = build(jnp.bfloat16)
    zu = jax.random.normal(jax.random.PRNGKey(2), (b,) + LAT, jnp.bfloat16)
    t = jnp.full((b,), 500, jnp.int32)
    c = jnp.zeros((b,), jnp.int32)

    def unet_step(z):
        out = unet.apply({"params": up}, z, t, c)
        out = out[0] if isinstance(out, (tuple, list)) else out
        return jnp.sum(out).astype(jnp.float32)

    uflops, _ = cost(lambda z: unet.apply({"params": up}, z, t, c), zu)
    unet_arms = [(False, "phase4", "unet step bf16")]
    if args.up_ab:
        unet_arms.append((True, "phase4", "unet step bf16 fused-up"))
        unet_arms.append((True, "stacked", "unet step bf16 fused-up stacked"))
    unet_recs = []
    from medfusion_tpu.nn import functional as F

    for fu, variant, tag in unet_arms:
        ops.enable_fused_up_conv(fu)
        F.FUSED_UP_VARIANT = variant
        try:
            ms_unet = time_chained(unet_step, zu)
        finally:
            ops.enable_fused_up_conv(False)
            F.FUSED_UP_VARIANT = "phase4"
        unet_rec = {
            "arm": tag, "ms_per_step": round(ms_unet, 3),
            "mfu": round(uflops / (ms_unet / 1e3) / V5E_PEAK_FLOPS, 4)
                   if uflops else None,
        }
        unet_recs.append(unet_rec)
        print(json.dumps(unet_rec), flush=True)
    unet_rec = unet_recs[0]

    flow_rec = None
    if not args.skip_flow:
        # the actual 1-NFE product program (flow Euler 1 step + decode),
        # bench protocol: jitted sample, scalar checksum, min of 3.
        # --s2d-ab times it with the full product-default kernel stack.
        if args.s2d_ab:
            ops.enable_fused_up_conv(True)
            ops.enable_s2d_decode_tail(True)
        from medfusion_tpu.pipelines.flow import FlowMatchingPipeline

        vae, vp, unet2, up2 = build(jnp.bfloat16)
        pipe = FlowMatchingPipeline(noise_estimator=unet2, latent_embedder=vae,
                                    compute_dtype=jnp.bfloat16)
        params = {"noise_estimator": up2, "latent_embedder": vp}
        cond = jnp.zeros((b,), jnp.int32)

        def run(p, r):
            out = pipe.sample(p, r, b, LAT, condition=cond, steps=1,
                              guidance_scale=1.0, heun=False)
            return jnp.sum(out)

        compiled = jax.jit(run).lower(params, jax.random.PRNGKey(0)).compile()
        float(compiled(params, jax.random.PRNGKey(0)))
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            float(compiled(params, jax.random.PRNGKey(i + 1)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        flow_rec = {"arm": "flow 1-NFE full program",
                    "ms_per_batch": round(dt * 1e3, 2),
                    "samples_per_sec": round(b / dt, 1)}
        print(json.dumps(flow_rec), flush=True)

    print(json.dumps({
        "metric": f"VAE decode roofline (chest 8x32x32 -> 256^2, B={b})"
                  + (" [fused-up A/B]" if args.up_ab else ""),
        "decode_arms": rows,
        "unet_step": unet_recs if args.up_ab else unet_rec,
        "flow_1nfe": flow_rec,
        "v5e_peaks": {"bf16_tflops": 197, "hbm_gbps": V5E_HBM_GBPS},
    }))


if __name__ == "__main__":
    main()
