"""Sample a grid per condition (smoke demo).

CLI parity with ``/root/reference/scripts/sample.py:26-57``: for condition in
{0, 1, None}, sample n images (DDIM 150 steps, guidance 8), save grids and the
cond-vs-uncond absolute-difference image.

Usage:
  python -m medfusion_tpu.cli.sample --preset chest --ckpt runs/diffusion/checkpoints \
      [--vae-ckpt ...] [--n 16] [--steps 150] [--guidance 8]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medfusion_tpu.cli.kernels import add_kernel_args, resolve_kernel_flags
from medfusion_tpu.cli.presets import PRESETS, build_scheduler, build_unet, build_vae
from medfusion_tpu.cli.train_diffusion import load_vae_params
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.logging import save_image_grid


def load_pipeline(args, p):
    key = jax.random.PRNGKey(args.seed)
    vae = build_vae(p)
    unet = build_unet(p, getattr(args, "estimator", "unet"),
                      attention=getattr(args, "attention", "none"),
                      attn_heads=getattr(args, "attention_heads", 8))
    if getattr(args, "family", "diffusion") == "flow":
        from medfusion_tpu.pipelines.flow import FlowMatchingPipeline

        pipe = FlowMatchingPipeline(
            noise_estimator=unet, latent_embedder=vae,
            do_input_centering=False,
            shift=getattr(args, "flow_shift", 1.0),
            latent_scale=getattr(args, "latent_scale", 1.0),
            latent_shift=getattr(args, "latent_shift", 0.0))
    else:
        pipe = DiffusionPipeline(scheduler=build_scheduler(
                                     p, zero_terminal_snr=getattr(args, "zero_terminal_snr", False)),
                                 noise_estimator=unet,
                                 latent_embedder=vae, do_input_centering=False, clip_x0=False,
                                 estimator_objective=getattr(args, "objective", "x_T"),
                                 latent_scale=getattr(args, "latent_scale", 1.0),
                                 latent_shift=getattr(args, "latent_shift", 0.0))
    vae_params = load_vae_params(vae, p, args.vae_ckpt, key)
    h, w, c = p.latent_shape
    z0 = np.zeros((1, h, w, c), np.float32)
    t0 = np.zeros((1,), np.int32)
    unet_params = unet.init(key, z0, t0, t0 if p.num_classes else None)["params"]
    if args.ckpt and str(args.ckpt).endswith(".ckpt"):
        # reference Lightning DiffusionPipeline checkpoint (torch)
        from medfusion_tpu.utils.torch_compat import convert_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(args.ckpt)
        unet_params = convert_state_dict(sd, strip_prefix="noise_estimator.")
        le = convert_state_dict(sd, strip_prefix="latent_embedder.")
        if le:
            vae_params = le
    elif args.ckpt:
        template = TrainState.create(unet_params, optax.adamw(1e-4), use_ema=args.ema)
        state = C.restore_checkpoint(args.ckpt, template)
        unet_params = state.inference_params
    return pipe, {"noise_estimator": unet_params, "latent_embedder": vae_params}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--ckpt", default=None, help="diffusion checkpoint dir")
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--out", default="results/samples")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--guidance", type=float, default=8.0)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--encoder-key-every", type=int, default=1,
                    help=">1 uses the encoder-propagation fast sampler")
    ap.add_argument("--estimator", default="unet",
                    choices=("unet", "unet_legacy", "openai", "lucidrains", "dit"),
                    help="noise-estimator family the checkpoint was trained with")
    ap.add_argument("--objective", choices=("x_T", "x_0", "v"), default="x_T",
                    help="parameterization the checkpoint was trained with")
    ap.add_argument("--family", choices=("diffusion", "flow"),
                    default="diffusion",
                    help="flow = rectified-flow / flow-matching checkpoint "
                         "(cli.train_diffusion --family flow; beyond-"
                         "reference, arXiv:2210.02747/2403.03206) — sampled "
                         "with the Heun probability-flow ODE")
    ap.add_argument("--flow-shift", type=float, default=1.0,
                    help="SD3 resolution shift of the flow sampling grid "
                         "(arXiv:2403.03206 eq. 23; 1 = uniform)")
    ap.add_argument("--sampler", choices=["ddim", "dpmpp", "edm", "consistency"],
                    default="ddim",
                    help="dpmpp = DPM-Solver++(2M), comparable quality at "
                         "25-50 steps (beyond-reference, arXiv:2211.01095); "
                         "edm = Karras 2nd-order Heun on the Karras sigma "
                         "grid (beyond-reference, arXiv:2206.00364); "
                         "consistency = 1/few-step consistency model "
                         "(checkpoint from cli.distill --method cd, "
                         "arXiv:2303.01469) — --steps means f/renoise "
                         "alternations (1-4)")
    ap.add_argument("--cd-sigma-data", type=float, default=0.5,
                    help="sigma_data the consistency model was trained with")
    ap.add_argument("--edm-churn", type=float, default=0.0,
                    help="EDM S_churn: >0 adds stochastic churn (Alg. 2)")
    ap.add_argument("--edm-rho", type=float, default=7.0,
                    help="EDM sigma-grid warp exponent (paper default 7)")
    ap.add_argument("--classifier-ckpt", default=None,
                    help="noisy-latent classifier run dir (cli/train_classifier) "
                         "for classifier-guided sampling (arXiv:2105.05233)")
    ap.add_argument("--classifier-scale", type=float, default=1.0)
    ap.add_argument("--classifier-model-channels", type=int, default=64)
    ap.add_argument("--classifier-pool", default="adaptive",
                    choices=("adaptive", "attention", "spatial", "spatial_v2"))
    ap.add_argument("--zero-terminal-snr", action="store_true",
                    help="checkpoint was trained with --zero-terminal-snr "
                         "(rescaled schedule, arXiv:2305.08891)")
    ap.add_argument("--timestep-spacing", choices=("linspace", "trailing"),
                    default=None,
                    help="DDIM grid spacing; 'trailing' is the 2305.08891 "
                         "recommendation (default for --zero-terminal-snr)")
    ap.add_argument("--guidance-rescale", type=float, default=0.0,
                    help="phi of arXiv:2305.08891 §3.4: rescale the CFG "
                         "output std toward the conditional prediction's "
                         "(0 = off; paper uses 0.7)")
    ap.add_argument("--latent-scale", type=float, default=1.0,
                    help="must match the value used at training time")
    ap.add_argument("--latent-shift", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    add_kernel_args(ap)
    args = ap.parse_args(argv)
    resolve_kernel_flags(args, ap)
    if args.family == "flow":
        # mirror sample_dataset: reject diffusion-schedule flags instead of
        # silently ignoring them
        if args.zero_terminal_snr or args.guidance_rescale > 0:
            ap.error("--zero-terminal-snr/--guidance-rescale are diffusion-"
                     "schedule options; the flow family has no schedule")
        if args.timestep_spacing is not None:
            ap.error("--timestep-spacing is a diffusion DDIM-grid option; "
                     "the flow ODE grid is set by --flow-shift")
        if args.objective != "x_T":
            ap.error("--objective selects a diffusion parameterization; "
                     "flow checkpoints are velocity models")
    if args.timestep_spacing is None:
        args.timestep_spacing = "trailing" if args.zero_terminal_snr else "linspace"
    if args.classifier_ckpt and args.encoder_key_every > 1:
        ap.error("--classifier-ckpt guidance is not wired into the "
                 "encoder-propagation fast sampler; drop --encoder-key-every")
    if args.guidance_rescale > 0 and args.encoder_key_every > 1:
        ap.error("--guidance-rescale is not wired into the encoder-"
                 "propagation fast sampler; drop --encoder-key-every")

    if args.family == "flow":
        if args.sampler != "ddim":
            ap.error("--family flow has its own ODE sampler; drop --sampler")
        if args.classifier_ckpt:
            ap.error("classifier guidance is not wired into the flow family")
        if args.encoder_key_every > 1:
            ap.error("--encoder-key-every is a diffusion-family fast path")

    p = PRESETS[args.preset]
    pipe, params = load_pipeline(args, p)

    clf = clf_params = None
    if args.classifier_ckpt:
        from medfusion_tpu.cli.train_classifier import load_classifier

        clf, clf_params = load_classifier(p, args.classifier_ckpt,
                                          args.classifier_model_channels,
                                          args.classifier_pool)
    out = Path(args.out)
    # the flow ODE step count is schedule-free; diffusion grids cap at T
    steps = args.steps if args.family == "flow" else min(args.steps, p.timesteps)

    results = {}
    for cond_val in ([0, 1, None] if p.num_classes else [None]):
        cond = None if cond_val is None else jnp.full((args.n,), cond_val, jnp.int32)
        rng = jax.random.PRNGKey(args.seed)  # same noise across conditions (sample.py:37)
        gs = args.guidance if cond_val is not None else 1.0
        guided = {}
        if clf is not None and cond_val is not None:
            from medfusion_tpu.pipelines.diffusion import make_classifier_grad

            guided = dict(
                classifier_grad=make_classifier_grad(
                    lambda x, t: clf.apply({"params": clf_params}, x, t),
                    jnp.full((args.n,), cond_val, jnp.int32)),
                classifier_scale=args.classifier_scale)
        spacing = dict(timestep_spacing=args.timestep_spacing)
        if args.family == "flow":
            imgs = pipe.sample(params, rng, args.n, p.latent_shape,
                               condition=cond, steps=steps, guidance_scale=gs,
                               shift=args.flow_shift)
        elif args.sampler == "consistency":
            if guided:
                ap.error("--classifier-ckpt guidance is not wired into "
                         "consistency sampling; use ddim/dpmpp")
            from medfusion_tpu.train.consistency import consistency_sample

            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, (args.n, *p.latent_shape))
            imgs = consistency_sample(
                pipe, params, x_T, rng=k2, steps=min(args.steps, 8),
                condition=cond, sigma_data=args.cd_sigma_data)
        elif args.sampler == "edm":
            if guided:
                ap.error("--classifier-ckpt guidance is not wired into the "
                         "EDM sampler (fractional-t queries); use ddim/dpmpp")
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, (args.n, *p.latent_shape))
            imgs = pipe.denoise_edm(
                params, x_T, rng=k2 if args.edm_churn > 0 else None,
                condition=cond, steps=steps, guidance_scale=gs,
                s_churn=args.edm_churn, rho=args.edm_rho,
                guidance_rescale=args.guidance_rescale)
        elif args.sampler == "dpmpp":
            k1, _ = jax.random.split(rng)
            x_T = jax.random.normal(k1, (args.n, *p.latent_shape))
            imgs = pipe.denoise_dpmpp(params, x_T, condition=cond, steps=steps,
                                      guidance_scale=gs,
                                      guidance_rescale=args.guidance_rescale,
                                      **spacing, **guided)
        elif args.encoder_key_every > 1:
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, (args.n, *p.latent_shape))
            imgs = pipe.denoise_fast(params, x_T, k2, condition=cond, steps=steps,
                                     guidance_scale=gs,
                                     encoder_key_every=args.encoder_key_every,
                                     **spacing)
        else:
            imgs = pipe.sample(params, rng, args.n, p.latent_shape, condition=cond,
                               steps=steps, use_ddim=True, guidance_scale=gs,
                               guidance_rescale=args.guidance_rescale,
                               **spacing, **guided)
        results[cond_val] = np.asarray(imgs)
        save_image_grid(results[cond_val], out / f"sample_cond_{cond_val}.png")
        print(f"condition={cond_val}: wrote {out}/sample_cond_{cond_val}.png")

    if 0 in results and 1 in results:
        save_image_grid(np.abs(results[0] - results[1]), out / "sample_diff.png")


if __name__ == "__main__":
    main()
