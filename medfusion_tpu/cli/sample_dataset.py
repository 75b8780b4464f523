"""Bulk dataset generation for FID evaluation.

CLI parity with ``/root/reference/scripts/helpers/sample_dataset.py:22-57``:
for steps x label, generate N samples in chunks (guidance 1, un_cond=1-label),
write ``fake_{i}.png`` uint8. TPU upgrade: each chunk is ONE batch-sharded
jitted program over the device mesh (BASELINE config 5) instead of a host loop
on one GPU.

Usage:
  python -m medfusion_tpu.cli.sample_dataset --preset chest --ckpt ... \
      --n-samples 7869 --chunk 200 --steps-list 50 100 150 200 250
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from medfusion_tpu.cli.kernels import add_kernel_args, resolve_kernel_flags
from medfusion_tpu.cli.presets import PRESETS
from medfusion_tpu.cli.sample import load_pipeline
from medfusion_tpu.parallel import make_mesh, make_sharded_sampler
from medfusion_tpu.utils.logging import to_uint8


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--out", default="results/fake")
    ap.add_argument("--n-samples", type=int, default=7869)
    ap.add_argument("--chunk", type=int, default=200)
    ap.add_argument("--steps-list", type=int, nargs="+", default=[50, 100, 150, 200, 250])
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--encoder-key-every", type=int, default=1,
                    help=">1 enables the encoder-propagation fast sampler (approximate)")
    ap.add_argument("--estimator", default="unet",
                    choices=("unet", "unet_legacy", "openai", "lucidrains", "dit"),
                    help="noise-estimator family the checkpoint was trained with")
    ap.add_argument("--objective", choices=("x_T", "x_0", "v"), default="x_T",
                    help="parameterization the checkpoint was trained with")
    ap.add_argument("--family", choices=("diffusion", "flow"),
                    default="diffusion",
                    help="flow = rectified-flow checkpoint "
                         "(cli.train_diffusion --family flow); bulk-sampled "
                         "with the Heun probability-flow ODE")
    ap.add_argument("--flow-shift", type=float, default=1.0,
                    help="SD3 resolution shift of the flow grid "
                         "(arXiv:2403.03206 eq. 23; 1 = uniform)")
    ap.add_argument("--sampler", choices=["ddim", "dpmpp", "edm"], default="ddim",
                    help="dpmpp = DPM-Solver++(2M): comparable quality at 25-50 "
                         "steps; edm = Karras Heun (arXiv:2206.00364)")
    ap.add_argument("--edm-churn", type=float, default=0.0,
                    help="EDM S_churn (>0 adds stochastic churn)")
    ap.add_argument("--edm-rho", type=float, default=7.0,
                    help="EDM sigma-grid warp exponent (paper default 7)")
    ap.add_argument("--classifier-ckpt", default=None,
                    help="noisy-latent classifier run dir: classifier-guided "
                         "bulk generation (label doubles as guidance target)")
    ap.add_argument("--classifier-scale", type=float, default=1.0)
    ap.add_argument("--classifier-model-channels", type=int, default=64)
    ap.add_argument("--classifier-pool", default="adaptive",
                    choices=("adaptive", "attention", "spatial", "spatial_v2"))
    ap.add_argument("--zero-terminal-snr", action="store_true",
                    help="checkpoint was trained with --zero-terminal-snr")
    ap.add_argument("--timestep-spacing", choices=("linspace", "trailing"),
                    default=None,
                    help="'trailing' is the arXiv:2305.08891 recommendation "
                         "(default for --zero-terminal-snr)")
    ap.add_argument("--guidance-rescale", type=float, default=0.0,
                    help="CFG rescale phi (arXiv:2305.08891 §3.4; 0 = off)")
    ap.add_argument("--latent-scale", type=float, default=1.0,
                    help="must match the value used at training time")
    ap.add_argument("--latent-shift", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    add_kernel_args(ap)
    args = ap.parse_args(argv)
    resolve_kernel_flags(args, ap)
    if args.timestep_spacing is None:
        args.timestep_spacing = "trailing" if args.zero_terminal_snr else "linspace"
    if args.classifier_ckpt and args.encoder_key_every > 1:
        ap.error("--classifier-ckpt guidance is not wired into the "
                 "encoder-propagation fast sampler; drop --encoder-key-every")
    if args.classifier_ckpt and args.sampler == "edm":
        ap.error("--classifier-ckpt guidance is not wired into the EDM "
                 "sampler (fractional-t queries); use ddim/dpmpp")
    if args.family == "flow":
        if args.sampler != "ddim":
            ap.error("--family flow has its own ODE sampler; drop --sampler")
        if args.classifier_ckpt:
            ap.error("classifier guidance is not wired into the flow family")
        if args.encoder_key_every > 1:
            ap.error("--encoder-key-every is a diffusion-family fast path")
        if args.zero_terminal_snr or args.guidance_rescale > 0:
            ap.error("--zero-terminal-snr/--guidance-rescale are diffusion-"
                     "schedule options; the flow family has no schedule")

    p = PRESETS[args.preset]
    pipe, params = load_pipeline(args, p)
    mesh = make_mesh(n_model=1)
    n_data = mesh.shape["data"]

    classifier_apply = None
    if args.classifier_ckpt:
        from medfusion_tpu.cli.train_classifier import load_classifier

        clf, clf_params = load_classifier(p, args.classifier_ckpt,
                                          args.classifier_model_channels,
                                          args.classifier_pool)
        classifier_apply = lambda x, t: clf.apply({"params": clf_params}, x, t)

    labels = list(range(p.num_classes)) if p.num_classes else [None]
    for steps in args.steps_list:
        if args.family != "flow":  # ODE step count is schedule-free
            steps = min(steps, p.timesteps)
        sampler = make_sharded_sampler(pipe, mesh, p.latent_shape, steps=steps,
                                       use_ddim=True, guidance_scale=args.guidance,
                                       encoder_key_every=args.encoder_key_every,
                                       sampler=("flow" if args.family == "flow"
                                                else args.sampler),
                                       flow_shift=args.flow_shift,
                                       classifier_apply=classifier_apply,
                                       classifier_scale=args.classifier_scale,
                                       guidance_rescale=args.guidance_rescale,
                                       timestep_spacing=args.timestep_spacing,
                                       edm_churn=args.edm_churn,
                                       edm_rho=args.edm_rho)
        for label in labels:
            out_dir = Path(args.out) / f"steps_{steps}" / f"label_{label}"
            out_dir.mkdir(parents=True, exist_ok=True)
            written = 0
            chunk_idx = 0
            while written < args.n_samples:
                n = min(args.chunk, args.n_samples - written)
                n = max(n_data, (n // n_data) * n_data)  # divisible by mesh
                cond = un_cond = None
                if label is not None:
                    cond = jnp.full((n,), label, jnp.int32)
                    un_cond = jnp.full((n,), 1 - label, jnp.int32)  # reference :35
                # Chained fold_in per (steps, label, chunk); label=None gets its
                # own stream distinct from label=0 via the num_classes sentinel.
                label_id = label if label is not None else (p.num_classes or 0)
                rng = jax.random.PRNGKey(args.seed)
                for field in (steps, label_id, chunk_idx):
                    rng = jax.random.fold_in(rng, field)
                imgs = np.asarray(sampler(params, rng, n, cond, un_cond))
                imgs = ((imgs.clip(-1, 1) + 1) * 127.5).astype(np.uint8)
                for i in range(imgs.shape[0]):
                    arr = imgs[i, :, :, 0] if imgs.shape[-1] == 1 else imgs[i]
                    Image.fromarray(arr).save(out_dir / f"fake_{written + i}.png")
                written += imgs.shape[0]
                chunk_idx += 1
            print(f"steps={steps} label={label}: {written} samples -> {out_dir}")


if __name__ == "__main__":
    main()
