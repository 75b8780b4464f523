"""Train the latent diffusion model.

CLI parity with ``/root/reference/scripts/train_diffusion.py``: frozen VAE from
checkpoint (:113-114), UNet(hid 256/256/512/1024, no attention) (:83-98),
T=1000 scaled_linear 0.002->0.02 (:102-108), eps-objective, CFG dropout 0.5,
AdamW 1e-4, L1, batch 32 (:117-132), ckpt every N steps monitoring train/loss
(:148-155).

Usage:
  python -m medfusion_tpu.cli.train_diffusion --preset chest --data-root ... \
      --vae-ckpt runs/ae/checkpoints [--out runs/diffusion]
  python -m medfusion_tpu.cli.train_diffusion --preset smoke --max-steps 4
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medfusion_tpu.cli.kernels import add_kernel_args, resolve_kernel_flags
from medfusion_tpu.cli.presets import (
    PRESETS,
    build_dataset,
    build_scheduler,
    build_unet,
    build_vae,
)
from medfusion_tpu.data import SimpleDataModule
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState, make_diffusion_train_step
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.logging import MetricsWriter, save_image_grid


def load_vae_params(vae, preset, ckpt_path, key):
    """Random init, or restore from an AE run dir / torch .ckpt file."""
    x0 = np.zeros((1, preset.image_size, preset.image_size, preset.in_channels), np.float32)
    params = vae.init({"params": key, "sample": key}, x0)["params"]
    if ckpt_path is None:
        return params
    ckpt_path = Path(ckpt_path)
    if ckpt_path.suffix == ".ckpt":  # reference Lightning checkpoint
        from medfusion_tpu.utils.torch_compat import convert_state_dict, load_torch_checkpoint

        return convert_state_dict(load_torch_checkpoint(str(ckpt_path)))
    # layout-aware (plain TrainState or GAN run) and LOUD on mismatch — a
    # silent fallback here would train diffusion on a random VAE's latents
    return C.restore_ae_params(ckpt_path, params)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--out", default="runs/diffusion")
    ap.add_argument("--max-steps", type=int, default=200000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--sample-every", type=int, default=0, help="0 = off")
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--family", choices=("diffusion", "flow"),
                    default="diffusion",
                    help="flow = rectified-flow / flow-matching training "
                         "(beyond-reference, arXiv:2210.02747/2403.03206): "
                         "same estimator/VAE/CLI surface, scheduler-free "
                         "continuous-time objective, sampled with the Heun "
                         "probability-flow ODE (cli.sample --family flow)")
    ap.add_argument("--flow-shift", type=float, default=1.0,
                    help="SD3 timestep shift (arXiv:2403.03206 eq. 23), "
                         "applied to the training time draw and the "
                         "default sampling grid (flow family only)")
    ap.add_argument("--time-sampling", choices=("uniform", "logit_normal"),
                    default="logit_normal",
                    help="flow-family training time distribution (SD3 "
                         "default logit_normal m=0 s=1)")
    ap.add_argument("--objective", choices=("x_T", "x_0", "v"),
                    default="x_T",
                    help="estimator parameterization: eps (reference "
                         "default, train_diffusion.py:119), x_0, or "
                         "v-prediction (arXiv:2202.00512)")
    ap.add_argument("--zero-terminal-snr", action="store_true",
                    help="rescale the beta schedule so abar_T = 0 exactly "
                         "(arXiv:2305.08891); requires --objective v or x_0 "
                         "-- the model then truly learns to start from pure "
                         "noise. Sample with --timestep-spacing trailing")
    ap.add_argument("--latent-scale", type=float, default=1.0,
                    help="standardize latents: diffusion runs on "
                         "(z - shift) * scale (SD scale_factor pattern; get "
                         "stats from `helpers latent-stats`: scale = 1/std)")
    ap.add_argument("--latent-shift", type=float, default=0.0)
    ap.add_argument("--min-snr-gamma", type=float, default=None,
                    help="Min-SNR-gamma loss weighting (arXiv:2303.09556; "
                         "paper default 5.0; off when unset)")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 estimator fwd/bwd "
                         "(MXU-native), f32 master weights/optimizer/loss")
    ap.add_argument("--remat", action="store_true",
                    help="gradient checkpointing on the UNet stages")
    ap.add_argument("--estimator", default="unet",
                    choices=("unet", "unet_legacy", "openai", "lucidrains", "dit"),
                    help="noise-estimator family (openai = SD/ADM UNet; "
                         "lucidrains = compact DDPM UNet, unconditional)")
    add_kernel_args(ap)
    ap.add_argument("--grain", action="store_true",
                    help="use the grain production loader instead of SimpleDataModule")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable donate_argnums on the train state (debug aid)")
    ap.add_argument("--lr-schedule", choices=("const", "cosine", "lambda_linear"),
                    default="const",
                    help="per-step LR schedule (reference configure_optimizers "
                         "supports lr_scheduler, diffusion_pipeline.py:338-348; "
                         "lambda_linear = the vendored SD LambdaLinearScheduler)")
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="linear warmup length (lambda_linear default 10000)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--auto-restart", type=int, default=0, metavar="N",
                    help="supervise training: on a crash, restart up to N "
                         "times, restoring from the latest checkpoint")
    args = ap.parse_args(argv)
    # global switches, read at trace time — set once before any jit
    resolve_kernel_flags(args, ap)

    if args.auto_restart:
        from medfusion_tpu.utils.resilience import run_with_auto_restore

        return run_with_auto_restore(
            lambda resume: _train(args, resume=args.resume or resume),
            max_restarts=args.auto_restart)
    return _train(args, resume=args.resume)


def _train(args, resume: bool):
    p = PRESETS[args.preset]
    batch_size = args.batch_size or p.diffusion_batch_size
    out = Path(args.out)
    writer = MetricsWriter(out / "logs")
    key = jax.random.PRNGKey(args.seed)

    vae = build_vae(p)
    unet = build_unet(p, args.estimator, attention=args.attention,
                      attn_heads=getattr(args, "attention_heads", 8))
    if args.remat and hasattr(unet, "remat"):
        unet = unet.replace(remat=True)
    if args.family == "flow":
        if args.zero_terminal_snr or args.min_snr_gamma is not None:
            raise SystemExit("--zero-terminal-snr/--min-snr-gamma are "
                             "diffusion-schedule options; the flow family "
                             "has no schedule")
        if args.objective != "x_T":
            raise SystemExit("--objective selects a diffusion "
                             "parameterization; the flow family always "
                             "trains the velocity objective")
        from medfusion_tpu.pipelines.flow import FlowMatchingPipeline

        pipe = FlowMatchingPipeline(
            noise_estimator=unet, latent_embedder=vae,
            classifier_free_guidance_dropout=p.cfg_dropout,
            do_input_centering=False,
            timestep_sampling=args.time_sampling, shift=args.flow_shift,
            latent_scale=args.latent_scale, latent_shift=args.latent_shift,
        )
    else:
        sched = build_scheduler(p, zero_terminal_snr=args.zero_terminal_snr)
        pipe = DiffusionPipeline(
            scheduler=sched, noise_estimator=unet, latent_embedder=vae,
            estimator_objective=args.objective, estimate_variance=False,
            use_self_conditioning=False,
            classifier_free_guidance_dropout=p.cfg_dropout,
            do_input_centering=False, clip_x0=False, loss="l1",
            min_snr_gamma=args.min_snr_gamma,
            latent_scale=args.latent_scale, latent_shift=args.latent_shift,
        )

    vae_params = load_vae_params(vae, p, args.vae_ckpt, key)
    h, w, c = p.latent_shape
    z0 = np.zeros((batch_size, h, w, c), np.float32)
    t0_arr = np.zeros((batch_size,), np.int32)
    unet_params = unet.init(key, z0, t0_arr, t0_arr if p.num_classes else None)["params"]

    from medfusion_tpu.train.lr_schedules import make_lr_schedule

    lr = make_lr_schedule(args.lr_schedule, p.diffusion_lr,
                          warmup_steps=args.warmup_steps,
                          total_steps=args.max_steps)
    # weight_decay=0.01 matches torch.optim.AdamW's default (the reference's
    # configure_optimizers, diffusion_pipeline.py:37-38); optax's default is
    # 1e-4 — 100x weaker, a silent parity divergence
    state = TrainState.create(unet_params, optax.adamw(lr, weight_decay=1e-2),
                              use_ema=args.use_ema)
    # donate=True buys memory headroom (in-place state update); re-validated
    # working on the axon tunnel in round 2 (was InvalidArgument in round 1).
    step_fn = make_diffusion_train_step(
        pipe, donate=not args.no_donate,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)

    ds = build_dataset(p, args.data_root, n_synthetic=max(batch_size * 4, 16), seed=args.seed)
    if args.grain:
        from medfusion_tpu.data.grain_loader import make_grain_loader

        class _GrainDM:
            def train_dataloader(self, epoch=0):
                return make_grain_loader(ds, batch_size, seed=args.seed + epoch,
                                         num_epochs=1)

        dm = _GrainDM()
    else:
        dm = SimpleDataModule(ds, batch_size=batch_size, seed=args.seed,
                              weights=ds.get_weights())

    ckpt_dir = out / "checkpoints"
    if resume and C.latest_step(ckpt_dir) is not None:
        cfg_file = ckpt_dir / C.CONFIG_FILE
        if cfg_file.exists():
            import json as _json

            saved = _json.loads(cfg_file.read_text())
            for k, now in (("use_ema", args.use_ema),
                           ("family", args.family),
                           ("objective", args.objective),
                           ("estimator", args.estimator),
                           ("attention", args.attention),
                           ("attention_heads", getattr(args, "attention_heads", 8))):
                if k in saved and saved[k] != now:
                    # a silent mismatch either DROPS the trained EMA or
                    # seeds it with this process's random init
                    raise SystemExit(
                        f"--resume config mismatch: the run was trained "
                        f"with {k}={saved[k]!r}, this invocation has "
                        f"{now!r}")
        state = C.restore_checkpoint(ckpt_dir, state)
        print(f"resumed from step {C.latest_step(ckpt_dir)}")

    # continue the epoch stream where the run left off (epoch seeds the
    # shuffle; restarting at 0 would replay the early-epoch batch order on
    # every --auto-restart recovery)
    step, t_start = int(state.step), time.time()
    epoch = (step * batch_size) // max(1, len(ds))
    while step < args.max_steps:
        for batch in dm.train_dataloader(epoch=epoch):
            dev_batch = {"source": jax.device_put(batch["source"])}
            if "target" in batch and p.num_classes:
                dev_batch["target"] = jax.device_put(batch["target"].astype(np.int32))
            state, metrics = step_fn(state, vae_params, dev_batch,
                                     jax.random.fold_in(key, step))
            step += 1
            if step % 50 == 0 or step == 1:
                writer.log_scalars(step, metrics)
                print(f"step {step} loss {float(metrics['loss']):.4f} "
                      f"({(time.time() - t_start):.1f}s)")
            if step % args.ckpt_every == 0 or step == args.max_steps:
                C.save_checkpoint(ckpt_dir, state, step,
                                  config={**dataclasses.asdict(p),
                                          "use_ema": args.use_ema,
                                          "family": args.family,
                                          "objective": args.objective,
                                          "estimator": args.estimator,
                                          "attention": args.attention,
                                          "attention_heads": getattr(args, "attention_heads", 8)},
                                  keep_top_k=2)
                C.save_best_checkpoint(ckpt_dir, step, float(metrics["loss"]),
                                       state=state)
            if args.sample_every and step % args.sample_every == 0:
                params = {"noise_estimator": state.inference_params,
                          "latent_embedder": vae_params}
                cond = (jax.numpy.arange(4, dtype=jax.numpy.int32) % p.num_classes
                        if p.num_classes else None)
                sample_kw = (dict(steps=25) if args.family == "flow"
                             else dict(steps=min(50, p.timesteps), use_ddim=True))
                imgs = pipe.sample(params, jax.random.fold_in(jax.random.fold_in(key, 1_000_003), step), 4,
                                   p.latent_shape, condition=cond, **sample_kw)
                save_image_grid(np.asarray(imgs), out / "images" / f"sample_{step}.png")
            if step >= args.max_steps:
                break
        epoch += 1
    writer.close()
    print(f"done: {step} steps -> {ckpt_dir}")


if __name__ == "__main__":
    main()
