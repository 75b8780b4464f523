"""Train the latent embedder (VAE), optionally adversarially (VAEGAN).

CLI parity with ``/root/reference/scripts/train_latent_embedder_2d.py``:
same model/loss/optimizer literals via presets, ckpt every N steps with
best-pointer on train L1 (:145-152), image dumps every sample_every_n_steps.

Usage:
  python -m medfusion_tpu.cli.train_autoencoder --preset chest --data-root ... \
      [--gan] [--max-steps N] [--out runs/ae]
  python -m medfusion_tpu.cli.train_autoencoder --preset smoke --max-steps 4
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import jax
import numpy as np
import optax

from medfusion_tpu.cli.presets import PRESETS, build_dataset, build_vae
from medfusion_tpu.data import SimpleDataModule
from medfusion_tpu.models.latent_embedders import Discriminator
from medfusion_tpu.train import (
    AdversarialTrainer,
    AutoencoderTrainer,
    GANTrainState,
    TrainState,
    make_adversarial_train_step,
    make_autoencoder_train_step,
)
from medfusion_tpu.train.adversarial import init_discriminators
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.logging import MetricsWriter, save_image_grid


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out", default="runs/ae")
    ap.add_argument("--gan", action="store_true", help="adversarial (VAEGAN/VQGAN) training")
    ap.add_argument("--model",
                    choices=["vae", "vqvae", "diffusers_kl", "diffusers_vq"],
                    default="vae",
                    help="latent-embedder family (diffusers_* = the "
                         "AutoencoderKL/VQModel architecture)")
    ap.add_argument("--max-steps", type=int, default=100000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--sample-every", type=int, default=1000)
    ap.add_argument("--start-gan-step", type=int, default=50000)
    ap.add_argument("--disc", choices=["conv", "patch"], default="conv",
                    help="discriminator flavor: conv-stack (reference Discriminator) "
                         "or PatchGAN (reference NLayerDiscriminator, BatchNorm)")
    ap.add_argument("--lr-schedule", choices=("const", "cosine", "lambda_linear"),
                    default="const",
                    help="per-step LR schedule (applies to the AE optimizer; "
                         "with --gan, to both players' optimizers; "
                         "lambda_linear = the vendored SD LambdaLinearScheduler)")
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--lpips", action="store_true",
                    help="add the LPIPS perceptual term to the rec loss "
                         "(reference latent_embedders.py:211 trains with the "
                         "lpips perceiver by default); REQUIRES ingested "
                         "VGG16 weights (cli/ingest_weights vgg16) — a "
                         "random backbone would silently train against a "
                         "random projection")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable donate_argnums on the train state")
    ap.add_argument("--auto-restart", type=int, default=0, metavar="N",
                    help="supervise training: on a crash, restart up to N "
                         "times, restoring from the latest checkpoint")
    args = ap.parse_args(argv)

    if args.auto_restart:
        from medfusion_tpu.utils.resilience import run_with_auto_restore

        return run_with_auto_restore(
            lambda resume: _train(args, resume=args.resume or resume),
            max_restarts=args.auto_restart)
    return _train(args, resume=args.resume)


def _train(args, resume: bool):
    p = PRESETS[args.preset]
    batch_size = args.batch_size or p.ae_batch_size
    out = Path(args.out)
    writer = MetricsWriter(out / "logs")

    vae = build_vae(p, kind=args.model)
    ds = build_dataset(p, args.data_root, n_synthetic=max(batch_size * 4, 16), seed=args.seed)
    dm = SimpleDataModule(ds, batch_size=batch_size, seed=args.seed,
                          weights=ds.get_weights())

    key = jax.random.PRNGKey(args.seed)
    x0 = np.zeros((batch_size, p.image_size, p.image_size, p.in_channels), np.float32)
    vae_params = vae.init({"params": key, "sample": key}, x0)["params"]

    # VQ flavors: commitment loss weight 1.0, pyramid-mean rec reduction
    # (latent_embedders.py:210-211 vs :637-638). The diffusers families train
    # with their vendored wrappers' losses: plain MSE (no SSIM), emb weight 1
    # (vae.py:608-610 mean MSE + vq_loss; :833-834 sum(sq)/B + kl).
    quantized = args.model in ("vqvae", "diffusers_vq")
    diffusers_family = args.model.startswith("diffusers")
    perceiver, perceiver_params = None, None
    if args.lpips:
        from medfusion_tpu.losses import LPIPS
        from medfusion_tpu.utils import pretrained as PT

        vgg = PT.load_pretrained(PT.VGG16)
        if vgg is None:
            raise SystemExit(
                "--lpips needs ingested VGG16 weights (none under "
                f"{PT.weights_dir()}); run cli/ingest_weights vgg16 --src "
                "vgg16-397923af.pth first — training against a random "
                "backbone is refused, not warned")
        perceiver = LPIPS()
        x_p = np.zeros((1, p.image_size, p.image_size, p.in_channels), np.float32)
        perceiver_params = {**perceiver.init(jax.random.PRNGKey(1), x_p,
                                             x_p)["params"], "vgg": vgg}
        print(f"LPIPS perceptual loss ON (ingested weights, "
              f"{PT.weights_dir() / PT.VGG16})")
    ae_trainer = AutoencoderTrainer(
        autoencoder=vae, flavor="vqvae" if quantized else "vae",
        pixel_loss="l2" if diffusers_family else p.ae_loss, perceiver=perceiver,
        embedding_loss_weight=(1.0 if (quantized or diffusers_family)
                               else p.ae_embedding_loss_weight),
        use_ssim=not diffusers_family,
    )
    if args.gan:
        if args.disc == "patch" or diffusers_family:
            # the vendored diffusers VQGAN/VAEWrapper always pair with the
            # taming PatchGAN (vae.py:678, 867)
            from medfusion_tpu.models.latent_embedders import NLayerDiscriminator

            disc = NLayerDiscriminator(spatial_dims=2)
        else:
            disc = Discriminator(spatial_dims=2)
        # diffusers family: single out head, no pyramid; D pre-trains from
        # start//2 (vendored VQGAN gating, vae.py:733-739)
        n_disc = 1 if diffusers_family else p.ae_deep_supervision + 1
        trainer = AdversarialTrainer(
            ae_trainer=ae_trainer, discriminator=disc,
            n_discriminators=n_disc,
            start_gan_train_step=args.start_gan_step,
            start_disc_train_step=(args.start_gan_step // 2
                                   if diffusers_family else None),
        )
        shapes = [(1, p.image_size // (2**i), p.image_size // (2**i), p.in_channels)
                  for i in range(n_disc)]
        disc_params = init_discriminators(disc, key, shapes)
        # reference VAEGAN lr 1e-6 for both players (latent_embedders.py:888-889);
        # --lr-schedule scales that base for BOTH players
        from medfusion_tpu.train.lr_schedules import make_lr_schedule

        gan_lr = make_lr_schedule(args.lr_schedule, 1e-6,
                                  warmup_steps=args.warmup_steps,
                                  total_steps=args.max_steps)
        state = GANTrainState.create(vae_params, disc_params,
                                     optax.adam(gan_lr), optax.adam(gan_lr))
        step_fn = make_adversarial_train_step(trainer,
                                              donate=not args.no_donate)
    else:
        from medfusion_tpu.train.lr_schedules import make_lr_schedule

        lr = make_lr_schedule(args.lr_schedule, p.ae_lr,
                              warmup_steps=args.warmup_steps,
                              total_steps=args.max_steps)
        state = TrainState.create(vae_params, optax.adam(lr))
        step_fn = make_autoencoder_train_step(ae_trainer,
                                              donate=not args.no_donate)

    ckpt_dir = out / "checkpoints"
    step = 0
    if resume and C.latest_step(ckpt_dir) is not None:
        state = C.restore_checkpoint(ckpt_dir, state)
        step = int(C.latest_step(ckpt_dir))
        print(f"resumed from step {step}")

    t0 = time.time()
    # continue the epoch stream where the run left off (epoch seeds the
    # shuffle; restarting at 0 replays early-epoch batch order on recovery)
    epoch = (step * batch_size) // max(1, len(ds))
    while step < args.max_steps:
        for batch in dm.train_dataloader(epoch=epoch):
            batch = {"source": jax.device_put(batch["source"])}
            state, metrics = step_fn(state, perceiver_params, batch,
                                     jax.random.fold_in(key, step))
            step += 1
            if step % 50 == 0 or step == 1:
                writer.log_scalars(step, metrics)
                print(f"step {step} loss {float(metrics['loss']):.4f} "
                      f"({(time.time() - t0):.1f}s)")
            if step % args.ckpt_every == 0 or step == args.max_steps:
                C.save_checkpoint(ckpt_dir, state, step,
                                  config=dataclasses.asdict(p), keep_top_k=5)
                C.save_best_checkpoint(ckpt_dir, step, float(metrics["L1"]),
                                       state=state)
            if args.sample_every and step % args.sample_every == 0:
                params = state.gen.params if args.gan else state.params
                pred, _, _ = vae.apply({"params": params}, batch["source"],
                                       rngs={"sample": jax.random.fold_in(jax.random.fold_in(key, 1_000_003), step)})
                grid = np.concatenate([np.asarray(batch["source"][:8]), np.asarray(pred[:8])])
                save_image_grid(grid, out / "images" / f"sample_{step}.png", nrow=8)
            if step >= args.max_steps:
                break
        epoch += 1
    writer.close()
    print(f"done: {step} steps -> {ckpt_dir}")


if __name__ == "__main__":
    main()
