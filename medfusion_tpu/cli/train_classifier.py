"""Train a noisy-latent classifier for classifier-guided sampling.

Beyond-reference subsystem (the reference vendors the EncoderUNetModel
classifier half, ``external/stable_diffusion/unet_openai.py:747-961``, but
never trains it): trains :class:`EncoderUNetOpenAI` on VAE-encoded latents
noised to random timesteps (arXiv:2105.05233 §4), producing a checkpoint
``cli/sample --classifier-ckpt`` consumes for guided sampling.

Usage:
  python -m medfusion_tpu.cli.train_classifier --preset chest --data-root ... \
      --vae-ckpt runs/ae/checkpoints [--max-steps N] [--out runs/classifier]
  python -m medfusion_tpu.cli.train_classifier --preset smoke --max-steps 4
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import jax
import numpy as np
import optax

from medfusion_tpu.cli.presets import PRESETS, build_dataset, build_scheduler, build_vae
from medfusion_tpu.cli.train_diffusion import load_vae_params
from medfusion_tpu.data import SimpleDataModule
from medfusion_tpu.models.unet_openai import EncoderUNetOpenAI
from medfusion_tpu.train import ClassifierTrainer, TrainState, make_classifier_train_step
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.logging import MetricsWriter


def build_classifier(p, model_channels: int = 64, pool: str = "adaptive",
                     num_head_channels: int = -1):
    h, w, c = p.latent_shape
    if pool == "attention" and num_head_channels == -1:
        # the attention pool requires an explicit head size
        # (unet_openai.py:889 asserts num_head_channels != -1)
        num_head_channels = min(32, model_channels)
    return EncoderUNetOpenAI(
        image_size=h, in_channels=c, model_channels=model_channels,
        out_channels=p.num_classes, num_res_blocks=2,
        attention_resolutions=(), channel_mult=(1, 2), pool=pool,
        num_head_channels=num_head_channels)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--out", default="runs/classifier")
    ap.add_argument("--max-steps", type=int, default=20000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--model-channels", type=int, default=64)
    ap.add_argument("--pool", default="adaptive",
                    choices=("adaptive", "attention", "spatial", "spatial_v2"))
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    p = PRESETS[args.preset]
    assert p.num_classes, "classifier training needs a labelled preset"
    batch_size = args.batch_size or p.diffusion_batch_size
    out = Path(args.out)
    writer = MetricsWriter(out / "logs")
    key = jax.random.PRNGKey(args.seed)

    vae = build_vae(p)
    vae_params = load_vae_params(vae, p, args.vae_ckpt, key)
    clf = build_classifier(p, args.model_channels, args.pool)
    trainer = ClassifierTrainer(classifier=clf, scheduler=build_scheduler(p),
                                latent_embedder=vae)

    h, w, c = p.latent_shape
    z0 = np.zeros((1, h, w, c), np.float32)
    clf_params = clf.init(key, z0, np.zeros((1,), np.int32))["params"]
    state = TrainState.create(clf_params, optax.adamw(args.lr))
    step_fn = make_classifier_train_step(trainer)

    ds = build_dataset(p, args.data_root, n_synthetic=max(batch_size * 4, 16),
                       seed=args.seed)
    dm = SimpleDataModule(ds, batch_size=batch_size, seed=args.seed,
                          weights=ds.get_weights())

    ckpt_dir = out / "checkpoints"
    step = 0
    if args.resume and C.latest_step(ckpt_dir) is not None:
        state = C.restore_checkpoint(ckpt_dir, state)
        step = int(C.latest_step(ckpt_dir))
        print(f"resumed from step {step}")

    t0, epoch = time.time(), 0
    while step < args.max_steps:
        for batch in dm.train_dataloader(epoch=epoch):
            dev = {"source": jax.device_put(batch["source"]),
                   "target": jax.device_put(batch["target"].astype(np.int32))}
            state, metrics = step_fn(state, vae_params, dev,
                                     jax.random.fold_in(key, step))
            step += 1
            if step % 50 == 0 or step == 1:
                writer.log_scalars(step, metrics)
                print(f"step {step} loss {float(metrics['loss']):.4f} "
                      f"acc {float(metrics['acc']):.3f} "
                      f"({(time.time() - t0):.1f}s)")
            if step % args.ckpt_every == 0 or step == args.max_steps:
                C.save_checkpoint(ckpt_dir, state, step,
                                  config=dataclasses.asdict(p), keep_top_k=2)
                C.save_best_checkpoint(ckpt_dir, step, float(metrics["loss"]),
                                       state=state)
            if step >= args.max_steps:
                break
        epoch += 1
    writer.close()
    print(f"done: {step} steps -> {ckpt_dir}")


def load_classifier(p, ckpt, model_channels: int = 64,
                    pool: str = "adaptive"):
    """Restore a trained classifier run dir -> ``(module, params)``."""
    clf = build_classifier(p, model_channels, pool)
    h, w, c = p.latent_shape
    init = clf.init(jax.random.PRNGKey(0),
                    np.zeros((1, h, w, c), np.float32),
                    np.zeros((1,), np.int32))["params"]
    template = TrainState.create(init, optax.adamw(1e-4))
    return clf, C.restore_checkpoint(ckpt, template).params


if __name__ == "__main__":
    main()
