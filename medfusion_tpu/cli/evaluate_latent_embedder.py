"""Autoencoder reconstruction quality: 1-LPIPS, MS-SSIM, MSE.

CLI parity with ``/root/reference/scripts/evaluate_latent_embedder.py``:
real images -> VAE encode/decode roundtrip -> per-image metrics, reported as
mean +/- std, LPIPS reported as 1-LPIPS (:85-98). Batch 100.

Usage:
  python -m medfusion_tpu.cli.evaluate_latent_embedder --preset chest \
      --data-root ... --vae-ckpt runs/ae/checkpoints [--vgg-weights w.npz]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.cli.presets import PRESETS, build_dataset, build_vae
from medfusion_tpu.cli.train_diffusion import load_vae_params
from medfusion_tpu.data import SimpleDataModule
from medfusion_tpu.losses import LPIPS, ms_ssim


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--max-batches", type=int, default=0, help="0 = all")
    ap.add_argument("--vgg-weights", default=None, help=".npz converted VGG16 weights")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    p = PRESETS[args.preset]
    key = jax.random.PRNGKey(args.seed)
    vae = build_vae(p)
    vae_params = load_vae_params(vae, p, args.vae_ckpt, key)

    lpips = LPIPS()
    x0 = jnp.zeros((1, p.image_size, p.image_size, p.in_channels))
    lpips_params = lpips.init(jax.random.PRNGKey(1), x0, x0)["params"]
    if args.vgg_weights:
        from medfusion_tpu.losses.lpips import load_vgg16_npz

        lpips_params = {**lpips_params, "vgg": load_vgg16_npz(args.vgg_weights)}
    else:
        from medfusion_tpu.utils import pretrained as PT

        ingested = PT.load_pretrained(PT.VGG16)
        if ingested is not None:
            lpips_params = {**lpips_params, "vgg": ingested}
            print(f"using ingested VGG16 weights from "
                  f"{PT.weights_dir() / PT.VGG16}")
        else:
            print("WARNING: no pretrained VGG16 — LPIPS uses a random "
                  "backbone (valid metric, NOT comparable to published "
                  "numbers; ingest via cli/ingest_weights vgg16)")

    @jax.jit
    def roundtrip(x, rng):
        z = vae.apply({"params": vae_params}, x, method=vae.encode, rngs={"sample": rng})
        pred = vae.apply({"params": vae_params}, z, method=vae.decode)
        lp = lpips.apply({"params": lpips_params}, pred, x).reshape(-1)
        ms = ms_ssim(jnp.clip((pred + 1) / 2, 0, 1), (x + 1) / 2, size_average=False)
        mse = jnp.mean((pred - x) ** 2, axis=tuple(range(1, x.ndim)))
        return lp, ms, mse

    ds = build_dataset(p, args.data_root, n_synthetic=max(args.batch_size, 16), seed=args.seed)
    dm = SimpleDataModule(ds, ds_test=ds, batch_size=args.batch_size, seed=args.seed)

    lps, mss, mses = [], [], []
    for i, batch in enumerate(dm.test_dataloader()):
        lp, ms, mse = roundtrip(jnp.asarray(batch["source"]), jax.random.fold_in(key, i))
        lps.append(np.asarray(lp)); mss.append(np.asarray(ms)); mses.append(np.asarray(mse))
        if args.max_batches and i + 1 >= args.max_batches:
            break
    lp = np.concatenate(lps); ms = np.concatenate(mss); mse = np.concatenate(mses)
    result = {
        "1-LPIPS_mean": float(1 - lp.mean()), "LPIPS_std": float(lp.std()),
        "MS-SSIM_mean": float(ms.mean()), "MS-SSIM_std": float(ms.std()),
        "MSE_mean": float(mse.mean()), "MSE_std": float(mse.std()),
        "n": int(lp.shape[0]),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
