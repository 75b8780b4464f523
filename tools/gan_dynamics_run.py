"""Recorded GAN training-dynamics run (VERDICT r1 item 9).

Trains the adversarial autoencoder (VAEGAN flow,
``/root/reference/medical_diffusion/models/embedders/latent_embedders.py:860-1065``)
for a few hundred steps on synthetic data with a small
``start_gan_train_step``, and reports generator/discriminator losses and the
adaptive lambda across the GAN activation boundary. The resulting numbers are
recorded in PARITY.md ("GAN training dynamics").

Run (CPU, hermetic):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gan_dynamics_run.py
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from medfusion_tpu.data.synthetic import SyntheticDataset2D  # noqa: E402
from medfusion_tpu.models.latent_embedders import VAE, Discriminator  # noqa: E402
from medfusion_tpu.train import (  # noqa: E402
    AdversarialTrainer,
    AutoencoderTrainer,
    GANTrainState,
    make_adversarial_train_step,
)
from medfusion_tpu.train.adversarial import init_discriminators  # noqa: E402

STEPS = 300          # batches (GANTrainState.step advances by 2 per batch)
START_GAN = 100      # optimizer steps -> activates at batch 50
BATCH = 8
SIZE = 32


def main():
    key = jax.random.PRNGKey(0)
    vae = VAE(in_channels=1, out_channels=1, emb_channels=4, hid_chs=(16, 32, 64),
              strides=(1, 2, 2), kernel_sizes=(3, 3, 3), deep_supervision=1,
              norm_name=("GROUP", {"num_groups": 8, "affine": True}))
    disc = Discriminator(spatial_dims=2, hid_chs=(16, 32, 64), kernel_sizes=(3, 3, 3),
                         strides=(1, 2, 2),
                         norm_name=("GROUP", {"num_groups": 8, "affine": True}))
    ae_trainer = AutoencoderTrainer(autoencoder=vae, flavor="vae", perceiver=None,
                                    embedding_loss_weight=1e-6)
    trainer = AdversarialTrainer(ae_trainer=ae_trainer, discriminator=disc,
                                 n_discriminators=2, start_gan_train_step=START_GAN)

    x0 = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    ae_params = vae.init({"params": key, "sample": key}, x0)["params"]
    disc_vars = init_discriminators(
        disc, key, [(1, SIZE, SIZE, 1), (1, SIZE // 2, SIZE // 2, 1)]
    )
    # reference VAEGAN: Adam lr 1e-6 both players (latent_embedders.py:888-889);
    # nudged to 1e-4 here so 300 synthetic steps show visible dynamics.
    state = GANTrainState.create(ae_params, disc_vars, optax.adam(1e-4), optax.adam(1e-4))
    step_fn = make_adversarial_train_step(trainer, donate=False)

    ds = SyntheticDataset2D(n=64, image_size=SIZE, num_classes=0, seed=0,
                            channels=1)
    data = np.stack([ds[i]["source"] for i in range(len(ds))])

    rows = []
    for i in range(STEPS):
        idx = np.random.default_rng(i).integers(0, len(data), BATCH)
        batch = {"source": jnp.asarray(data[idx])}
        state, m = step_fn(state, None, batch, jax.random.fold_in(key, i))
        rows.append({k: float(v) for k, v in m.items()})
        if not np.isfinite(rows[-1]["loss"]):
            raise SystemExit(f"non-finite generator loss at batch {i}")
        if not np.isfinite(rows[-1]["loss_1"]):
            raise SystemExit(f"non-finite discriminator loss at batch {i}")

    def window(lo, hi, key_):
        vals = [r[key_] for r in rows[lo:hi] if key_ in r]
        return float(np.mean(vals)) if vals else float("nan")

    act = START_GAN // 2  # activation batch
    print(f"batches={STEPS} start_gan_train_step={START_GAN} (activates at batch {act})")
    for name, lo, hi in [("pre-GAN   [20,{})".format(act), 20, act),
                         ("post-GAN  [{},{})".format(act, act + 50), act, act + 50),
                         ("late      [{},{})".format(STEPS - 50, STEPS), STEPS - 50, STEPS)]:
        print(f"{name:22s} gen_loss={window(lo, hi, 'loss'):10.4f} "
              f"rec_L1={window(lo, hi, 'L1'):7.4f} "
              f"disc_loss={window(lo, hi, 'loss_1'):8.4f} "
              f"gan_term={window(lo, hi, 'gan_loss_0'):10.4f} "
              f"lambda={window(lo, hi, 'lambda_0'):9.4f}")
    lam = [r["lambda_0"] for r in rows[act:] if "lambda_0" in r]
    print(f"lambda_0 over active phase: min={min(lam):.4f} max={max(lam):.4f}")
    assert all(np.isfinite(lam)), "lambda must stay finite across activation"
    d_losses = [r["loss_1"] for r in rows[act:]]
    assert all(np.isfinite(d_losses))
    print("OK: all losses and lambda finite across the GAN activation boundary")


if __name__ == "__main__":
    main()
