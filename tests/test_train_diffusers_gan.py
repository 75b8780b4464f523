"""Adversarial training of the diffusers latent-embedder family.

Parity target: the vendored diffusers ``VQGAN`` wrapper
(external/diffusers/vae.py:648-782) — generator loss
``gan_w * lambda * gan + rec(MSE) + emb_w * vq`` with the adaptive lambda
anchored at ``decoder.conv_out.weight`` (``compute_lambda``, vae.py:698-706)
and the discriminator pre-training gate at ``start//2`` (:733-739).

The lambda/generator-loss parity test shares ONE tiny conv discriminator
between torch and flax so the comparison isolates the lambda machinery
itself (our gan term uses -sum(logits) vs the vendored -mean; the
lambda-weighted product is scale-invariant up to the shared eps=1e-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as F
from flax import linen as nn

from medfusion_tpu.models.latent_embedders import NLayerDiscriminator
from medfusion_tpu.models.latent_embedders_diffusers import (
    VQModelDiffusers,
    convert_diffusers_vae_state_dict,
)
from medfusion_tpu.models.unet_lucidrains import Conv
from medfusion_tpu.train.adversarial import (
    AdversarialTrainer,
    GANTrainState,
    init_discriminators,
    make_adversarial_train_step,
)
from medfusion_tpu.train.autoencoder import AutoencoderTrainer
from tests.test_latent_embedders_diffusers import _nchw, _nhwc, _np_sd, _ref_vae_module

_CFG = dict(down_block_types=("DownEncoderBlock2D",) * 2,
            up_block_types=("UpDecoderBlock2D",) * 2,
            block_out_channels=(8, 16, 16), layers_per_block=1,
            latent_channels=2, num_vq_embeddings=16, norm_num_groups=4)


class _TinyDisc(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(1, 1, 3, name="conv")(x)


def _build_pair(start_gan=10):
    ref = _ref_vae_module()
    torch.manual_seed(0)
    gan = ref.VQGAN(in_ch=1, out_ch=1, start_gan_train_step=start_gan,
                    **_CFG)
    gan.discriminator = torch.nn.Conv2d(1, 1, 3, padding=1)
    torch.nn.init.normal_(gan.discriminator.weight, std=0.3)
    torch.nn.init.normal_(gan.discriminator.bias, std=0.1)

    vq = VQModelDiffusers(in_channels=1, out_channels=1, emb_channels=2,
                          num_embeddings=16,
                          block_out_channels=_CFG["block_out_channels"],
                          layers_per_block=1, norm_num_groups=4)
    ae_params = convert_diffusers_vae_state_dict(_np_sd(gan.vqvae))
    w = gan.discriminator.weight.detach().numpy().transpose(2, 3, 1, 0)
    disc_params = {"disc_0": {"conv": {
        "kernel": jnp.asarray(w),
        "bias": jnp.asarray(gan.discriminator.bias.detach().numpy())}}}
    trainer = AdversarialTrainer(
        ae_trainer=AutoencoderTrainer(
            autoencoder=vq, flavor="vqvae", pixel_loss="l2", perceiver=None,
            embedding_loss_weight=1.0, use_ssim=False),
        discriminator=_TinyDisc(), n_discriminators=1,
        start_gan_train_step=start_gan, start_disc_train_step=start_gan // 2)
    return gan, vq, trainer, ae_params, disc_params


def _torch_generator_loss(gan, x, step):
    pred, vq_loss = gan.vqvae(torch.from_numpy(x))
    rec = F.mse_loss(pred, torch.from_numpy(x))
    if step > gan.start_gan_train_step:
        g = -torch.mean(gan.discriminator(pred))
        lam = gan.compute_lambda(rec, g)
        gan_term = g * lam
    else:
        lam = torch.zeros(())
        gan_term = torch.zeros(())
    total = gan.gan_loss_weight * gan_term + rec \
        + gan.embedding_loss_weight * vq_loss
    return (float(total), float(rec), float(gan_term), float(lam),
            pred.detach().numpy())


@pytest.mark.parametrize("step,active", [(11, True), (5, False)])
def test_generator_lambda_parity_vs_vendored_vqgan(step, active):
    gan, vq, trainer, ae_params, disc_params = _build_pair(start_gan=10)
    x = np.random.default_rng(1).uniform(-1, 1, (2, 1, 16, 16)).astype(np.float32)

    want_total, want_rec, want_gan, want_lam, want_pred = \
        _torch_generator_loss(gan, x, step)

    loss, (metrics, pred, _, _) = trainer.generator_loss(
        ae_params, disc_params, None, None, {"source": _nhwc(x)},
        jax.random.PRNGKey(0), jnp.asarray(step))
    np.testing.assert_allclose(_nchw(pred), want_pred, atol=2e-5)
    if active:
        # -sum vs -mean gan losses: the lambda-weighted term matches up to
        # the shared eps in the lambda denominator
        np.testing.assert_allclose(float(metrics["gan_loss_0"]), want_gan,
                                   rtol=2e-3)
        np.testing.assert_allclose(float(loss), want_total, rtol=2e-3)
        n_logits = 2 * 16 * 16  # ours normalizes by sum, vendored by mean
        np.testing.assert_allclose(float(metrics["lambda_0"]) * n_logits,
                                   want_lam, rtol=2e-3)
    else:
        assert float(metrics["gan_loss_0"]) == 0.0
        np.testing.assert_allclose(float(loss), want_total, rtol=1e-5)


def test_adversarial_training_diffusers_vq_with_patchgan():
    """Full two-player step on the diffusers family with the PatchGAN:
    runs, stays finite, updates the generator, and respects the vendored
    start//2 discriminator pre-training gate."""
    vq = VQModelDiffusers(in_channels=1, out_channels=1, emb_channels=2,
                          num_embeddings=16, block_out_channels=(8, 16, 16),
                          layers_per_block=1, norm_num_groups=4)
    disc = NLayerDiscriminator(spatial_dims=2, hid_chs=(8, 16),
                               kernel_sizes=(4, 4), strides=(2, 1))
    trainer = AdversarialTrainer(
        ae_trainer=AutoencoderTrainer(
            autoencoder=vq, flavor="vqvae", pixel_loss="l2", perceiver=None,
            embedding_loss_weight=1.0, use_ssim=False),
        discriminator=disc, n_discriminators=1,
        start_gan_train_step=2, start_disc_train_step=1)
    key = jax.random.PRNGKey(0)
    x = np.random.default_rng(2).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
    ae_params = vq.init(key, x)["params"]
    disc_params = init_discriminators(disc, key, [(1, 16, 16, 1)])
    state = GANTrainState.create(ae_params, disc_params,
                                 optax.adam(1e-4), optax.adam(1e-4))
    step_fn = make_adversarial_train_step(trainer, donate=False)
    batch = {"source": jnp.asarray(x)}
    p0 = jax.tree_util.tree_leaves(state.gen.params)[0]
    for i in range(4):
        state, metrics = step_fn(state, None, batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(metrics["loss"])), metrics
        assert np.isfinite(float(metrics["lambda_0"]))
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree_util.tree_leaves(state.gen.params)[0]))
