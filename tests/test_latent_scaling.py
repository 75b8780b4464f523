"""Latent standardization (SD scale_factor pattern, generalized with a
shift): diffusion runs on (z - shift) * scale; decode inverts. The reference
trains on raw VAE latents — whatever scale the KL weight left them at — which
makes the N(0,1) prior, x0-clipping and schedule SNRs scale-dependent (the
quality-loop debugging measured std 4.8 latents at toy scale)."""

import numpy as np

import jax
import jax.numpy as jnp

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.latent_embedders import VAE
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

KEY = jax.random.PRNGKey(0)


def _vae_and_params():
    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8),
              strides=(1, 2), kernel_sizes=(3, 3), deep_supervision=0,
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x0 = jnp.zeros((1, 8, 8, 1))
    return vae, vae.init({"params": KEY, "sample": KEY}, x0)["params"]


def test_encode_decode_roundtrip_inverts_scaling():
    vae, vp = _vae_and_params()
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    base = DiffusionPipeline(scheduler=sched, noise_estimator=None,
                             latent_embedder=vae, do_input_centering=False)
    scaled = DiffusionPipeline(scheduler=sched, noise_estimator=None,
                               latent_embedder=vae, do_input_centering=False,
                               latent_scale=0.25, latent_shift=1.5)
    params = {"latent_embedder": vp}
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32))
    z_base = base.encode_latent(params, x, jax.random.PRNGKey(2))
    z_scaled = scaled.encode_latent(params, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(z_scaled),
                               (np.asarray(z_base) - 1.5) * 0.25, rtol=1e-6)
    # decode inverts: the same image comes back either way
    np.testing.assert_allclose(np.asarray(scaled.decode_latent(params, z_scaled)),
                               np.asarray(base.decode_latent(params, z_base)),
                               rtol=1e-5, atol=1e-6)


def test_scaled_training_targets_standardized_latents():
    """train_loss computes targets in the SCALED latent space: with a
    recording estimator, the x_t the model sees has the standardized scale."""

    class _Recorder:
        def __init__(self):
            self.seen = []

        def apply(self, variables, x_t, t, condition=None, self_cond=None,
                  cond_mask=None):
            self.seen.append(x_t)
            return jnp.zeros_like(x_t), []

    vae, vp = _vae_and_params()
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    rec_a, rec_b = _Recorder(), _Recorder()
    base = DiffusionPipeline(scheduler=sched, noise_estimator=rec_a,
                             latent_embedder=vae, do_input_centering=False)
    scaled = DiffusionPipeline(scheduler=sched, noise_estimator=rec_b,
                               latent_embedder=vae, do_input_centering=False,
                               latent_scale=0.1)
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32))
    batch = {"source": x}
    base.train_loss({"noise_estimator": {}, "latent_embedder": vp}, batch,
                    jax.random.PRNGKey(4))
    scaled.train_loss({"noise_estimator": {}, "latent_embedder": vp}, batch,
                      jax.random.PRNGKey(4))
    # same rng: identical t and noise; the scaled x_t differs only through
    # the standardized x_0 term
    assert not np.allclose(np.asarray(rec_a.seen[0]), np.asarray(rec_b.seen[0]))


def test_cli_accepts_latent_scale_flags():
    from medfusion_tpu.cli import sample, sample_dataset, train_diffusion

    for mod in (train_diffusion, sample, sample_dataset):
        try:
            mod.main(["--latent-scale", "not_a_float"])
            raise AssertionError("expected SystemExit")
        except SystemExit as e:
            assert e.code == 2  # argparse rejected the value => flag exists
