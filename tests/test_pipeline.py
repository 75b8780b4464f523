"""DiffusionPipeline: fused-scan sampler parity vs the reference loop math,
training loss sanity, end-to-end latent sampling shapes."""

import numpy as np
import pytest
import torch

import flax.linen as nn
import jax
import jax.numpy as jnp

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.latent_embedders import VAE
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from tests.reference_oracle import reference_schedulers

KEY = jax.random.PRNGKey(0)


class ScaleEstimator(nn.Module):
    """Deterministic analytic 'UNet': pred = s * x_t. Makes the whole reverse
    trajectory a closed-form function of the schedule — bit-checkable against
    the reference loop without any network weights."""

    scale: float = 0.1

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None, cond_mask=None, train=False):
        s = self.param("s", lambda k: jnp.asarray(self.scale))
        return x_t * s, []


def _torch_reference_ddim_loop(x_t0, T, steps, scale, clip_x0=True, eta=0.0):
    """Reference denoise loop (diffusion_pipeline.py:278-304) with the real
    reference GaussianNoiseScheduler and pred = scale * x_t, objective x_T."""
    sched = reference_schedulers().GaussianNoiseScheduler(
        timesteps=T, schedule_strategy="scaled_linear", beta_start=0.002, beta_end=0.02
    )
    x_t = torch.from_numpy(np.asarray(x_t0)).clone()
    ts = torch.linspace(0, T - 1, steps, dtype=torch.long)
    for i, t in enumerate(reversed(ts)):
        tb = t.expand(x_t.shape[0])
        pred = scale * x_t
        x_prior, x_0 = sched.estimate_x_t_prior_from_x_T(x_t, tb, pred, clip_x0=clip_x0, var_scale=0)
        # std at t==0 is zeroed inside the scheduler; remaining ancestral noise
        # term is irrelevant because DDIM overwrites all but the final step and
        # at the final step t==0 in this configuration.
        x_T = pred
        if steps - i - 1 > 0:
            t_next = ts[steps - i - 2]
            alpha = sched.alphas_cumprod[t]
            alpha_next = sched.alphas_cumprod[t_next]
            sigma = eta * ((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)).sqrt()
            c = (1 - alpha_next - sigma**2).sqrt()
            x_t = x_0 * alpha_next.sqrt() + c * x_T  # eta=0 -> no noise
        else:
            x_t = x_prior
    return x_t.numpy()


@pytest.mark.parametrize("clip", [True, False])
def test_ddim_full_loop_parity_vs_reference(clip):
    T, steps, scale = 100, 10, 0.1
    sched = GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear", beta_start=0.002, beta_end=0.02
    )
    est = ScaleEstimator(scale)
    pipe = DiffusionPipeline(
        scheduler=sched, noise_estimator=est, clip_x0=clip, estimator_objective="x_T"
    )
    x_init = np.random.default_rng(0).standard_normal((2, 4, 4, 3)).astype(np.float32)
    params = {"noise_estimator": est.init(KEY, jnp.asarray(x_init))["params"]}
    out = pipe.denoise(
        params, jnp.asarray(x_init), jax.random.PRNGKey(1),
        steps=steps, use_ddim=True, eta=0.0, decode=False,
    )
    ref = _torch_reference_ddim_loop(x_init, T, steps, scale, clip_x0=clip)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_ddpm_scan_matches_python_loop_of_estimate():
    """The lax.scan sampler must equal a host-python loop over pipeline.estimate
    with the identical per-step keys (validates the scan mechanics + RNG plan)."""
    T, steps = 50, 50
    sched = GaussianDiffusionSchedule.create(timesteps=T, schedule_strategy="linear",
                                             beta_start=1e-4, beta_end=0.02)
    est = ScaleEstimator(0.2)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=est, estimator_objective="x_T")
    x_init = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 1)).astype(np.float32))
    params = {"noise_estimator": est.init(KEY, x_init)["params"]}
    rng = jax.random.PRNGKey(7)
    out = pipe.denoise(params, x_init, rng, steps=steps, use_ddim=False, decode=False)

    ts = np.asarray(sched.timesteps_array())[:steps][::-1]
    keys = jax.random.split(rng, steps)
    x = x_init
    for t_scalar, key in zip(ts, keys):
        k_anc, _ = jax.random.split(key)
        tb = jnp.full((2,), int(t_scalar), jnp.int32)
        noise = jax.random.normal(k_anc, x.shape, x.dtype)
        x, _, _, _ = pipe.estimate(params, x, tb, noise=noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-6)


def _tiny_models():
    unet = UNet(
        in_ch=2, out_ch=2, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
        norm_name=("GROUP", {"num_groups": 4, "affine": True}),
        cond_emb_num_classes=2, deep_supervision=0, use_attention="none",
    )
    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8),
              strides=(1, 2), kernel_sizes=(3, 3),
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    return unet, vae


def test_train_loss_end_to_end_latent():
    unet, vae = _tiny_models()
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, latent_embedder=vae)
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    z = jnp.zeros((2, 8, 8, 2))
    unet_params = unet.init(KEY, z, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))["params"]
    vae_params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    params = {"noise_estimator": unet_params, "latent_embedder": vae_params}
    batch = {"source": x, "target": jnp.asarray([0, 1], jnp.int32)}
    loss, metrics = pipe.train_loss(params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert set(metrics) >= {"loss", "L1", "L2"}
    # gradient exists for the estimator and flows nowhere into the embedder
    grads = jax.grad(lambda p: pipe.train_loss(p, batch, jax.random.PRNGKey(3))[0])(params)
    g_est = jax.tree_util.tree_reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["noise_estimator"], 0.0)
    g_vae = jax.tree_util.tree_reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["latent_embedder"], 0.0)
    assert g_est > 0 and g_vae == 0


def test_sample_decodes_to_image_space_with_cfg():
    unet, vae = _tiny_models()
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, latent_embedder=vae)
    z = jnp.zeros((2, 8, 8, 2))
    x = jnp.zeros((2, 16, 16, 1))
    params = {
        "noise_estimator": unet.init(KEY, z, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))["params"],
        "latent_embedder": vae.init({"params": KEY, "sample": KEY}, x)["params"],
    }
    cond = jnp.asarray([0, 1], jnp.int32)
    imgs = pipe.sample(params, jax.random.PRNGKey(5), 2, (8, 8, 2),
                       condition=cond, steps=4, use_ddim=True, guidance_scale=8.0)
    assert imgs.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(imgs)))
