"""Pipeline extras: interpolate, cold diffusion, learned variance, 3D, bf16."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

KEY = jax.random.PRNGKey(0)


def _small_pipe(estimate_variance=False, T=10, compute_dtype=None):
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, estimate_variance=estimate_variance)
    sched = GaussianDiffusionSchedule.create(timesteps=T, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             estimate_variance=estimate_variance,
                             do_input_centering=False, compute_dtype=compute_dtype)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32))
    params = {"noise_estimator": unet.init(KEY, x, jnp.zeros((2,), jnp.int32))["params"]}
    return pipe, params, x


def test_interpolate_shapes_and_finite():
    pipe, params, x = _small_pipe()
    img2 = -x
    out = pipe.interpolate(params, jax.random.PRNGKey(1), x, img2, i=5,
                           lam=0.3, use_ddim=False, decode=False)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_cold_diffusion_denoise_runs():
    pipe, params, x = _small_pipe()
    out = pipe.denoise(params, x, jax.random.PRNGKey(2), steps=5, use_ddim=False,
                       decode=False, cold_diffusion=True)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))


def test_learned_variance_training_and_sampling():
    pipe, params, x = _small_pipe(estimate_variance=True)
    loss, metrics = pipe.train_loss(params, {"source": x}, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert "variance_loss" in metrics and "variance_scale" in metrics
    out = pipe.denoise(params, x, jax.random.PRNGKey(4), steps=4, use_ddim=True,
                       decode=False)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))


def test_bf16_compute_dtype_sampling():
    pipe, params, x = _small_pipe(compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
    out = pipe.denoise(params, x, jax.random.PRNGKey(5), steps=4, use_ddim=True,
                       decode=False)
    assert out.dtype == jnp.float32  # scheduler math stays f32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_3d_forward():
    m = UNet(in_ch=1, out_ch=1, spatial_dims=3, hid_chs=(8, 16), kernel_sizes=(3, 3),
             strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
             deep_supervision=0, use_attention="none")
    x = jnp.zeros((1, 8, 8, 8, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = m.init(KEY, x, t)
    y, _ = m.apply(variables, x, t)
    assert y.shape == x.shape


def test_3d_latent_diffusion_end_to_end():
    """Full 3D slice: VAE3D encode -> UNet3D train loss -> fused-scan sample
    -> VAE3D decode (capability the reference only partially ships)."""
    from medfusion_tpu.models.latent_embedders import VAE

    unet = UNet(in_ch=2, out_ch=2, spatial_dims=3, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="none")
    vae = VAE(in_channels=1, out_channels=1, spatial_dims=3, emb_channels=2,
              hid_chs=(4, 8), strides=(1, 2), kernel_sizes=(3, 3),
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    sched = GaussianDiffusionSchedule.create(timesteps=8, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, latent_embedder=vae,
                             do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(8).uniform(-1, 1, (1, 8, 8, 8, 1)).astype(np.float32))
    z = jnp.zeros((1, 4, 4, 4, 2))
    params = {
        "noise_estimator": unet.init(KEY, z, jnp.zeros((1,), jnp.int32))["params"],
        "latent_embedder": vae.init({"params": KEY, "sample": KEY}, x)["params"],
    }
    loss, _ = pipe.train_loss(params, {"source": x}, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    imgs = pipe.sample(params, jax.random.PRNGKey(10), 1, (4, 4, 4, 2), steps=4, use_ddim=True)
    assert imgs.shape == (1, 8, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(imgs)))


def test_lpips_and_ssim_3d_paths():
    from medfusion_tpu.losses import LPIPS, ssim

    x = jnp.asarray(np.random.default_rng(11).uniform(-1, 1, (2, 3, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(12).uniform(-1, 1, (2, 3, 16, 16, 1)).astype(np.float32))
    lpips = LPIPS()
    variables = lpips.init(jax.random.PRNGKey(0), x, y)
    val = lpips.apply(variables, x, y)
    assert val.shape == (2, 1, 1, 1, 1)  # per-image, depth-averaged
    s = ssim(x, y, size_average=False)  # 3D separable window
    assert s.shape == (2,) and np.all(np.isfinite(np.asarray(s)))


def test_self_conditioning_threads_through_scan():
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_self_conditioning=True)
    sched = GaussianDiffusionSchedule.create(timesteps=8, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             use_self_conditioning=True, do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(13).standard_normal((2, 8, 8, 1)).astype(np.float32))
    params = {"noise_estimator": unet.init(KEY, x, jnp.zeros((2,), jnp.int32))["params"]}
    loss, _ = pipe.train_loss(params, {"source": x}, jax.random.PRNGKey(14))
    assert np.isfinite(float(loss))
    out = pipe.denoise(params, x, jax.random.PRNGKey(15), steps=4, use_ddim=True, decode=False)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))


def test_fast_sampler_key_every_1_is_exact():
    """Encoder-propagation sampler (arXiv:2312.09608) with key_every=1 must
    bit-match the exact DDIM path; key_every=3 stays finite and close."""
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, cond_emb_num_classes=2, time_emb_dim=16)
    sched = GaussianDiffusionSchedule.create(timesteps=20, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 1)).astype(np.float32))
    cond = jnp.asarray([0, 1], jnp.int32)
    p0 = unet.init(KEY, x, jnp.zeros((2,), jnp.int32), cond)["params"]
    leaves, td = jax.tree_util.tree_flatten(p0)
    rng = np.random.default_rng(7)
    params = {"noise_estimator": jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1) for l in leaves])}
    exact = pipe.denoise(params, x, jax.random.PRNGKey(1), condition=cond, steps=10,
                         use_ddim=True, eta=0.0, guidance_scale=4.0, decode=False)
    fast1 = pipe.denoise_fast(params, x, jax.random.PRNGKey(2), condition=cond, steps=10,
                              guidance_scale=4.0, encoder_key_every=1, decode=False)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(fast1))
    fast3 = pipe.denoise_fast(params, x, jax.random.PRNGKey(2), condition=cond, steps=10,
                              guidance_scale=4.0, encoder_key_every=3, decode=False)
    drift = float(jnp.max(jnp.abs(exact - fast3)))
    assert np.isfinite(drift) and drift < 0.5


class _OracleX0(nn.Module):
    """Returns the TRUE x0 regardless of input: with an exact data
    prediction, any consistent probability-flow solver reproduces the closed
    trajectory x_t = alpha_t x0 + sigma_t eps exactly."""

    x0: tuple  # nested tuple of the target, baked as a constant

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        _ = self.param("dummy", lambda k: jnp.zeros(()))
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        return jnp.broadcast_to(x0, x_t.shape), []


def test_dpmpp_oracle_recovers_x0_exactly():
    """DPM-Solver++(2M) with an oracle x0-denoiser: the update
    x_next = (s_n/s_c) x - a_n expm1(-h) x0 collapses to
    a_n x0 + s_n eps, so the sampler must return x0 to float precision."""
    T = 100
    rng = np.random.default_rng(5)
    x0 = rng.uniform(-0.9, 0.9, (1, 4, 4, 1)).astype(np.float32)
    est = _OracleX0(x0=tuple(map(tuple, x0[0, :, :, 0].tolist())))
    sched = GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear", beta_start=0.002, beta_end=0.02
    )
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=est,
                             estimator_objective="x_0", clip_x0=False,
                             do_input_centering=False)
    params = {"noise_estimator": est.init(KEY, jnp.zeros((2, 4, 4, 1)))["params"]}
    x_T = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    for steps in (5, 25):
        out = pipe.denoise_dpmpp(params, x_T, steps=steps, decode=False)
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(x0[..., None].reshape(1, 4, 4, 1), (2, 4, 4, 1)),
            atol=1e-5, err_msg=f"steps={steps}",
        )


def test_dpmpp_second_order_beats_ddim_at_few_steps():
    """The selling point: against a fine-grid DDIM(eta=0) ground truth of the
    same probability-flow ODE, DPM++(2M) at 20 steps must land closer than
    first-order DDIM at 20 steps."""
    T = 1000
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0)
    sched = GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear", beta_start=0.002, beta_end=0.02
    )
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False, clip_x0=False)
    x = jnp.zeros((2, 8, 8, 1))
    raw = unet.init(KEY, x, jnp.zeros((2,), jnp.int32))["params"]
    rng = np.random.default_rng(6)
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    params = {"noise_estimator": jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1)
                  for l in leaves])}
    x_T = jnp.asarray(rng.standard_normal((2, 8, 8, 1)).astype(np.float32))

    truth = pipe.denoise(params, x_T, jax.random.PRNGKey(0), steps=400,
                         use_ddim=True, eta=0.0, decode=False)
    ddim20 = pipe.denoise(params, x_T, jax.random.PRNGKey(0), steps=20,
                          use_ddim=True, eta=0.0, decode=False)
    dpmpp20 = pipe.denoise_dpmpp(params, x_T, steps=20, decode=False)

    err_ddim = float(jnp.linalg.norm(ddim20 - truth))
    err_dpmpp = float(jnp.linalg.norm(dpmpp20 - truth))
    assert np.isfinite(err_dpmpp)
    assert err_dpmpp < err_ddim, (
        f"DPM++(2M) 20-step error {err_dpmpp:.4f} !< DDIM 20-step {err_ddim:.4f}"
    )


def test_dpmpp_cfg_and_decode_shapes():
    pipe, params, x = _small_pipe()
    out = pipe.denoise_dpmpp(params, x, condition=None, steps=6, decode=False)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))
