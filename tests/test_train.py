"""Train subsystem: EMA parity, diffusion/AE/GAN step mechanics, adaptive lambda."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.latent_embedders import VAE, Discriminator, NLayerDiscriminator
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import (
    AdversarialTrainer,
    AutoencoderTrainer,
    GANTrainState,
    TrainState,
    ema_decay,
    make_adversarial_train_step,
    make_autoencoder_train_step,
    make_diffusion_train_step,
)
from medfusion_tpu.train.adversarial import _conv_head, init_discriminators

KEY = jax.random.PRNGKey(0)


def test_ema_decay_matches_reference_formula():
    # reference EMAModel.get_decay (train_utils.py:47-57)
    def ref(step, update_after_step=0, inv_gamma=1.0, power=2 / 3, mn=0.0, mx=0.9999):
        s = max(0, step - update_after_step - 1)
        v = 1 - (1 + s / inv_gamma) ** -power
        return 0.0 if s <= 0 else max(mn, min(v, mx))

    for step in [0, 1, 2, 10, 1000, 31600, 10**6]:
        np.testing.assert_allclose(
            float(ema_decay(jnp.asarray(step))), ref(step), rtol=1e-5,
            err_msg=f"step={step}",
        )


def _tiny_unet():
    return UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="none")


def test_diffusion_train_step_reduces_loss_and_tracks_ema():
    unet = _tiny_unet()
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, latent_embedder=None,
                             do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32))
    params = unet.init(KEY, x, jnp.zeros((4,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adamw(1e-3), use_ema=True)
    step = make_diffusion_train_step(pipe, donate=False)
    batch = {"source": x}
    losses = []
    for i in range(5):
        state, metrics = step(state, None, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert losses[-1] < losses[0]
    # EMA tracks params: decay is 0 for the first updates and ~<=0.6 by step 5,
    # so the averaged weights lag by at most a few update magnitudes (lr=1e-3)
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                  state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) < 5e-3


def _tiny_vae():
    return VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8),
               strides=(1, 2), kernel_sizes=(3, 3), deep_supervision=1,
               norm_name=("GROUP", {"num_groups": 2, "affine": True}))


def test_autoencoder_train_step_runs():
    vae = _tiny_vae()
    trainer = AutoencoderTrainer(autoencoder=vae, flavor="vae", perceiver=None,
                                 embedding_loss_weight=1e-6)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    state = TrainState.create(params, optax.adam(1e-3))
    step = make_autoencoder_train_step(trainer, donate=False)
    batch = {"source": x}
    losses = []
    for i in range(4):
        state, metrics = step(state, None, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert {"L1", "L2", "ssim", "emb_loss"} <= set(metrics)


def test_adversarial_step_and_adaptive_lambda():
    vae = _tiny_vae()
    disc = Discriminator(spatial_dims=2, hid_chs=(4, 8), kernel_sizes=(3, 3),
                         strides=(1, 2), norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    ae_trainer = AutoencoderTrainer(autoencoder=vae, flavor="vae", perceiver=None)
    trainer = AdversarialTrainer(ae_trainer=ae_trainer, discriminator=disc,
                                 n_discriminators=2, start_gan_train_step=0)
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    ae_params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    disc_params = init_discriminators(disc, KEY, [(1, 16, 16, 1), (1, 8, 8, 1)])
    state = GANTrainState.create(ae_params, disc_params, optax.adam(1e-4), optax.adam(1e-4))
    # step starts at 0 -> not > start_gan_train_step=0 -> gan inactive at step 0
    step = make_adversarial_train_step(trainer, donate=False)
    state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(3))
    assert float(metrics["gan_loss_0"]) == 0.0
    assert int(state.step) == 2
    # second batch: step=2 > 0 -> gan active; lambda finite and >= 0
    state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss_0"]))
    assert float(metrics["lambda_0"]) >= 0.0
    assert np.isfinite(float(metrics["loss_1"]))


def test_adversarial_step_with_patchgan_batchnorm():
    """NLayerDiscriminator (BatchNorm PatchGAN, reference
    latent_embedders.py:134-186) trains in the two-player flow: running stats
    thread through the jitted step, stay frozen while the GAN is inactive
    (the reference never calls D before start_gan_train_step, :963-967), and
    move once it activates."""
    vae = _tiny_vae()
    disc = NLayerDiscriminator(spatial_dims=2, hid_chs=(4, 8),
                               kernel_sizes=(4, 4), strides=(2, 1))
    ae_trainer = AutoencoderTrainer(autoencoder=vae, flavor="vae", perceiver=None)
    trainer = AdversarialTrainer(ae_trainer=ae_trainer, discriminator=disc,
                                 n_discriminators=2, start_gan_train_step=2)
    x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    ae_params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    disc_vars = init_discriminators(disc, KEY, [(1, 16, 16, 1), (1, 8, 8, 1)])
    assert "batch_stats" in disc_vars["disc_0"], "PatchGAN must carry BatchNorm stats"
    state = GANTrainState.create(ae_params, disc_vars, optax.adam(1e-4), optax.adam(1e-4))
    stats0 = jax.tree_util.tree_map(np.asarray, state.disc_stats)

    step = make_adversarial_train_step(trainer, donate=False)
    # batch 1: gen step=0, disc step=1 -> both <= start(2): inactive, stats frozen
    state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(0))
    assert float(metrics["gan_loss_0"]) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(stats0),
                    jax.tree_util.tree_leaves(state.disc_stats)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # batch 2: disc step=3 > 2 -> active; stats move, losses/lambda finite
    state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_1"]))
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(stats0),
                        jax.tree_util.tree_leaves(state.disc_stats))
    )
    assert moved, "BatchNorm running stats must update once the GAN is active"
    # batch 3: gen step=4 > 2 -> generator GAN term + adaptive lambda active
    state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["lambda_0"])) and float(metrics["lambda_0"]) >= 0.0
    assert np.isfinite(float(metrics["gan_loss_0"]))


def test_adversarial_step_with_dropout_discriminator():
    """Discriminators configured with dropout need a 'dropout' RNG stream in
    train mode — the step must thread it (regression: train-mode apply without
    rngs raised 'could not find PRNG key dropout')."""
    vae = _tiny_vae()
    disc = Discriminator(spatial_dims=2, hid_chs=(4, 8), kernel_sizes=(3, 3),
                         strides=(1, 2), dropout=0.25,
                         norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    ae_trainer = AutoencoderTrainer(autoencoder=vae, flavor="vae", perceiver=None)
    trainer = AdversarialTrainer(ae_trainer=ae_trainer, discriminator=disc,
                                 n_discriminators=2, start_gan_train_step=0)
    x = jnp.asarray(np.random.default_rng(9).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    ae_params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    disc_vars = init_discriminators(disc, KEY, [(1, 16, 16, 1), (1, 8, 8, 1)])
    state = GANTrainState.create(ae_params, disc_vars, optax.adam(1e-4), optax.adam(1e-4))
    step = make_adversarial_train_step(trainer, donate=False)
    for i in range(2):
        state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_1"]))


def test_lambda_conv_head_matches_full_module_grad():
    """The 1x1-conv shortcut used for the adaptive-lambda vjp must reproduce
    gradients of the REAL module's out head w.r.t. its kernel."""
    vae = _tiny_vae()
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32))
    params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    # make the zero-init head non-trivial
    params["outc"]["conv"]["conv"]["kernel"] = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 1, 4, 1)).astype(np.float32) * 0.1
    )

    pred, _, _, h_top, _ = vae.apply(
        {"params": params}, x, method=vae.forward_with_hiddens,
        rngs={"sample": jax.random.PRNGKey(5)},
    )
    kernel = params["outc"]["conv"]["conv"]["kernel"]
    bias = params["outc"]["conv"]["conv"]["bias"]
    pred_head = _conv_head(h_top, kernel, bias)
    np.testing.assert_allclose(np.asarray(pred_head), np.asarray(pred), rtol=1e-5, atol=1e-6)

    # gradient through the shortcut == gradient through the real module
    def loss_via_module(k):
        p2 = jax.tree_util.tree_map(lambda v: v, params)
        p2["outc"]["conv"]["conv"]["kernel"] = k
        out, _, _ = vae.apply({"params": p2}, x, rngs={"sample": jax.random.PRNGKey(5)})
        return jnp.sum(out**2)

    def loss_via_head(k):
        return jnp.sum(_conv_head(jax.lax.stop_gradient(h_top), k, bias) ** 2)

    g_mod = jax.grad(loss_via_module)(kernel)
    g_head = jax.grad(loss_via_head)(kernel)
    np.testing.assert_allclose(np.asarray(g_head), np.asarray(g_mod), rtol=1e-4, atol=1e-5)


def test_diffusion_train_step_bf16_mixed_precision():
    """make_diffusion_train_step(compute_dtype=bf16): bf16 estimator
    forward/backward, f32 master weights — params stay f32, loss finite and
    close to the f32 step's, and training still reduces the loss."""
    import jax.numpy as jnp

    unet = _tiny_unet()
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet, latent_embedder=None,
                             do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(7).uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32))
    params = unet.init(KEY, x, jnp.zeros((4,), jnp.int32))["params"]
    batch = {"source": x}

    state32 = TrainState.create(params, optax.adamw(1e-3))
    step32 = make_diffusion_train_step(pipe, donate=False)
    _, m32 = step32(state32, None, batch, jax.random.PRNGKey(0))

    state16 = TrainState.create(params, optax.adamw(1e-3))
    step16 = make_diffusion_train_step(pipe, donate=False, compute_dtype=jnp.bfloat16)
    losses = []
    for i in range(5):
        state16, m16 = step16(state16, None, batch, jax.random.PRNGKey(i))
        losses.append(float(m16["loss"]))
    # master params stayed f32
    dtypes = {l.dtype for l in jax.tree_util.tree_leaves(state16.params)}
    assert dtypes == {jnp.float32.dtype}, dtypes
    # first-step loss agrees with the f32 step to bf16 accuracy
    np.testing.assert_allclose(losses[0], float(m32["loss"]), rtol=0.05)
    assert losses[-1] < losses[0]  # still learns


def test_use_ema_with_donation_no_double_donate():
    """Regression: TrainState.create aliased ema_params to the params
    buffers, so a donated train step (the CLI default) crashed on step 1
    with 'Attempt to donate the same buffer twice'. EMA must start as a
    deep copy and the donated step must run."""
    from medfusion_tpu.train import make_diffusion_train_step

    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, time_emb_dim=16)
    sched = GaussianDiffusionSchedule.create(timesteps=10)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False, clip_x0=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 1))
    params = unet.init(jax.random.PRNGKey(1), x,
                       jnp.zeros((2,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adamw(1e-3), use_ema=True)
    # distinct buffers from the start
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert p0 is not e0
    step = make_diffusion_train_step(pipe, donate=True)
    for i in range(2):
        state, metrics = step(state, None, {"source": x},
                              jax.random.fold_in(jax.random.PRNGKey(2), i))
    assert np.isfinite(float(metrics["loss"]))
    # (early-step EMA tracks params exactly — warmup decay ~0 — so no
    # value assertion here; the crash-free donated steps are the point)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(state.ema_params))
