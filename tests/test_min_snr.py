"""Min-SNR-gamma loss weighting (arXiv:2303.09556) — beyond-reference
training efficiency feature composing with all three objectives and with
zero-terminal-SNR schedules."""

import numpy as np

import jax
import jax.numpy as jnp

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

SCHED = GaussianDiffusionSchedule.create(
    timesteps=100, schedule_strategy="scaled_linear",
    beta_start=0.002, beta_end=0.02)


def test_snr_and_weight_formulas():
    t = jnp.asarray([0, 10, 50, 99], jnp.int32)
    ab = np.asarray(SCHED.alphas_cumprod)[np.asarray(t)]
    want_snr = ab / (1 - ab)
    np.testing.assert_allclose(np.asarray(S.snr(SCHED, t)), want_snr, rtol=1e-5)
    g = 5.0
    clamped = np.minimum(want_snr, g)
    np.testing.assert_allclose(
        np.asarray(S.min_snr_weight(SCHED, t, g, "x_T")), clamped / want_snr, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(S.min_snr_weight(SCHED, t, g, "x_0")), clamped, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(S.min_snr_weight(SCHED, t, g, "v")), clamped / (want_snr + 1), rtol=1e-5)


def test_weight_finite_on_zero_snr_schedule_for_v():
    """At SNR == 0 exactly (zero-SNR terminal) the paper formula degenerates
    to 0, which would silently never train the t = T-1 prediction that
    trailing sampling consumes FIRST — the weight falls back to the
    uniform-training value 1.0 there instead."""
    zs = GaussianDiffusionSchedule.create(
        timesteps=100, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02, zero_terminal_snr=True)
    t = jnp.asarray([0, 50, 99], jnp.int32)
    for obj in ("v", "x_0"):
        w = np.asarray(S.min_snr_weight(zs, t, 5.0, obj))
        assert np.all(np.isfinite(w))
        assert w[-1] == 1.0, (obj, w)  # terminal step stays trained
        assert w[-2] > 0.0


class _ZeroEstimator:
    def apply(self, variables, x_t, t, condition=None, self_cond=None,
              cond_mask=None):
        return jnp.zeros_like(x_t), []


def test_train_loss_weighting_reduces_to_uniform_at_large_gamma():
    """With gamma -> inf the eps-objective weight is 1 everywhere, so the
    weighted loss equals the unweighted one; with gamma small they differ."""
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32))
    batch = {"source": x}
    rng = jax.random.PRNGKey(3)
    base = DiffusionPipeline(scheduler=SCHED, noise_estimator=_ZeroEstimator(),
                             latent_embedder=None, do_input_centering=False)
    big = DiffusionPipeline(scheduler=SCHED, noise_estimator=_ZeroEstimator(),
                            latent_embedder=None, do_input_centering=False,
                            min_snr_gamma=1e12)
    small = DiffusionPipeline(scheduler=SCHED, noise_estimator=_ZeroEstimator(),
                              latent_embedder=None, do_input_centering=False,
                              min_snr_gamma=0.5)
    l0, _ = base.train_loss({"noise_estimator": {}}, batch, rng)
    l1, _ = big.train_loss({"noise_estimator": {}}, batch, rng)
    l2, _ = small.train_loss({"noise_estimator": {}}, batch, rng)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    assert float(l2) < float(l0)  # low-noise steps down-weighted


def test_train_step_with_min_snr_runs():
    import optax

    from medfusion_tpu.models.unet import UNet
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="none")
    pipe = DiffusionPipeline(scheduler=SCHED, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False,
                             estimator_objective="v", min_snr_gamma=5.0)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((4,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adamw(1e-3))
    step = make_diffusion_train_step(pipe, donate=False)
    state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(metrics["loss"]))
