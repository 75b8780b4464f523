"""Zero-terminal-SNR modernization (arXiv:2305.08891) — beta rescaling,
trailing timestep spacing, CFG rescale, and the terminal-safe eps inversions
through the full sampling loop.

The reference's scaled_linear schedule leaves abar_T ~ 4e-5 > 0 (the model
never trains on pure noise yet sampling starts from pure noise); these
features close that train/test gap. Beyond-reference capability.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import (
    GaussianDiffusionSchedule,
    rescale_zero_terminal_snr,
)
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline


def _zsnr_sched(T=100):
    return GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02, zero_terminal_snr=True)


def test_rescale_pins_terminal_alphabar_to_exact_zero():
    betas = np.linspace(0.002**0.5, 0.02**0.5, 1000) ** 2  # reference schedule
    abar_before = np.cumprod(1 - betas)
    assert abar_before[-1] > 0  # the flaw: nonzero terminal SNR
    b2 = rescale_zero_terminal_snr(betas)
    abar_after = np.cumprod(1 - b2)
    assert abar_after[-1] == 0.0  # EXACTLY zero (2305.08891 Alg. 1)
    # first-step SNR preserved
    np.testing.assert_allclose(abar_after[0], abar_before[0], rtol=1e-12)
    # schedule remains monotone decreasing and valid
    assert np.all(np.diff(abar_after) < 0)
    assert np.all(b2 > 0) and np.all(b2 <= 1.0)


def test_schedule_create_zero_terminal_snr_buffers():
    sched = _zsnr_sched()
    assert sched.zero_terminal_snr
    assert float(sched.alphas_cumprod[-1]) == 0.0
    assert float(sched.sqrt_alphas_cumprod[-1]) == 0.0
    assert float(sched.sqrt_one_minus_alphas_cumprod[-1]) == 1.0
    # the reciprocal tables are legitimately inf at the terminal index only
    assert np.isinf(np.asarray(sched.sqrt_recip_alphas_cumprod)[-1])
    assert np.all(np.isfinite(np.asarray(sched.sqrt_recip_alphas_cumprod)[:-1]))
    # posterior coefficients stay finite everywhere
    for buf in (sched.posterior_mean_coef1, sched.posterior_mean_coef2,
                sched.posterior_variance):
        assert np.all(np.isfinite(np.asarray(buf)))


def test_trailing_spacing_matches_paper_formula():
    sched = GaussianDiffusionSchedule.create(timesteps=1000, schedule_strategy="linear")
    ts = np.asarray(sched.ddim_timesteps(25, spacing="trailing"))
    expect = np.round(np.arange(1000, 0, -40)).astype(int) - 1  # 2305.08891 Tab. 2
    np.testing.assert_array_equal(ts, expect[::-1])
    assert ts[-1] == 999  # always includes the terminal step
    # linspace default unchanged
    ts_lin = np.asarray(sched.ddim_timesteps(25))
    assert ts_lin[0] == 0 and ts_lin[-1] == 999


def test_estimate_x_T_safe_matches_reference_form_and_stays_finite():
    sched = _zsnr_sched()
    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.standard_normal((4, 8, 8, 2)).astype(np.float32))
    x_0 = jnp.asarray(rng.standard_normal((4, 8, 8, 2)).astype(np.float32) * 0.5)
    t_mid = jnp.asarray([10, 30, 50, 80], jnp.int32)
    a = S.estimate_x_T(sched, x_t, x_0, t_mid, clip=False)
    b = S.estimate_x_T_safe(sched, x_t, x_0, t_mid, clip=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # terminal step: reference form is inf/inf = NaN; safe form = x_t exactly
    t_term = jnp.full((4,), sched.T - 1, jnp.int32)
    assert not np.all(np.isfinite(np.asarray(S.estimate_x_T(sched, x_t, x_0, t_term, clip=False))))
    safe = S.estimate_x_T_safe(sched, x_t, x_0, t_term, clip=False)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(x_t), rtol=1e-6)


def test_estimate_x_T_from_v_finite_and_consistent_at_terminal():
    sched = _zsnr_sched()
    rng = np.random.default_rng(1)
    x_t = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    t = jnp.full((2,), sched.T - 1, jnp.int32)
    eps = S.estimate_x_T_from_v(sched, x_t, v, t)
    assert np.all(np.isfinite(np.asarray(eps)))
    # at abar=0: x_t IS eps
    np.testing.assert_allclose(np.asarray(eps), np.asarray(x_t), rtol=1e-6)


class _OracleV:
    """Oracle v-predictor: returns the exact v implied by (x_t, true x_0) —
    v = (sqrt(abar)*x_t - x_0)/sqrt(1-abar), finite at abar=0. A perfect
    model; DDIM eta=0 must reconstruct x_0."""

    def __init__(self, sched, x_0):
        self.sched = sched
        self.x_0 = x_0

    def apply(self, variables, x_t, t, condition=None, self_cond=None, cond_mask=None):
        nd = x_t.ndim
        num = S.extract(self.sched.sqrt_alphas_cumprod, t, nd) * x_t - self.x_0
        den = S.extract(self.sched.sqrt_one_minus_alphas_cumprod, t, nd)
        return num / den, []


def test_v_objective_full_loop_reconstructs_x0_on_zero_snr_schedule():
    """End-to-end: q-sample to the TERMINAL step (pure noise), run the full
    DDIM loop with trailing spacing on the zero-SNR schedule with an oracle
    v-predictor — must reconstruct x_0 with no NaN/inf anywhere."""
    sched = _zsnr_sched(T=100)
    rng = np.random.default_rng(2)
    x_0 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 1)).astype(np.float32))
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_OracleV(sched, x_0),
                             latent_embedder=None, estimator_objective="v",
                             do_input_centering=False, clip_x0=False)
    assert pipe._terminal_safe  # implied by the schedule flag
    key = jax.random.PRNGKey(0)
    # start from PURE noise == q_sample at t = T-1 (abar = 0)
    x_T = jax.random.normal(key, x_0.shape)
    out = pipe.denoise({"noise_estimator": {}}, x_T, jax.random.PRNGKey(1), steps=25, use_ddim=True,
                       eta=0.0, timestep_spacing="trailing")
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_0), rtol=1e-3, atol=1e-3)


def test_v_objective_zero_snr_with_clipping_stays_finite():
    sched = _zsnr_sched(T=50)
    rng = np.random.default_rng(3)
    x_0 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 1)).astype(np.float32))
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_OracleV(sched, x_0),
                             latent_embedder=None, estimator_objective="v",
                             do_input_centering=False, clip_x0=True)
    x_T = jax.random.normal(jax.random.PRNGKey(4), x_0.shape)
    out = pipe.denoise({"noise_estimator": {}}, x_T, jax.random.PRNGKey(5), steps=10, use_ddim=True,
                       eta=0.0, timestep_spacing="trailing")
    assert np.all(np.isfinite(np.asarray(out)))


def test_dpmpp_on_zero_snr_schedule_finite_and_accurate():
    sched = _zsnr_sched(T=100)
    rng = np.random.default_rng(6)
    x_0 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 1)).astype(np.float32))
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_OracleV(sched, x_0),
                             latent_embedder=None, estimator_objective="v",
                             do_input_centering=False, clip_x0=False)
    x_T = jax.random.normal(jax.random.PRNGKey(7), x_0.shape)
    out = pipe.denoise_dpmpp({"noise_estimator": {}}, x_T, steps=20, timestep_spacing="trailing")
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_0), rtol=2e-3, atol=2e-3)


def test_eps_objective_rejected_on_zero_snr_schedule():
    sched = _zsnr_sched()
    with pytest.raises(ValueError, match="zero-terminal-SNR"):
        DiffusionPipeline(scheduler=sched, noise_estimator=None,
                          estimator_objective="x_T")


def test_cfg_rescale_restores_conditional_std():
    """guidance_rescale=1 pins the guided prediction's per-sample std to the
    conditional prediction's std; 0 is plain CFG (2305.08891 §3.4)."""

    class _CondModel:
        def apply(self, variables, x_t, t, condition=None, self_cond=None,
                  cond_mask=None):
            # cond branch (mask=1): amplified output; uncond: small
            scale = 1.0 + 4.0 * cond_mask.reshape(-1, *([1] * (x_t.ndim - 1)))
            return x_t * scale, []

    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_CondModel(),
                             latent_embedder=None, do_input_centering=False)
    rng = np.random.default_rng(8)
    x_t = jnp.asarray(rng.standard_normal((3, 8, 8, 1)).astype(np.float32))
    t = jnp.full((3,), 5, jnp.int32)
    cond = jnp.ones((3,), jnp.int32)
    plain = pipe._guided_pred({"noise_estimator": {}}, x_t, t, cond, guidance_scale=8.0)
    rescaled = pipe._guided_pred({"noise_estimator": {}}, x_t, t, cond, guidance_scale=8.0,
                                 guidance_rescale=1.0)
    axes = (1, 2, 3)
    std_cond = np.std(np.asarray(x_t) * 5.0, axis=axes)  # conditional pred
    np.testing.assert_allclose(np.std(np.asarray(rescaled), axis=axes), std_cond,
                               rtol=1e-4)
    assert not np.allclose(np.std(np.asarray(plain), axis=axes), std_cond, rtol=1e-2)
    # phi=0 == plain CFG
    off = pipe._guided_pred({"noise_estimator": {}}, x_t, t, cond, guidance_scale=8.0, guidance_rescale=0.0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(plain), rtol=1e-6)


def test_self_conditioning_train_loss_finite_on_zero_snr_x0_objective():
    """Review regression: the self-cond pre-pass used the non-terminal-safe
    eps inversion, NaN-poisoning x_0-objective training whenever the sampled
    t hit T-1 on a zero-SNR schedule."""

    class _Zero:
        def apply(self, variables, x_t, t, condition=None, self_cond=None,
                  cond_mask=None):
            base = jnp.zeros_like(x_t)
            if self_cond is not None:
                base = base + 0.1 * self_cond  # self_cond reaches the loss
            return base, []

    sched = _zsnr_sched(T=4)  # tiny T: the uniform t draw hits T-1 quickly
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_Zero(),
                             latent_embedder=None, estimator_objective="x_0",
                             use_self_conditioning=True,
                             do_input_centering=False, clip_x0=False)
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (8, 4, 4, 1)).astype(np.float32))
    for seed in range(6):
        loss, _ = pipe.train_loss({"noise_estimator": {}}, {"source": x},
                                  jax.random.PRNGKey(seed))
        assert bool(jnp.isfinite(loss)), f"NaN loss at seed {seed}"


def test_cold_diffusion_finite_on_zero_snr_schedule():
    """Review regression: cold_diffusion_step used the non-terminal-safe eps
    inversion (NaN at t = T-1 on zero-SNR schedules)."""
    sched = _zsnr_sched(T=20)
    rng = np.random.default_rng(5)
    x_t = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    x_0 = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 4, 4, 1)).astype(np.float32))
    t = jnp.full((2,), sched.T - 1, jnp.int32)
    prior, _ = S.cold_diffusion_step(sched, x_t, t, x_0, clip=False)
    assert np.all(np.isfinite(np.asarray(prior)))


def test_dpmpp_guidance_rescale_changes_output():
    """Review regression: denoise_dpmpp accepted guidance_rescale but never
    forwarded it to _guided_pred (silent no-op)."""

    class _CondModel:
        def apply(self, variables, x_t, t, condition=None, self_cond=None,
                  cond_mask=None):
            scale = 1.0 + 4.0 * cond_mask.reshape(-1, *([1] * (x_t.ndim - 1)))
            return x_t * 0.1 * scale, []

    sched = GaussianDiffusionSchedule.create(timesteps=20, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_CondModel(),
                             latent_embedder=None, do_input_centering=False,
                             estimator_objective="x_0", clip_x0=False)
    x_T = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 1))
    cond = jnp.ones((2,), jnp.int32)
    base = pipe.denoise_dpmpp({"noise_estimator": {}}, x_T, condition=cond,
                              steps=5, guidance_scale=8.0)
    resc = pipe.denoise_dpmpp({"noise_estimator": {}}, x_T, condition=cond,
                              steps=5, guidance_scale=8.0, guidance_rescale=1.0)
    assert not np.allclose(np.asarray(base), np.asarray(resc))


def test_cfg_rescale_leaves_variance_channels_untouched():
    """Review regression: with estimate_variance=True the rescale must apply
    to the eps half only — the var channels keep the plain CFG lerp."""

    class _VarModel:
        def apply(self, variables, x_t, t, condition=None, self_cond=None,
                  cond_mask=None):
            scale = 1.0 + 4.0 * cond_mask.reshape(-1, *([1] * (x_t.ndim - 1)))
            eps = x_t * scale
            var = jnp.full_like(x_t, 0.25) * scale
            return jnp.concatenate([eps, var], axis=-1), []

    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_VarModel(),
                             latent_embedder=None, do_input_centering=False,
                             estimate_variance=True)
    x_t = jnp.asarray(np.random.default_rng(9).standard_normal((2, 4, 4, 1)).astype(np.float32))
    t = jnp.full((2,), 5, jnp.int32)
    cond = jnp.ones((2,), jnp.int32)
    plain = pipe._guided_pred({"noise_estimator": {}}, x_t, t, cond, guidance_scale=8.0)
    resc = pipe._guided_pred({"noise_estimator": {}}, x_t, t, cond,
                             guidance_scale=8.0, guidance_rescale=1.0)
    _, var_plain = np.split(np.asarray(plain), 2, axis=-1)
    eps_plain, _ = np.split(np.asarray(plain), 2, axis=-1)
    eps_resc, var_resc = np.split(np.asarray(resc), 2, axis=-1)
    np.testing.assert_allclose(var_resc, var_plain, rtol=1e-6)  # var untouched
    assert not np.allclose(eps_resc, eps_plain)  # eps rescaled


def test_stochastic_ddim_trailing_finite_on_zero_snr():
    """Regression (bisected in the quality-loop run): with trailing spacing
    AND eta=1.0, the first transition has sigma^2 == 1 - abar_next exactly;
    one ulp of f32 rounding made ddim_step's sqrt(1 - abar_next - sigma^2)
    NaN, poisoning the entire scan."""
    sched = _zsnr_sched(T=100)
    rng = np.random.default_rng(11)
    x_0 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 1)).astype(np.float32))
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_OracleV(sched, x_0),
                             latent_embedder=None, estimator_objective="v",
                             do_input_centering=False, clip_x0=False)
    x_T = jax.random.normal(jax.random.PRNGKey(12), x_0.shape)
    out = pipe.denoise({"noise_estimator": {}}, x_T, jax.random.PRNGKey(13),
                       steps=25, use_ddim=True, eta=1.0,
                       timestep_spacing="trailing")
    assert np.all(np.isfinite(np.asarray(out)))
    # direct unit check of the rounding edge
    t = jnp.asarray(sched.T - 1)
    t_next = jnp.asarray(90)
    noise = jnp.zeros_like(x_0)
    step = S.ddim_step(sched, x_0, x_T, t, t_next, noise, eta=1.0)
    assert np.all(np.isfinite(np.asarray(step)))


def test_q_sample_at_terminal_step_is_pure_noise():
    sched = _zsnr_sched()
    rng = np.random.default_rng(9)
    x_0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    t = jnp.full((2,), sched.T - 1, jnp.int32)
    x_t = S.q_sample(sched, x_0, t, eps)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(eps), rtol=1e-6)
