"""Golden parity tests: medfusion_tpu.core.schedules vs reference
GaussianNoiseScheduler (torch, fp32) — buffers and all closed-form transforms."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from medfusion_tpu.core import schedules as S
from tests.reference_oracle import reference_schedulers

STRATEGIES = [
    ("linear", dict(beta_start=1e-4, beta_end=0.02)),
    ("scaled_linear", dict(beta_start=0.002, beta_end=0.02)),
    ("cosine", dict()),
]


def make_pair(strategy="scaled_linear", timesteps=1000, **kw):
    ref = reference_schedulers().GaussianNoiseScheduler(
        timesteps=timesteps, schedule_strategy=strategy, **kw
    )
    ours = S.GaussianDiffusionSchedule.create(
        timesteps=timesteps, schedule_strategy=strategy, **kw
    )
    return ref, ours


@pytest.mark.parametrize("strategy,kw", STRATEGIES)
def test_schedule_buffers_bitwise(strategy, kw):
    ref, ours = make_pair(strategy, **kw)
    for name in [
        "betas", "alphas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
        "posterior_mean_coef1", "posterior_mean_coef2", "posterior_variance",
    ]:
        r = getattr(ref, name).numpy()
        o = np.asarray(getattr(ours, name))
        np.testing.assert_allclose(o, r, rtol=0, atol=1e-7, err_msg=name)


def test_timesteps_arrays():
    ref, ours = make_pair()
    np.testing.assert_array_equal(
        np.asarray(ours.timesteps_array()), ref.timesteps_array.numpy()
    )
    for steps in (50, 150, 250, 1000):
        t_torch = torch.linspace(0, ref.T - 1, steps, dtype=torch.long).numpy()
        np.testing.assert_array_equal(np.asarray(ours.ddim_timesteps(steps)), t_torch)


def test_q_sample_matches_reference_including_clamping():
    ref, ours = make_pair()
    g = np.random.default_rng(0)
    x0 = g.standard_normal((6, 4, 8, 8)).astype(np.float32)
    xT = g.standard_normal((6, 4, 8, 8)).astype(np.float32)
    t = np.array([-1, 0, 1, 500, 999, 1200], dtype=np.int64)  # incl. out-of-range
    r = ref.estimate_x_t(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(xT)).numpy()
    o = np.asarray(S.q_sample(ours, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(xT)))
    np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-6)


def test_x0_xT_inversions():
    ref, ours = make_pair()
    g = np.random.default_rng(1)
    xt = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    xT = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    t = np.array([0, 10, 500, 999], dtype=np.int64)
    for clip in (True, False):
        r = ref.estimate_x_0(torch.from_numpy(xt), torch.from_numpy(xT), torch.from_numpy(t), clip_x0=clip).numpy()
        o = np.asarray(S.estimate_x_0(ours, jnp.asarray(xt), jnp.asarray(xT), jnp.asarray(t), clip=clip))
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)
    x0 = np.tanh(xt)  # in [-1,1] so clipping is a no-op distinction
    r = ref.estimate_x_T(torch.from_numpy(xt), torch.from_numpy(x0), torch.from_numpy(t)).numpy()
    o = np.asarray(S.estimate_x_T(ours, jnp.asarray(xt), jnp.asarray(x0), jnp.asarray(t)))
    np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5)


def test_posterior_mean_and_variance():
    ref, ours = make_pair()
    g = np.random.default_rng(2)
    xt = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    x0 = np.tanh(g.standard_normal((4, 4, 8, 8)).astype(np.float32))
    t = np.array([0, 1, 500, 999], dtype=np.int64)
    r = ref.estimate_mean_t(torch.from_numpy(xt), torch.from_numpy(x0), torch.from_numpy(t)).numpy()
    o = np.asarray(S.posterior_mean(ours, jnp.asarray(xt), jnp.asarray(x0), jnp.asarray(t)))
    np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-7)
    for log in (True, False):
        for vs in (0.0, 0.3, 1.0):
            r = ref.estimate_variance_t(torch.from_numpy(t), 4, log=log, var_scale=vs).numpy()
            o = np.asarray(S.posterior_variance(ours, jnp.asarray(t), 4, log=log, var_scale=vs))
            np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-6)


def test_ancestral_step_deterministic_noise():
    """Reference draws noise internally; inject identical noise via monkeypatched
    x_final to compare the full ancestral step."""
    ref, ours = make_pair()
    g = np.random.default_rng(3)
    xt = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    xT = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    noise = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    t = np.array([0, 1, 500, 999], dtype=np.int64)

    ref.x_final = lambda x: torch.from_numpy(noise)  # shadow classmethod on instance
    r_prior, r_x0 = ref.estimate_x_t_prior_from_x_T(
        torch.from_numpy(xt), torch.from_numpy(t), torch.from_numpy(xT)
    )
    o_prior, o_x0 = S.ancestral_step_from_eps(
        ours, jnp.asarray(xt), jnp.asarray(t), jnp.asarray(xT), jnp.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(o_x0), r_x0.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o_prior), r_prior.numpy(), rtol=1e-4, atol=1e-5)


def test_cold_diffusion_step():
    ref, ours = make_pair()
    g = np.random.default_rng(4)
    xt = g.standard_normal((4, 4, 8, 8)).astype(np.float32)
    x0 = np.tanh(g.standard_normal((4, 4, 8, 8)).astype(np.float32))
    t = np.array([1, 2, 500, 999], dtype=np.int64)
    r_prior, r_x0 = ref.estimate_x_t_prior_from_x_0(
        torch.from_numpy(xt), torch.from_numpy(t), torch.from_numpy(x0), cold_diffusion=True
    )
    o_prior, o_x0 = S.cold_diffusion_step(ours, jnp.asarray(xt), jnp.asarray(t), jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(o_prior), r_prior.numpy(), rtol=1e-4, atol=1e-5)


def test_ddim_sigma_and_step():
    ref, ours = make_pair()
    # reference computes sigma inline in denoise (diffusion_pipeline.py:297-304)
    g = np.random.default_rng(5)
    x0 = np.tanh(g.standard_normal((2, 4, 8, 8)).astype(np.float32))
    xT = g.standard_normal((2, 4, 8, 8)).astype(np.float32)
    noise = g.standard_normal((2, 4, 8, 8)).astype(np.float32)
    for (t, t_next) in [(999, 500), (500, 100), (100, 0)]:
        alpha = ref.alphas_cumprod[t]
        alpha_next = ref.alphas_cumprod[t_next]
        eta = 1.0
        sigma = eta * ((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)).sqrt()
        c = (1 - alpha_next - sigma**2).sqrt()
        r = (torch.from_numpy(x0) * alpha_next.sqrt() + c * torch.from_numpy(xT) + sigma * torch.from_numpy(noise)).numpy()
        o = np.asarray(S.ddim_step(ours, jnp.asarray(x0), jnp.asarray(xT), t, t_next, jnp.asarray(noise), eta))
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(S.ddim_sigma(ours, t, t_next, eta)), float(sigma), rtol=1e-5)


def test_kl_gaussians():
    from tests.reference_oracle import reference_math_utils
    ref = reference_math_utils()
    g = np.random.default_rng(6)
    m1, lv1, m2, lv2 = (g.standard_normal((3, 5)).astype(np.float32) for _ in range(4))
    r = ref.kl_gaussians(*(torch.from_numpy(a) for a in (m1, lv1, m2, lv2))).numpy()
    o = np.asarray(S.kl_gaussians(*(jnp.asarray(a) for a in (m1, lv1, m2, lv2))))
    np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)


def test_forward_diffusion_statistics():
    """Reference test intent (tests/noise_schedulers/test_data.py): x_t at large t
    approaches N(0,1)."""
    _, ours = make_pair("cosine")
    g = np.random.default_rng(7)
    x0 = (g.random((64, 3, 16, 16)).astype(np.float32) * 2) - 1
    xT = g.standard_normal((64, 3, 16, 16)).astype(np.float32)
    t = np.full((64,), 999, dtype=np.int64)
    xt = np.asarray(S.q_sample(ours, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(xT)))
    assert abs(xt.mean()) < 0.05
    assert abs(xt.std() - 1.0) < 0.05


def test_forward_diffusion_statistics_and_qq():
    """Reference test intent made assertive (tests/noise_schedulers/test_data.py
    :73-117 prints per-t moments/histograms; test_data_qq.py eyeballs
    QQ-plots): q(x_t | x_0) must have mean sqrt(abar_t) x_0 and variance
    (1 - abar_t), and at t=T-1 the marginal must be ~N(0,1) — checked with a
    Kolmogorov-Smirnov distance instead of a plot."""
    import math

    from medfusion_tpu.core import schedules as S
    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule

    T = 1000
    sched = GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear", beta_start=0.002, beta_end=0.02
    )
    rng = np.random.default_rng(11)
    n = 50_000
    x0_val = 0.7
    x0 = jnp.full((n, 1, 1, 1), x0_val, jnp.float32)
    eps = jnp.asarray(rng.standard_normal((n, 1, 1, 1)).astype(np.float32))

    # mid-t conditional moments
    for t_scalar in (100, 500, 900):
        t = jnp.full((n,), t_scalar, jnp.int32)
        x_t = np.asarray(S.q_sample(sched, x0, t, eps)).ravel()
        abar = float(sched.alphas_cumprod[t_scalar])
        np.testing.assert_allclose(x_t.mean(), math.sqrt(abar) * x0_val, atol=0.02)
        np.testing.assert_allclose(x_t.std(), math.sqrt(1 - abar), atol=0.02)

    # t = T-1: marginal ~ N(0,1) for bounded x0 (KS distance vs normal CDF;
    # 5% critical value at n=50k is ~0.006 — 0.015 leaves margin)
    t = jnp.full((n,), T - 1, jnp.int32)
    x_t = np.sort(np.asarray(S.q_sample(sched, x0, t, eps)).ravel())
    ecdf = (np.arange(1, n + 1) - 0.5) / n
    phi = 0.5 * (1.0 + np.vectorize(math.erf)(x_t / math.sqrt(2.0)))
    ks = float(np.max(np.abs(ecdf - phi)))
    assert ks < 0.015, f"x_(T-1) not ~N(0,1): KS distance {ks:.4f}"
