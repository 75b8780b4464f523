"""v-prediction objective (Salimans & Ho, arXiv:2202.00512 §2.4) — the third
standard parameterization, beyond the reference's eps/x_0 pair.

Checks: closed-form identities of the v algebra, oracle-estimator exact x_0
recovery through the full DDIM and DPM-Solver++ loops, objective-equivalence
(an eps-oracle and a v-oracle of the same posterior produce identical
samples), and a real-UNet v-objective train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

T = 60


def _sched():
    return GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)


def test_v_algebra_identities():
    sched = _sched()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 5, 5, 2)) * 0.3, jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4, 5, 5, 2)), jnp.float32)
    t = jnp.asarray([0, 7, 30, T - 1], jnp.int32)
    x_t = S.q_sample(sched, x0, t, eps)
    v = S.v_target(sched, x0, eps, t)
    # x_0 inversion
    np.testing.assert_allclose(
        np.asarray(S.estimate_x_0_from_v(sched, x_t, v, t, clip=False)),
        np.asarray(x0), atol=1e-5)
    # consistency with the eps inversion: same x_0 from either param
    x0_eps = S.estimate_x_0(sched, x_t, eps, t, clip=False)
    np.testing.assert_allclose(
        np.asarray(S.estimate_x_0_from_v(sched, x_t, v, t, clip=False)),
        np.asarray(x0_eps), atol=1e-5)


class _OracleV:
    """Returns the exact v for a fixed true x_0 (derived from the incoming
    x_t) — any correct sampler must reconstruct x_0 exactly."""

    def __init__(self, sched, true_x0):
        self.sched, self.true_x0 = sched, true_x0

    def apply(self, variables, x_t, t, condition=None, self_cond=None,
              cond_mask=None):
        eps = S.estimate_x_T(self.sched, x_t, self.true_x0, t, clip=False)
        return S.v_target(self.sched, self.true_x0, eps, t), []


class _OracleEps:
    def __init__(self, sched, true_x0):
        self.sched, self.true_x0 = sched, true_x0

    def apply(self, variables, x_t, t, condition=None, self_cond=None,
              cond_mask=None):
        return S.estimate_x_T(self.sched, x_t, self.true_x0, t, clip=False), []


def _pipe(est, objective):
    return DiffusionPipeline(scheduler=_sched(), noise_estimator=est,
                             latent_embedder=None,
                             estimator_objective=objective,
                             clip_x0=False, do_input_centering=False)


def test_v_oracle_recovers_x0_ddim_and_dpmpp():
    sched = _sched()
    rng = np.random.default_rng(1)
    true_x0 = jnp.asarray(rng.uniform(-0.7, 0.7, (2, 6, 6, 1)), jnp.float32)
    pipe = _pipe(_OracleV(sched, true_x0), "v")
    x_T = jnp.asarray(rng.standard_normal((2, 6, 6, 1)), jnp.float32)

    out = pipe.denoise({"noise_estimator": {}}, x_T, jax.random.PRNGKey(0),
                       steps=25, use_ddim=True, eta=0.0, decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(true_x0), atol=1e-4)

    out2 = pipe.denoise_dpmpp({"noise_estimator": {}}, x_T, steps=20,
                              decode=False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(true_x0), atol=1e-4)


def test_v_and_eps_oracles_sample_identically():
    """The same posterior expressed in either parameterization must drive the
    sampler to the same trajectory."""
    sched = _sched()
    rng = np.random.default_rng(2)
    true_x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 6, 6, 1)), jnp.float32)
    x_T = jnp.asarray(rng.standard_normal((2, 6, 6, 1)), jnp.float32)
    kwargs = dict(steps=15, use_ddim=True, eta=0.0, decode=False)
    out_v = _pipe(_OracleV(sched, true_x0), "v").denoise(
        {"noise_estimator": {}}, x_T, jax.random.PRNGKey(3), **kwargs)
    out_e = _pipe(_OracleEps(sched, true_x0), "x_T").denoise(
        {"noise_estimator": {}}, x_T, jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_e), atol=1e-5)


def test_v_objective_train_step_with_real_unet():
    from medfusion_tpu.models.unet import UNet
    from medfusion_tpu.train import TrainState, make_diffusion_train_step
    import optax

    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), time_emb_dim=16, cond_emb_num_classes=2,
                deep_supervision=0, use_attention="none",
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    pipe = DiffusionPipeline(scheduler=_sched(), noise_estimator=unet,
                             latent_embedder=None, estimator_objective="v",
                             do_input_centering=False)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((4, 8, 8, 2))
    params = unet.init(key, z, jnp.zeros((4,), jnp.int32),
                       jnp.zeros((4,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adam(1e-3))
    step = make_diffusion_train_step(pipe, donate=False)
    batch = {"source": jnp.asarray(
        np.random.default_rng(4).uniform(-1, 1, (4, 8, 8, 2)), jnp.float32),
        "target": jnp.zeros((4,), jnp.int32)}
    losses = []
    for i in range(12):
        state, m = step(state, None, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_unknown_objective_rejected():
    with pytest.raises(ValueError):
        DiffusionPipeline(scheduler=_sched(), noise_estimator=None,
                          estimator_objective="nope")


def test_v_with_self_cond_and_learned_variance_train_step():
    """Pins the untested v combinations: self-conditioning pre-pass (x_0
    estimate from v) and learned-variance KL (pred_x_0 from the TRUE v
    target, mirroring the eps branch's reference convention)."""
    from medfusion_tpu.models.unet import UNet
    from medfusion_tpu.train import TrainState, make_diffusion_train_step
    import optax

    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), time_emb_dim=16, cond_emb_num_classes=2,
                deep_supervision=0, use_attention="none",
                estimate_variance=True, use_self_conditioning=True,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    pipe = DiffusionPipeline(scheduler=_sched(), noise_estimator=unet,
                             latent_embedder=None, estimator_objective="v",
                             estimate_variance=True,
                             use_self_conditioning=True,
                             do_input_centering=False)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((2, 8, 8, 2))
    params = unet.init(key, z, jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adam(1e-3))
    step = make_diffusion_train_step(pipe, donate=False)
    batch = {"source": jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (2, 8, 8, 2)), jnp.float32),
        "target": jnp.zeros((2,), jnp.int32)}
    for i in range(3):
        state, m = step(state, None, batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(m["loss"])), m
        assert np.isfinite(float(m["variance_scale"]))


def test_v_fast_sampler_matches_exact_at_key_every_one():
    """denoise_fast(key_every=1) must equal denoise() bitwise for the v
    objective (pins the fast sampler's v branch)."""
    from medfusion_tpu.models.unet import UNet

    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), time_emb_dim=16, cond_emb_num_classes=None,
                deep_supervision=0, use_attention="none",
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    pipe = DiffusionPipeline(scheduler=_sched(), noise_estimator=unet,
                             latent_embedder=None, estimator_objective="v",
                             clip_x0=True, do_input_centering=False)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 1))
    params = {"noise_estimator": unet.init(key, x, jnp.zeros((2,), jnp.int32),
                                           None)["params"]}
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    exact = pipe.denoise(params, x_T, jax.random.PRNGKey(2), steps=8,
                         use_ddim=True, eta=0.0, decode=False)
    fast = pipe.denoise_fast(params, x_T, jax.random.PRNGKey(2), steps=8,
                             eta=0.0, decode=False, encoder_key_every=1)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-6)


def test_eps_from_v_identity_and_terminal_finiteness():
    """estimate_x_T_from_v equals the eps implied by (x_t, v) and stays
    finite even where the x_0-roundtrip form (1/sqrt(abar)) diverges."""
    sched = _sched()
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.standard_normal((3, 4, 4, 1)) * 0.4, jnp.float32)
    eps = jnp.asarray(rng.standard_normal((3, 4, 4, 1)), jnp.float32)
    t = jnp.asarray([0, 25, T - 1], jnp.int32)
    x_t = S.q_sample(sched, x0, t, eps)
    v = S.v_target(sched, x0, eps, t)
    got = S.estimate_x_T_from_v(sched, x_t, v, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(eps), atol=1e-5)
    # finite even on a synthetic terminal-SNR-zero table entry
    import dataclasses
    zeroed = dataclasses.replace(
        sched,
        sqrt_alphas_cumprod=sched.sqrt_alphas_cumprod.at[-1].set(0.0),
        sqrt_one_minus_alphas_cumprod=(
            sched.sqrt_one_minus_alphas_cumprod.at[-1].set(1.0)))
    tt = jnp.full((3,), T - 1, jnp.int32)
    out = S.estimate_x_T_from_v(zeroed, x_t, v, tt)
    assert bool(jnp.all(jnp.isfinite(out)))
