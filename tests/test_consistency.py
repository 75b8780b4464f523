"""Consistency distillation (arXiv:2303.01469 / 2310.14189): boundary
property, exact-oracle fixed point, one/few-step sampling, EMA target,
learning run."""

import numpy as np
import pytest
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState
from medfusion_tpu.train.consistency import (
    consistency_function,
    consistency_sample,
    make_consistency_distillation_loss,
    make_consistency_train_step,
)

KEY = jax.random.PRNGKey(0)
SIGMA_DATA = 0.5


def _sched(T=100):
    return GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)


class _AnyF(nn.Module):
    """Arbitrary F (returns a transform of the input) — used to prove the
    boundary property holds for ANY parameterized function."""

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        return jnp.tanh(x_t * 3.0) + 0.7, []


class _OracleConsistencyF(nn.Module):
    """The EXACT consistency model: F* chosen so that
    f(x_sigma, sigma) = x0 + sigma_min * eps_implied — the trajectory value
    at the sigma_min boundary (the true fixed point of CD training).
    Inputs arrive in VP space with fractional t; sigma is recovered by
    interpolating the baked log-sigma table."""

    x0: tuple
    log_sig: tuple
    sigma_min: float

    @nn.compact
    def __call__(self, x_vp, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        ls = jnp.asarray(np.asarray(self.log_sig, np.float32))
        sig = jnp.exp(jnp.interp(t.astype(jnp.float32),
                                 jnp.arange(ls.shape[0], dtype=jnp.float32), ls))
        s = sig.reshape(-1, 1, 1, 1)
        x_k = x_vp * jnp.sqrt(1.0 + s**2)
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        sm = self.sigma_min
        c_skip = SIGMA_DATA**2 / ((s - sm) ** 2 + SIGMA_DATA**2)
        c_out = SIGMA_DATA * (s - sm) / jnp.sqrt(s**2 + SIGMA_DATA**2)
        eps_implied = (x_k - x0) / s
        want = x0 + sm * eps_implied
        F = jnp.where(c_out > 1e-8, (want - c_skip * x_k) / jnp.clip(c_out, 1e-8), 0.0)
        return jnp.broadcast_to(F, x_vp.shape), []


class _OracleX0Teacher(nn.Module):
    """Exact teacher x0-prediction (condition-blind)."""

    x0: tuple

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        return jnp.broadcast_to(x0, x_t.shape), []


def _x0_tuple(x0):
    return tuple(map(tuple, x0[0, :, :, 0].tolist()))


def test_boundary_property_any_F():
    """f(x, sigma_min) == x exactly, regardless of F (the c_skip/c_out
    parameterization guarantees it)."""
    sched = _sched()
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_AnyF(),
                             estimator_objective="x_0", clip_x0=False,
                             do_input_centering=False)
    sig = S.kdiff_sigmas(sched)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 4, 4, 1)).astype(np.float32))
    out = consistency_function(pipe, {"noise_estimator": {}}, x, sig[0],
                               sigma_data=SIGMA_DATA)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def _oracle_setup(T=100):
    rng = np.random.default_rng(4)
    x0 = rng.uniform(-0.8, 0.8, (1, 4, 4, 1)).astype(np.float32)
    sched = _sched(T)
    sig = np.asarray(S.kdiff_sigmas(sched), np.float64)
    student = _OracleConsistencyF(x0=_x0_tuple(x0),
                                  log_sig=tuple(np.log(sig).tolist()),
                                  sigma_min=float(sig[0]))
    teacher = _OracleX0Teacher(x0=_x0_tuple(x0))
    pipe_s = DiffusionPipeline(scheduler=sched, noise_estimator=student,
                               estimator_objective="x_0", clip_x0=False,
                               do_input_centering=False)
    pipe_t = DiffusionPipeline(scheduler=sched, noise_estimator=teacher,
                               estimator_objective="x_0", clip_x0=False,
                               do_input_centering=False)
    return pipe_s, pipe_t, x0, float(sig[0])


def test_oracle_consistency_fixed_point_loss_zero():
    """With the exact teacher AND the exact consistency function as both
    student and target, the CD loss is ~0 for every grid draw (the training
    fixed point)."""
    pipe_s, pipe_t, x0, _ = _oracle_setup()
    # the loss factory runs teacher and student through ONE pipeline/module;
    # with two distinct oracle modules, replicate its internals with both
    # pipes (same math, same grid draw)
    from medfusion_tpu.train import consistency as CS

    sched = pipe_s.scheduler
    rng = np.random.default_rng(0)
    b = 16
    x0_b = jnp.broadcast_to(jnp.asarray(x0), (b, 4, 4, 1))
    eps = jnp.asarray(rng.standard_normal((b, 4, 4, 1)).astype(np.float32))
    sigma_min, sigma_max = CS._sigma_bounds(sched)
    grid = S.karras_sigma_grid(sigma_min, sigma_max, 12, 7.0)[:-1][::-1]
    n = jnp.asarray(rng.integers(0, 11, (b,)), jnp.int32)
    s_lo, s_hi = grid[n], grid[n + 1]

    x_hi = x0_b + CS._bcast(s_hi, 4, b) * eps
    d = (x_hi - CS._x0_from_model(pipe_t, {"noise_estimator": {}}, x_hi, s_hi, None)) \
        / CS._bcast(s_hi, 4, b)
    x_lo = x_hi + CS._bcast(s_lo - s_hi, 4, b) * d

    f_student = consistency_function(pipe_s, {"noise_estimator": {}},
                                     x_hi, s_hi, sigma_data=SIGMA_DATA)
    f_target = consistency_function(pipe_s, {"noise_estimator": {}},
                                    x_lo, s_lo, sigma_data=SIGMA_DATA)
    gap = float(jnp.max(jnp.abs(f_student - f_target)))
    assert gap < 1e-4, gap


def test_oracle_one_and_few_step_sampling():
    """The exact consistency model one-step-samples to the sigma_min
    boundary value (within sigma_min of x0); multistep stays there."""
    pipe_s, _, x0, sigma_min = _oracle_setup()
    rng = np.random.default_rng(1)
    x_T = jnp.asarray(rng.standard_normal((4, 4, 4, 1)).astype(np.float32))
    one = consistency_sample(pipe_s, {"noise_estimator": {}}, x_T, steps=1,
                             sigma_data=SIGMA_DATA, decode=False)
    err = float(jnp.max(jnp.abs(one - jnp.asarray(x0))))
    # boundary residue is sigma_min * eps_implied
    assert err < 6 * sigma_min, (err, sigma_min)
    two = consistency_sample(pipe_s, {"noise_estimator": {}}, x_T,
                             rng=jax.random.PRNGKey(2), steps=3,
                             sigma_data=SIGMA_DATA, decode=False)
    err2 = float(jnp.max(jnp.abs(two - jnp.asarray(x0))))
    assert err2 < 6 * sigma_min, (err2, sigma_min)
    with pytest.raises(ValueError, match="pass rng"):
        consistency_sample(pipe_s, {"noise_estimator": {}}, x_T, steps=2)


def test_cd_loss_contracts():
    pipe_s, _, _, _ = _oracle_setup()
    import dataclasses
    with pytest.raises(ValueError, match="self-cond"):
        make_consistency_distillation_loss(
            dataclasses.replace(pipe_s, use_self_conditioning=True))
    with pytest.raises(ValueError, match="n_grid"):
        make_consistency_distillation_loss(pipe_s, n_grid=1)
    zsched = GaussianDiffusionSchedule.create(
        timesteps=50, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02, zero_terminal_snr=True)
    zpipe = dataclasses.replace(pipe_s, scheduler=zsched,
                                estimator_objective="v")
    with pytest.raises(ValueError, match="zero-terminal-SNR"):
        make_consistency_distillation_loss(zpipe)
    with pytest.raises(ValueError, match="solver"):
        make_consistency_distillation_loss(pipe_s, solver="rk4")


def test_cd_heun_matches_euler_on_exact_teacher():
    """With the EXACT x0-teacher every probability-flow trajectory is
    straight (x_sigma = x0 + sigma*eps, so d = (x-x0)/sigma is constant in
    sigma along it): the Heun correction slope d2 equals the Euler slope d
    and both solvers produce bit-identical targets — hence identical losses
    for the same rng."""
    pipe_s, pipe_t, x0, _ = _oracle_setup()
    b = 8
    batch = {"source": jnp.broadcast_to(jnp.asarray(x0), (b, 4, 4, 1))}
    rng = jax.random.PRNGKey(3)
    le, _ = make_consistency_distillation_loss(pipe_t, n_grid=12,
                                               solver="euler")({}, {}, {},
                                                               batch, rng)
    lh, _ = make_consistency_distillation_loss(pipe_t, n_grid=12,
                                               solver="heun")({}, {}, {},
                                                              batch, rng)
    # F = x0 is NOT the exact consistency function, so the loss is nonzero —
    # the equality is about the solver, not a trivial 0 == 0
    assert float(le) > 1e-4
    np.testing.assert_allclose(float(le), float(lh), rtol=1e-6)


def test_cd_heun_differs_from_euler_on_curved_teacher():
    """A state-dependent teacher prediction curves the ODE, so the Heun
    midpoint correction must change the target (proves the second slope is
    actually evaluated, not dead code)."""
    sched = _sched()
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_AnyF(),
                             estimator_objective="x_0", clip_x0=False,
                             do_input_centering=False)
    rng = jax.random.PRNGKey(5)
    b = 8
    batch = {"source": jnp.asarray(np.random.default_rng(9).uniform(
        -0.8, 0.8, (b, 4, 4, 1)).astype(np.float32))}
    le, _ = make_consistency_distillation_loss(pipe, n_grid=12,
                                               solver="euler")({}, {}, {},
                                                               batch, rng)
    lh, _ = make_consistency_distillation_loss(pipe, n_grid=12,
                                               solver="heun")({}, {}, {},
                                                              batch, rng)
    assert abs(float(le) - float(lh)) > 1e-6


def test_cd_cli_smoke(tmp_path):
    from medfusion_tpu.cli import distill, sample

    out = tmp_path / "cd"
    distill.main(["--preset", "smoke", "--method", "cd", "--cd-grid", "6",
                  "--iters-per-stage", "3", "--ckpt-every", "3",
                  "--out", str(out), "--batch-size", "4", "--cd-ema"])
    ckpts = out / "consistency" / "checkpoints"
    assert ckpts.exists()

    # the distilled model samples through the stock CLI (2-step consistency)
    sample.main(["--preset", "smoke", "--ckpt", str(ckpts), "--ema",
                 "--sampler", "consistency", "--steps", "2", "--n", "2",
                 "--out", str(tmp_path / "imgs")])
    assert any((tmp_path / "imgs").glob("*.png"))


@pytest.mark.slow
def test_consistency_distillation_learns_one_step():
    """End-to-end: CD on a random-weight v-objective teacher. The trained
    one-step consistency student must land closer to the teacher's many-step
    EDM ODE output than the untrained (init = teacher) student does, and the
    loss must fall."""
    T = 50
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(16, 32), kernel_sizes=(3, 3),
                strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 8, "affine": True}),
                deep_supervision=0, time_emb_dim=32)
    sched = _sched(T)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             estimator_objective="v", clip_x0=False,
                             do_input_centering=False)
    raw = unet.init(KEY, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,), jnp.int32))["params"]
    rng = np.random.default_rng(7)
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    teacher = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.05)
                  for l in leaves])

    data = jnp.asarray(rng.uniform(-1, 1, (32, 16, 16, 1)).astype(np.float32))
    step = make_consistency_train_step(pipe, n_grid=10, sigma_data=SIGMA_DATA,
                                       huber_c=0.03)
    state = TrainState.create(teacher, optax.adamw(1e-3), use_ema=True,
                              ema_kwargs={"max_value": 0.95})
    losses = []
    for it in range(300):
        idx = np.random.default_rng(it).choice(32, 8, replace=False)
        state, metrics = step(state, teacher, {"source": data[idx]},
                              jax.random.fold_in(KEY, it))
        losses.append(float(metrics["loss"]))
    early, late = np.mean(losses[:10]), np.mean(losses[-10:])
    assert late < 0.7 * early, f"no CD learning: {early:.4f} -> {late:.4f}"

    # the teacher's ODE endpoint as ground truth
    x_T = jnp.asarray(rng.standard_normal((8, 16, 16, 1)).astype(np.float32))
    truth = pipe.denoise_edm({"noise_estimator": teacher}, x_T, steps=40,
                             decode=False)
    before = consistency_sample(pipe, {"noise_estimator": teacher}, x_T,
                                steps=1, sigma_data=SIGMA_DATA, decode=False)
    after = consistency_sample(pipe, {"noise_estimator": state.inference_params},
                               x_T, steps=1, sigma_data=SIGMA_DATA, decode=False)
    err_before = float(jnp.linalg.norm(before - truth))
    err_after = float(jnp.linalg.norm(after - truth))
    assert np.isfinite(err_after)
    assert err_after < err_before, (
        f"CD one-step error {err_after:.4f} !< untrained {err_before:.4f}")


# ---------------------------------------------------------------------------
# Consistency TRAINING (teacher-free, arXiv:2310.14189)
# ---------------------------------------------------------------------------

def test_oracle_ct_loss_zero():
    """CT fixed point: with the exact consistency function as student, the
    teacher-free loss is ~0 — the shared-eps pair (x0 + s_hi*eps,
    x0 + s_lo*eps) lies on one trajectory whose implied eps both queries
    recover, so f_student == f_target exactly."""
    from medfusion_tpu.train.consistency import make_consistency_training_loss

    pipe_s, _, x0, _ = _oracle_setup()
    loss_fn = make_consistency_training_loss(pipe_s, n_grid=12,
                                             sigma_data=SIGMA_DATA)
    b = 16
    x0_b = jnp.broadcast_to(jnp.asarray(x0), (b, 4, 4, 1))
    loss, metrics = loss_fn({}, {"source": x0_b}, jax.random.PRNGKey(0))
    assert float(metrics["f_gap"]) < 1e-4, float(metrics["f_gap"])
    assert float(loss) < 1e-4, float(loss)


def test_ct_lognormal_index_distribution():
    """The sampled sigma_hi distribution matches the improved-techniques
    erf-difference law exactly (recomputed here with scipy) and sits below
    the uniform-index mean (mass shifts toward small sigmas)."""
    import scipy.special as sp

    from medfusion_tpu.train.consistency import (
        _sigma_bounds,
        make_consistency_training_loss,
    )

    pipe_s, _, x0, _ = _oracle_setup()
    sched = pipe_s.scheduler
    loss_fn = make_consistency_training_loss(pipe_s, n_grid=18,
                                             sigma_data=SIGMA_DATA)
    b = 4096
    x0_b = jnp.broadcast_to(jnp.asarray(x0), (b, 4, 4, 1))
    _, metrics = loss_fn({}, {"source": x0_b}, jax.random.PRNGKey(1))
    sigma_min, sigma_max = _sigma_bounds(sched)
    g = np.asarray(
        S.karras_sigma_grid(sigma_min, sigma_max, 18, 7.0), np.float64)[:-1][::-1]
    cdf = sp.erf((np.log(g) - (-1.1)) / (np.sqrt(2.0) * 2.0))
    p = np.clip(cdf[1:] - cdf[:-1], 1e-12, None)
    p /= p.sum()
    expected = float((p * g[1:]).sum())      # E[sigma_hi] under the law
    uniform = float(g[1:].mean())            # E[sigma_hi] under uniform n
    got = float(metrics["sigma_hi_mean"])
    assert abs(got - expected) < 0.03, (got, expected)
    assert expected < uniform, (expected, uniform)


def test_ct_curriculum_grid():
    from medfusion_tpu.train.consistency import ct_curriculum_grid

    stages = ct_curriculum_grid(800, s0=10, s1=80)
    assert [n for _, n in stages] == [11, 21, 41, 81]
    starts = [s for s, _ in stages]
    assert starts[0] == 0 and starts == sorted(starts)
    assert ct_curriculum_grid(100, doublings=2) == [(0, 11), (50, 21)]
    # non-power-of-two target clamps at s1 (iCT N(k) = min(s0*2^k, s1)+1)
    assert [n for _, n in ct_curriculum_grid(500, s0=10, s1=100)] == \
        [11, 21, 41, 81, 101]


def test_consistency_rejects_clip_x0():
    """clip_x0=True would clip f (breaking the boundary guarantee) and zero
    gradients where |f| > 1 — both loss factories must reject it."""
    import dataclasses as _dc

    from medfusion_tpu.train.consistency import make_consistency_training_loss

    pipe_s, _, _, _ = _oracle_setup()
    clipped = _dc.replace(pipe_s, clip_x0=True)
    with pytest.raises(ValueError, match="clip_x0"):
        make_consistency_distillation_loss(clipped)
    with pytest.raises(ValueError, match="clip_x0"):
        make_consistency_training_loss(clipped)


def test_consistency_training_learns_one_step():
    """Teacher-free CT from scratch on a biased toy dataset: the loss falls
    and the trained one-step generator's output distribution moves toward
    the data (mean shift), while the untrained one stays near zero (zero-init
    UNet head => f(x, sigma_max) ~ c_skip*x ~ 0)."""
    from medfusion_tpu.train.consistency import make_consistency_training_step

    T = 50
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(16, 32), kernel_sizes=(3, 3),
                strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 8, "affine": True}),
                deep_supervision=0, time_emb_dim=32)
    sched = _sched(T)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             estimator_objective="x_0", clip_x0=False,
                             do_input_centering=False)
    init = unet.init(KEY, jnp.zeros((2, 16, 16, 1)),
                     jnp.zeros((2,), jnp.int32))["params"]
    rng = np.random.default_rng(7)
    data = jnp.asarray(
        (0.6 + 0.1 * rng.standard_normal((32, 16, 16, 1))).astype(np.float32))

    step = make_consistency_training_step(pipe, n_grid=10,
                                          sigma_data=SIGMA_DATA,
                                          huber_c=0.0087)  # 0.00054*sqrt(256)
    state = TrainState.create(init, optax.adamw(3e-3))
    losses = []
    for it in range(300):
        idx = np.random.default_rng(it).choice(32, 8, replace=False)
        state, metrics = step(state, {"source": data[idx]},
                              jax.random.fold_in(KEY, it))
        losses.append(float(metrics["loss"]))
    early, late = np.mean(losses[:10]), np.mean(losses[-10:])
    assert late < 0.7 * early, f"no CT learning: {early:.4f} -> {late:.4f}"

    x_T = jnp.asarray(rng.standard_normal((8, 16, 16, 1)).astype(np.float32))
    before = consistency_sample(pipe, {"noise_estimator": init}, x_T,
                                steps=1, sigma_data=SIGMA_DATA, decode=False)
    after = consistency_sample(pipe, {"noise_estimator": state.params}, x_T,
                               steps=1, sigma_data=SIGMA_DATA, decode=False)
    assert np.all(np.isfinite(np.asarray(after)))
    gap_before = abs(float(jnp.mean(before)) - 0.6)
    gap_after = abs(float(jnp.mean(after)) - 0.6)
    assert gap_after < 0.5 * gap_before, (gap_after, gap_before)


def test_ct_cli_smoke(tmp_path):
    from medfusion_tpu.cli import distill

    out = tmp_path / "ct"
    distill.main(["--preset", "smoke", "--method", "ct", "--ct-doublings", "1",
                  "--iters-per-stage", "3", "--ckpt-every", "3",
                  "--out", str(out), "--batch-size", "4"])
    assert (out / "consistency_training" / "checkpoints").exists()
    with pytest.raises(SystemExit, match="teacher-free"):
        distill.main(["--preset", "smoke", "--method", "ct",
                      "--teacher-ckpt", str(out),
                      "--iters-per-stage", "1", "--out", str(out)])


def test_distill_resume(tmp_path):
    """--resume restores the stage's latest checkpoint: a finished short run
    continues to the longer target, and a completed stage fast-forwards
    without retraining."""
    from medfusion_tpu.cli import distill
    from medfusion_tpu.utils import checkpoint as C

    out = tmp_path / "ct"
    base = ["--preset", "smoke", "--method", "ct", "--ct-doublings", "1",
            "--ckpt-every", "2", "--out", str(out), "--batch-size", "4"]
    distill.main(base + ["--iters-per-stage", "2"])
    ckpts = out / "consistency_training" / "checkpoints"
    assert C.latest_step(ckpts) == 2
    distill.main(base + ["--iters-per-stage", "4", "--resume"])
    assert C.latest_step(ckpts) == 4
    # idempotent: already complete -> no new steps
    distill.main(base + ["--iters-per-stage", "4", "--resume"])
    assert C.latest_step(ckpts) == 4
