"""Progressive distillation (arXiv:2202.00512): grid identity, oracle target
algebra, self-distillation fixed point, and an end-to-end learning run."""

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
from medfusion_tpu.train.distillation import (
    distillation_targets,
    make_distillation_loss,
    make_distillation_train_step,
    next_stage_steps,
    student_sample_timesteps,
)

KEY = jax.random.PRNGKey(0)


def _sched(T=100):
    return GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)


def test_student_grid_is_the_trailing_ddim_grid():
    """The training grid t_i = round(i*T/N)-1 must equal the sampler's
    'trailing' spacing for EVERY step count — that identity is what lets a
    distilled student sample via denoise(..., timestep_spacing='trailing')
    unchanged. Exhaustive over N (regression: the old float-stride
    np.arange trailing grid had steps+1 entries for N=61/103/... and
    rounded the other way for N=48/96/...)."""
    for T in (1000, 250, 50):
        sched = GaussianDiffusionSchedule.create(timesteps=T)
        for N in range(1, min(T, 500) + 1):
            got = sched.ddim_timesteps_host(N, spacing="trailing")
            assert got.shape == (N,), f"T={T} N={N}: {got.shape}"
            assert got[0] >= 0 and got[-1] == T - 1, f"T={T} N={N}"
            np.testing.assert_array_equal(
                np.asarray(student_sample_timesteps(sched, N)), got,
                err_msg=f"T={T} N={N}")


def test_traced_grid_matches_host_grid():
    """distillation_targets' traced gather must agree with the f64 host
    tables at every i — including the (T, N) where a traced float32
    round(i*T/N) rounds exact-.5 the other way (e.g. N=208, 240)."""
    from medfusion_tpu.train.distillation import student_timestep_grid

    for T, N in ((1000, 208), (1000, 240), (1000, 48), (1000, 61), (250, 52)):
        grid = student_timestep_grid(T, N)
        i = jnp.arange(1, N + 1, dtype=jnp.int32)
        t, t_mid, t_end = jax.jit(grid)(i)
        i64 = np.arange(1, N + 1, dtype=np.float64)
        np.testing.assert_array_equal(
            np.asarray(t), np.round(i64 * (T / N)).astype(np.int64) - 1)
        np.testing.assert_array_equal(
            np.asarray(t_mid),
            np.round((i64 - 0.5) * (T / N)).astype(np.int64) - 1)
        assert int(t_end[0]) == -1
        np.testing.assert_array_equal(np.asarray(t_end[1:]),
                                      np.asarray(t[:-1]))


def test_next_stage_steps():
    assert next_stage_steps(8) == 4
    assert next_stage_steps(3) == 1
    assert next_stage_steps(1) is None


class _OracleX0(nn.Module):
    x0: tuple

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        return jnp.broadcast_to(x0, x_t.shape), []


def _oracle_pipe(T=100):
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-0.9, 0.9, (1, 4, 4, 1)).astype(np.float32)
    est = _OracleX0(x0=tuple(map(tuple, x0[0, :, :, 0].tolist())))
    pipe = DiffusionPipeline(scheduler=_sched(T), noise_estimator=est,
                             estimator_objective="x_0", clip_x0=False,
                             do_input_centering=False)
    return pipe, x0


def test_oracle_teacher_target_is_true_x0():
    """With an exact teacher the two half-steps stay on the closed
    trajectory z = alpha x0 + sigma eps, and the eq. 9 solve returns the
    true x0 exactly — for every student level including i=1 (t_end = -1)."""
    pipe, x0 = _oracle_pipe()
    b = 8
    rng = np.random.default_rng(0)
    x0_b = jnp.broadcast_to(jnp.asarray(x0), (b, 4, 4, 1))
    noise = jnp.asarray(rng.standard_normal((b, 4, 4, 1)).astype(np.float32))
    for N in (4, 10, 50):
        i = jnp.asarray(rng.integers(1, N + 1, (b,)), jnp.int32)
        z_t, t, x_tilde, w = distillation_targets(
            pipe, {"noise_estimator": {}}, x0_b, i, noise, N)
        np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(x0_b),
                                   atol=1e-4, err_msg=f"N={N}")
        assert np.all(np.asarray(w) >= 1.0)


def test_self_distillation_loss_is_zero():
    """student == teacher == oracle: the student's x-prediction equals the
    target, so the distillation loss is ~0 (the fixed point)."""
    pipe, x0 = _oracle_pipe()
    loss_fn = make_distillation_loss(pipe, student_steps=10)
    batch = {"source": jnp.broadcast_to(jnp.asarray(x0), (4, 4, 4, 1))}
    loss, metrics = loss_fn({}, {}, batch, jax.random.PRNGKey(1))
    assert float(loss) < 1e-6
    assert float(metrics["x_mse"]) < 1e-8


def test_distillation_loss_contracts():
    pipe, _ = _oracle_pipe(T=100)
    with pytest.raises(ValueError, match="student_steps"):
        make_distillation_loss(pipe, student_steps=51)  # > T//2
    import dataclasses
    with pytest.raises(ValueError, match="self-conditioning"):
        make_distillation_loss(
            dataclasses.replace(pipe, use_self_conditioning=True), 4)
    with pytest.raises(ValueError, match="learned-variance"):
        make_distillation_loss(
            dataclasses.replace(pipe, estimate_variance=True), 4)


def test_guided_distillation_oracle_and_effect():
    """Guided distillation (fixed-w CFG teacher, arXiv:2210.03142):
    (a) with a condition-blind oracle teacher the CFG combine is a no-op and
    the target stays the true x0 (plumbing check through the batched-CFG
    path); (b) on a conditional random-weight net, guidance != 1 must
    actually change the targets."""
    pipe, x0 = _oracle_pipe()
    b = 6
    rng = np.random.default_rng(2)
    x0_b = jnp.broadcast_to(jnp.asarray(x0), (b, 4, 4, 1))
    noise = jnp.asarray(rng.standard_normal((b, 4, 4, 1)).astype(np.float32))
    i = jnp.asarray(rng.integers(1, 11, (b,)), jnp.int32)
    cond = jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32)
    _, _, x_tilde, _ = distillation_targets(
        pipe, {"noise_estimator": {}}, x0_b, i, noise, 10, cond,
        teacher_guidance_scale=4.0, un_cond=1 - cond)
    np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(x0_b), atol=1e-4)

    # (b) conditional net: guidance changes the target
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, cond_emb_num_classes=2)
    sched = _sched(50)
    cpipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                              estimator_objective="v", clip_x0=False,
                              do_input_centering=False)
    raw = unet.init(KEY, jnp.zeros((2, 8, 8, 1)), jnp.zeros((2,), jnp.int32),
                    jnp.zeros((2,), jnp.int32))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    teacher = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1)
                  for l in leaves])
    xb = jnp.asarray(rng.uniform(-1, 1, (b, 8, 8, 1)).astype(np.float32))
    nb = jnp.asarray(rng.standard_normal((b, 8, 8, 1)).astype(np.float32))
    ib = jnp.asarray(rng.integers(1, 5, (b,)), jnp.int32)
    cb = jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32)
    tt = {"noise_estimator": teacher}
    _, _, tgt1, _ = distillation_targets(cpipe, tt, xb, ib, nb, 4, cb)
    _, _, tgt4, _ = distillation_targets(cpipe, tt, xb, ib, nb, 4, cb,
                                         teacher_guidance_scale=4.0,
                                         un_cond=1 - cb)
    assert np.all(np.isfinite(np.asarray(tgt4)))
    assert float(jnp.max(jnp.abs(tgt1 - tgt4))) > 1e-5


def test_distill_cli_smoke(tmp_path):
    """Two stages (4 -> 2 steps), 3 iters each, random teacher, smoke preset:
    the full CLI driver runs and writes per-stage checkpoints."""
    from medfusion_tpu.cli import distill

    out = tmp_path / "distill"
    distill.main(["--preset", "smoke", "--start-steps", "4", "--stages", "2",
                  "--iters-per-stage", "3", "--ckpt-every", "3",
                  "--out", str(out), "--batch-size", "4",
                  "--teacher-guidance", "4.0"])
    assert (out / "stage_4steps" / "checkpoints").exists()
    assert (out / "stage_2steps" / "checkpoints").exists()


@pytest.mark.slow
def test_progressive_distillation_learns_fewer_step_sampling():
    """End-to-end: distill a (random-weight) v-objective teacher into a
    4-step student over T=50. After training, the student's 4-step trailing
    DDIM output must be closer to the teacher's 8-step output than the
    undistilled baseline (the teacher itself run at 4 steps)."""
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
    rng = np.random.default_rng(1)
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    teacher = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.05)
                  for l in leaves])

    # toy data: class-free blobs
    data = jnp.asarray(rng.uniform(-1, 1, (32, 16, 16, 1)).astype(np.float32))

    N = 4
    step = make_distillation_train_step(pipe, student_steps=N, donate=False)
    state = TrainState.create(teacher, optax.adamw(1e-3))
    losses = []
    for it in range(300):
        idx = np.random.default_rng(it).choice(32, 8, replace=False)
        state, metrics = step(state, teacher, {"source": data[idx]},
                              jax.random.fold_in(KEY, it))
        losses.append(float(metrics["loss"]))
    early, late = np.mean(losses[:10]), np.mean(losses[-10:])
    assert late < 0.5 * early, f"no distillation learning: {early:.4f} -> {late:.4f}"

    # sampling comparison from shared noise
    x_T = jnp.asarray(rng.standard_normal((8, 16, 16, 1)).astype(np.float32))
    kw = dict(use_ddim=True, eta=0.0, timestep_spacing="trailing", decode=False)
    teacher_tree = {"noise_estimator": teacher}
    student_tree = {"noise_estimator": state.params}
    ref8 = pipe.denoise(teacher_tree, x_T, jax.random.PRNGKey(9), steps=2 * N, **kw)
    base4 = pipe.denoise(teacher_tree, x_T, jax.random.PRNGKey(9), steps=N, **kw)
    stud4 = pipe.denoise(student_tree, x_T, jax.random.PRNGKey(9), steps=N, **kw)
    err_base = float(jnp.linalg.norm(base4 - ref8))
    err_stud = float(jnp.linalg.norm(stud4 - ref8))
    assert np.isfinite(err_stud)
    assert err_stud < err_base, (
        f"distilled 4-step error {err_stud:.4f} !< undistilled {err_base:.4f}")
