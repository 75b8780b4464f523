"""Reflow / rectified-flow straightening (train/reflow.py) — BEYOND the
reference (DDPM/DDIM only): the flow-family analog of progressive
distillation (arXiv:2209.03003 §3): coupled-pair generation via the teacher
ODE, flow-matching on the straight coupled paths, fixed-t=1 distillation
into a one-Euler-step generator."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.flow import FlowMatchingPipeline
from medfusion_tpu.train import TrainState
from medfusion_tpu.train.reflow import (
    generate_reflow_pairs,
    make_reflow_loss,
    make_reflow_train_step,
)

KEY = jax.random.PRNGKey(0)


class _LinearVelocity:
    """v(x, t) = -x: the ODE from t=1 to 0 gives z0 = e * z1 exactly."""

    def apply(self, variables, x, t, condition, self_cond, cond_mask):
        return -x, []


class _ConstVelocity:
    """v(x, t) = c: a perfectly straight flow — ANY integrator is exact and
    the coupled pairs satisfy z0 = z1 - c."""

    def __init__(self, c):
        self.c = c

    def apply(self, variables, x, t, condition, self_cond, cond_mask):
        return jnp.broadcast_to(self.c, x.shape), []


def _tiny_unet(in_ch=1, classes=0):
    return UNet(in_ch=in_ch, out_ch=in_ch, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                cond_emb_num_classes=classes, deep_supervision=0, time_emb_dim=16)


def test_pair_generation_matches_analytic_ode():
    pipe = FlowMatchingPipeline(noise_estimator=_LinearVelocity(),
                                do_input_centering=False)
    z1, z0 = generate_reflow_pairs(pipe, {"noise_estimator": {}}, KEY,
                                   4, (4, 4, 1), steps=32)
    assert z1.shape == z0.shape == (4, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(z0), np.e * np.asarray(z1), atol=2e-2)


def test_constant_velocity_gives_zero_reflow_loss():
    c = jnp.asarray(0.7, jnp.float32)
    pipe = FlowMatchingPipeline(noise_estimator=_ConstVelocity(c),
                                do_input_centering=False)
    params_tree = {"noise_estimator": {}}
    z1, z0 = generate_reflow_pairs(pipe, params_tree, KEY, 4, (4, 4, 1),
                                   steps=5, heun=False)
    # straight flow: the coupling slope IS the constant field
    np.testing.assert_allclose(np.asarray(z1 - z0), 0.7, atol=1e-5)
    batch = {"z0": z0, "z1": z1}
    for distill_t in (None, 1.0, 0.3):
        loss_fn = make_reflow_loss(pipe, distill_t=distill_t)
        loss, _ = loss_fn({}, batch, jax.random.PRNGKey(1))
        assert float(loss) < 1e-9, (distill_t, float(loss))
    with pytest.raises(ValueError):
        make_reflow_loss(pipe, distill_t=0.0)


def test_reflow_train_step_reduces_loss_on_fixed_pairs():
    unet = _tiny_unet(classes=2)
    z0 = jnp.zeros((4, 8, 8, 1))
    cond = jnp.asarray([0, 1, 0, 1], jnp.int32)
    params = unet.init(KEY, z0, jnp.zeros((4,), jnp.float32), cond)["params"]
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False)
    # synthetic coupled pairs (any fixed coupling works for the regression)
    z1 = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 1))
    z0p = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 1))
    batch = {"z0": z0p, "z1": z1, "target": cond}
    step = make_reflow_train_step(pipe, distill_t=1.0)
    state = TrainState.create(params, optax.adam(3e-3))
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(KEY, i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_one_step_distillation_beats_teacher_one_step():
    """The headline reflow claim at toy scale: after fixed-t=1 distillation
    on teacher-ODE pairs, the student's ONE Euler step approximates the
    teacher's 16-step ODE output better than the teacher's own one step."""
    unet = _tiny_unet()
    z0_shape = (8, 8, 8, 1)
    teacher = unet.init(KEY, jnp.zeros(z0_shape),
                        jnp.zeros((8,), jnp.float32), None)["params"]
    # the UNet head is zero-init (velocity identically 0, a trivial straight
    # ODE) — perturb every leaf so the teacher field is genuinely curved
    leaves, treedef = jax.tree_util.tree_flatten(teacher)
    ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    teacher = jax.tree_util.tree_unflatten(
        treedef, [l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, ks)])
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False)
    t_tree = {"noise_estimator": teacher}

    gen = jax.jit(lambda k: generate_reflow_pairs(
        pipe, t_tree, k, 8, z0_shape[1:], steps=16))
    pool = [dict(zip(("z1", "z0"), gen(jax.random.fold_in(KEY, j))))
            for j in range(8)]

    step = make_reflow_train_step(pipe, distill_t=1.0)
    state = TrainState.create(teacher, optax.adam(2e-3))
    for i in range(400):
        state, metrics = step(state, pool[i % 8], jax.random.fold_in(KEY, i))
    assert np.isfinite(float(metrics["loss"]))

    z1, z0_ref = gen(jax.random.fold_in(KEY, 99))  # held-out pairs
    one_step = jax.jit(lambda p, z: pipe.denoise(
        {"noise_estimator": p}, z, steps=1, heun=False))
    err_student = float(jnp.mean((one_step(state.params, z1) - z0_ref) ** 2))
    err_teacher = float(jnp.mean((one_step(teacher, z1) - z0_ref) ** 2))
    assert err_student < 0.5 * err_teacher, (err_student, err_teacher)


def test_reflow_cli_smoke(tmp_path):
    from medfusion_tpu.cli import distill
    from medfusion_tpu.utils import checkpoint as C

    out = tmp_path / "reflow"
    distill.main([
        "--preset", "smoke", "--method", "reflow",
        "--iters-per-stage", "2", "--pair-batches", "1",
        "--reflow-teacher-steps", "2", "--reflow-distill-iters", "2",
        "--ckpt-every", "2", "--out", str(out),
    ])
    assert C.latest_step(out / "reflow" / "checkpoints") == 2
    assert C.latest_step(out / "reflow_1step" / "checkpoints") == 2
