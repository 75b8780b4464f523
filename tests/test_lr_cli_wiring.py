"""LR schedules wired into the product surface (VERDICT r2 #4): the
make_lr_schedule factory matches the reference's vendored
LambdaLinearScheduler exactly, rides inside an optax optimizer, and the
schedule position survives checkpoint save/restore (it lives in the optax
step count inside TrainState.opt_state)."""

import importlib.util
from pathlib import Path

import numpy as np
import optax

import jax
import jax.numpy as jnp

from medfusion_tpu.train import TrainState
from medfusion_tpu.train.lr_schedules import lambda_linear_schedule, make_lr_schedule

REF_LR = Path("/root/reference/medical_diffusion/external/stable_diffusion/lr_schedulers.py")


def _vendored_scheduler():
    spec = importlib.util.spec_from_file_location("_ref_lr", REF_LR)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.LambdaLinearScheduler


def test_make_lr_schedule_lambda_linear_matches_vendored_scheduler():
    Ref = _vendored_scheduler()
    ref = Ref(warm_up_steps=[100], f_min=[1.0], f_max=[1.0], f_start=[1e-6],
              cycle_lengths=[10_000_000_000_000])
    sched = make_lr_schedule("lambda_linear", base_lr=2e-4, warmup_steps=100)
    for step in [0, 1, 50, 99, 100, 101, 5000, 100000]:
        want = 2e-4 * float(ref.schedule(step))
        got = float(sched(jnp.asarray(step)))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"step={step}")


def test_lambda_linear_multi_cycle_matches_vendored():
    Ref = _vendored_scheduler()
    kw = dict(warm_up_steps=[10, 5], f_min=[0.1, 0.01], f_max=[1.0, 0.5],
              f_start=[1e-6, 1e-6], cycle_lengths=[50, 100])
    ref = Ref(**kw)
    ours = lambda_linear_schedule(**kw)
    for step in [0, 3, 10, 30, 49, 50, 52, 60, 120, 149]:
        np.testing.assert_allclose(float(ours(jnp.asarray(step))),
                                   float(ref.schedule(step)), rtol=1e-5,
                                   err_msg=f"step={step}")


def test_schedule_drives_optax_updates():
    """SGD with the schedule: after k steps of grad=1 on a scalar, the param
    moved by exactly sum(schedule(0..k-1))."""
    sched = make_lr_schedule("lambda_linear", base_lr=0.1, warmup_steps=4)
    tx = optax.sgd(sched)
    p = {"w": jnp.asarray(1.0)}
    state = tx.init(p)
    g = {"w": jnp.asarray(1.0)}
    moved = 0.0
    for k in range(6):
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
        moved += float(sched(jnp.asarray(k)))
    np.testing.assert_allclose(float(p["w"]), 1.0 - moved, rtol=1e-5)


def test_resume_restores_schedule_position(tmp_path):
    """Checkpoint at step 3, restore, continue 2 steps == uninterrupted 5
    steps (the optax count — hence the LR — resumes, not restarts)."""
    from medfusion_tpu.utils import checkpoint as C

    sched = make_lr_schedule("cosine", base_lr=0.1, warmup_steps=2, total_steps=10)
    make_state = lambda: TrainState.create({"w": jnp.asarray(1.0)}, optax.sgd(sched))
    g = {"w": jnp.asarray(1.0)}

    def step(s):
        return s.apply_gradients(g)

    s_full = make_state()
    for _ in range(5):
        s_full = step(s_full)

    s_a = make_state()
    for _ in range(3):
        s_a = step(s_a)
    C.save_checkpoint(tmp_path / "ck", s_a, step=3)
    s_b = C.restore_checkpoint(tmp_path / "ck", make_state())
    assert int(s_b.step) == 3
    for _ in range(2):
        s_b = step(s_b)
    np.testing.assert_allclose(float(s_b.params["w"]), float(s_full.params["w"]),
                               rtol=1e-6)


def test_cli_accepts_lr_schedule_flag():
    """--lr-schedule exists on both train CLIs (smoke: parser accepts it)."""
    import argparse

    from medfusion_tpu.cli import train_autoencoder, train_diffusion

    for mod in (train_diffusion, train_autoencoder):
        # parse_known_args on the module's parser via a dry main() invocation
        # would start training; instead verify the flag registers by probing
        # the argparse error path for an INVALID choice.
        try:
            mod.main(["--lr-schedule", "bogus", "--max-steps", "0"])
            raise AssertionError("expected SystemExit for bad --lr-schedule")
        except SystemExit as e:
            assert e.code == 2  # argparse rejected the choice => flag exists
