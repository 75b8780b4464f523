"""Failure recovery: the auto-restart supervisor resumes a REAL checkpointed
training run after an injected crash and lands in the exact same state as an
uninterrupted run (SURVEY.md §5 — the reference's only recovery is a manual
re-run)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medfusion_tpu.train import TrainState
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.resilience import run_with_auto_restore

TOTAL, CKPT_EVERY = 10, 2


def _make_step():
    def loss_fn(params, x):
        return jnp.mean((params["w"] * x - 1.0) ** 2)

    grad = jax.jit(jax.grad(loss_fn))

    def step(state, i):
        # deterministic per-step data so two runs are bit-identical
        x = jnp.asarray(np.random.default_rng(i).normal(size=(4,)), jnp.float32)
        return state.apply_gradients(grad(state.params, x))

    return step


def _train(ckpt_dir, resume, crash_at=None, crashed=None):
    step = _make_step()
    state = TrainState.create({"w": jnp.ones((4,))}, optax.adam(1e-2))
    if resume and C.latest_step(ckpt_dir) is not None:
        state = C.restore_checkpoint(ckpt_dir, state)
    i = int(state.step)
    while i < TOTAL:
        if crash_at is not None and i == crash_at and not crashed[0]:
            crashed[0] = True
            raise RuntimeError("injected fault (preemption)")
        state = step(state, i)
        i += 1
        if i % CKPT_EVERY == 0:
            C.save_checkpoint(ckpt_dir, state, i)
    return state


def test_auto_restore_resumes_and_matches_clean_run(tmp_path):
    clean = _train(str(tmp_path / "clean"), resume=False)

    crashed = [False]
    failures = []
    state = run_with_auto_restore(
        lambda resume: _train(str(tmp_path / "faulty"), resume,
                              crash_at=7, crashed=crashed),
        max_restarts=3,
        on_failure=lambda e, n: failures.append((type(e).__name__, n)),
    )
    assert failures == [("RuntimeError", 1)]
    assert int(state.step) == TOTAL
    # restored from the step-6 checkpoint and re-ran 7..10: identical state
    np.testing.assert_array_equal(np.asarray(state.params["w"]),
                                  np.asarray(clean.params["w"]))


def test_auto_restore_gives_up_after_budget():
    calls = []

    def always_fails(resume):
        calls.append(resume)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        run_with_auto_restore(always_fails, max_restarts=2,
                              on_failure=lambda e, n: None)
    assert calls == [False, True, True]


def test_keyboard_interrupt_propagates():
    def interrupted(resume):
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        run_with_auto_restore(interrupted, max_restarts=5)
