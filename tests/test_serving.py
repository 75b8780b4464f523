"""Request micro-batching for serving: coalescing, fixed-shape padding,
per-request determinism independent of batch composition, and error
propagation."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.demo.serving import MicroBatcher, make_sample_batch_fn
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline


class _ScaleEstimator:
    """eps-estimator: y = 0.1 * x + cond-dependent constant (exercises the
    conds path without a real net)."""

    def apply(self, variables, x_t, t, condition=None, self_cond=None,
              cond_mask=None):
        y = 0.1 * x_t
        if condition is not None:
            y = y + 0.05 * condition.astype(x_t.dtype)[:, None, None, None]
        return y, []


def _batch_fn(batch_size):
    sched = GaussianDiffusionSchedule.create(
        timesteps=20, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=_ScaleEstimator(),
                             latent_embedder=None, estimator_objective="x_T",
                             clip_x0=False, do_input_centering=False)
    return make_sample_batch_fn(pipe, {"noise_estimator": {}}, (4, 4, 1),
                                steps=10, conditional=True)


def test_microbatcher_coalesces_and_matches_solo_runs():
    fn = _batch_fn(4)
    mb = MicroBatcher(fn, batch_size=4, max_wait_s=0.2)
    try:
        futs = [mb.submit(seed=s, cond=s % 2) for s in range(8)]
        got = [np.asarray(f.result(timeout=60)) for f in futs]
    finally:
        mb.close()
    # coalesced: 8 requests -> exactly 2 full batches
    assert mb.batches_run == 2

    # per-request determinism: each row equals the direct single computation
    # (batch composition must not leak into a request's image)
    for s in range(8):
        solo = np.asarray(fn(jnp.asarray([s] * 4, jnp.int32),
                             jnp.asarray([s % 2] * 4, jnp.int32))[0])
        np.testing.assert_allclose(got[s], solo, atol=1e-6)


def test_microbatcher_pads_partial_batches():
    fn = _batch_fn(4)
    mb = MicroBatcher(fn, batch_size=4, max_wait_s=0.05)
    try:
        f = mb.submit(seed=123, cond=1)  # alone -> padded to 4
        out = np.asarray(f.result(timeout=60))
    finally:
        mb.close()
    assert out.shape == (4, 4, 1)
    assert mb.batches_run == 1


def test_microbatcher_propagates_errors():
    def boom(seeds, conds):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, batch_size=2, max_wait_s=0.01)
    try:
        f = mb.submit(seed=0)
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(timeout=10)
    finally:
        mb.close()


def test_microbatcher_concurrent_submitters():
    fn = _batch_fn(4)
    mb = MicroBatcher(fn, batch_size=4, max_wait_s=0.2)
    results = {}

    def client(s):
        results[s] = np.asarray(mb.submit(seed=s, cond=0).result(timeout=60))

    try:
        threads = [threading.Thread(target=client, args=(s,)) for s in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    finally:
        mb.close()
    assert len(results) == 8
    # distinct seeds -> distinct images; same program (batches <= 3 despite
    # 8 concurrent clients racing the window)
    assert mb.batches_run <= 3
    assert not np.allclose(results[0], results[1])
