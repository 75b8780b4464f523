"""Production serving: request micro-batching onto one compiled program.

Beyond-reference (the reference's only serving surface is a streamlit page
that samples per interaction, ``streamlit/pages/chest.py:13-41``). TPU
serving economics want the opposite of per-request sampling:

* ONE fixed batch shape — every request rides the same compiled executable
  (XLA recompiles per distinct batch size; a naive server recompiles under
  load and the remote-TPU compile costs minutes);
* request coalescing — concurrent requests within a short window share one
  device dispatch, so throughput follows the bench batch curve instead of
  the single-sample latency floor;
* per-request determinism — each slot derives its own noise from
  ``fold_in(key, seed)``, so a request's image depends only on its
  ``(seed, cond)``, not on which batch it landed in (verified in
  ``tests/test_serving.py``).

The batcher is model-agnostic: give it ``batch_fn(seeds, conds) -> [B,...]``
over fixed-shape int32 vectors. :func:`make_sample_batch_fn` builds one from
a :class:`~medfusion_tpu.pipelines.diffusion.DiffusionPipeline` (eta=0 DDIM:
deterministic given the per-slot init noise).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp


def make_sample_batch_fn(pipe, params, latent_shape, steps: int = 50,
                         guidance_scale: float = 1.0, conditional: bool = True,
                         base_key=None, family: str = "diffusion") -> Callable:
    """Jitted ``(seeds[B], conds[B]) -> images [B, H, W, C]`` with per-slot
    noise streams: slot i's init noise is ``normal(fold_in(base, seeds[i]))``
    so results are independent of batch composition. ``family='flow'`` serves
    a rectified-flow checkpoint through its Heun ODE sampler."""
    base = jax.random.PRNGKey(0) if base_key is None else base_key

    @jax.jit
    def batch_fn(seeds, conds):
        keys = jax.vmap(lambda s: jax.random.fold_in(base, s))(seeds)
        x_T = jax.vmap(lambda k: jax.random.normal(k, latent_shape))(keys)
        gs = guidance_scale if conditional else 1.0
        if family == "flow":
            return pipe.denoise(
                params, x_T, None, condition=conds if conditional else None,
                steps=steps, guidance_scale=gs)
        return pipe.denoise(
            params, x_T, base, condition=conds if conditional else None,
            steps=steps, use_ddim=True, eta=0.0, guidance_scale=gs)

    return batch_fn


class MicroBatcher:
    """Coalesce concurrent single-image requests into fixed-size batches.

    ``submit(seed, cond)`` returns a ``concurrent.futures.Future`` resolving
    to that request's image. A worker drains the queue: it waits up to
    ``max_wait_s`` for the batch to fill, pads the remainder by repeating the
    last request (fixed shape!), runs ``batch_fn`` once, and distributes the
    rows. Exceptions propagate to every waiting future.
    """

    def __init__(self, batch_fn: Callable, batch_size: int,
                 max_wait_s: float = 0.05):
        self.batch_fn = batch_fn
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_s)
        self._queue: List[Tuple[int, int, Future]] = []
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._closed = False
        self.batches_run = 0  # observability (tested)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, seed: int, cond: int = 0) -> Future:
        fut: Future = Future()
        with self._wake:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append((int(seed), int(cond), fut))
            self._wake.notify()
        return fut

    def close(self, timeout: Optional[float] = 5.0):
        with self._wake:
            self._closed = True
            self._wake.notify()
        self._worker.join(timeout=timeout)

    # ------------------------------------------------------------------

    def _take_batch(self):
        """Wait for >=1 request, then up to max_wait_s for a full batch."""
        import time as _time

        with self._wake:
            while not self._queue and not self._closed:
                self._wake.wait(timeout=0.5)
            if not self._queue:
                return None  # closed and drained
            end = _time.monotonic() + self.max_wait_s
            while len(self._queue) < self.batch_size and not self._closed:
                remaining = end - _time.monotonic()
                if remaining <= 0:
                    break
                self._wake.wait(timeout=remaining)
            batch = self._queue[: self.batch_size]
            del self._queue[: len(batch)]
            return batch

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            seeds = [s for s, _, _ in batch]
            conds = [c for _, c, _ in batch]
            pad = self.batch_size - len(batch)
            seeds = seeds + [seeds[-1]] * pad
            conds = conds + [conds[-1]] * pad
            try:
                out = self.batch_fn(jnp.asarray(seeds, jnp.int32),
                                    jnp.asarray(conds, jnp.int32))
                out.block_until_ready()
                self.batches_run += 1
                for i, (_, _, fut) in enumerate(batch):
                    fut.set_result(out[i])
            except Exception as e:  # noqa: BLE001 - propagate to callers
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
