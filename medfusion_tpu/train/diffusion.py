"""Diffusion train step: AdamW over the noise estimator only.

Parity: reference optimizer config (diffusion_pipeline.py:338-348 — optimizer
covers ``noise_estimator.parameters()`` only; latent embedder frozen) and EMA
update per train batch (:334-336). One donated, jittable step function."""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax

from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train.state import TrainState


def make_diffusion_train_step(
    pipeline: DiffusionPipeline,
    donate: bool = False,
) -> Callable:
    """Returns ``step_fn(state, latent_params, batch, rng) -> (state, metrics)``.

    ``latent_params`` is the frozen latent-embedder subtree (or None when the
    diffusion runs in pixel space)."""

    def loss_fn(estimator_params, latent_params, batch, rng):
        params = {"noise_estimator": estimator_params}
        if latent_params is not None:
            params["latent_embedder"] = latent_params
        return pipeline.train_loss(params, batch, rng)

    def step_fn(state: TrainState, latent_params, batch: Dict, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, latent_params, batch, rng
        )
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)
