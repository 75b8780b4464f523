"""Diffusion train step: AdamW over the noise estimator only.

Parity: reference optimizer config (diffusion_pipeline.py:338-348 — optimizer
covers ``noise_estimator.parameters()`` only; latent embedder frozen) and EMA
update per train batch (:334-336). One donated, jittable step function.

Mixed precision (``compute_dtype=jnp.bfloat16``): the estimator's parameters
and activations run in bf16 (MXU-native on TPU) while the MASTER params, the
optimizer state, the gradients and all scheduler/loss math stay float32 —
the cast sits inside the loss so autodiff casts the cotangents back to f32
(standard bf16-training recipe; the reference trains fp32 eager,
train_diffusion.py:159-161 has AMP commented out)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional

import jax

from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train.state import TrainState


def make_diffusion_train_step(
    pipeline: DiffusionPipeline,
    donate: bool = False,
    compute_dtype=None,
) -> Callable:
    """Returns ``step_fn(state, latent_params, batch, rng) -> (state, metrics)``.

    ``latent_params`` is the frozen latent-embedder subtree (or None when the
    diffusion runs in pixel space). ``compute_dtype`` (e.g. ``jnp.bfloat16``)
    enables mixed-precision training: bf16 estimator forward/backward, f32
    master weights/optimizer/loss."""
    if compute_dtype is not None:
        # the pipeline casts estimator inputs/outputs at this dtype; params
        # are cast per-step inside the loss below
        pipeline = dataclasses.replace(pipeline, compute_dtype=compute_dtype)

    def loss_fn(estimator_params, latent_params, batch, rng):
        if compute_dtype is not None:
            estimator_params = jax.tree_util.tree_map(
                lambda v: v.astype(compute_dtype), estimator_params)
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
