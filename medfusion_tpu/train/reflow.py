"""Reflow — rectified-flow straightening and 1-step distillation.

BEYOND the reference (which ships DDPM/DDIM sampling only,
``/root/reference/medical_diffusion/models/pipelines/diffusion_pipeline.py:278-310``):
the flow-family analog of progressive distillation
(:mod:`medfusion_tpu.train.distillation`). Follows Liu et al., *Rectified
Flow* (arXiv:2209.03003, §3): given a trained velocity field v1 (a
:class:`~medfusion_tpu.pipelines.flow.FlowMatchingPipeline` checkpoint),

1. **Pair generation**: draw z1 ~ N(0, I) and integrate the teacher's
   probability-flow ODE down to z0 — a *deterministic coupling* (z0, z1)
   replacing the independent (x0, eps) pairing of ordinary flow training.
2. **Reflow (k-rectification)**: retrain with the SAME conditional
   flow-matching loss on the straight path x_t = (1-t) z0 + t z1 with the
   COUPLED pairs — the target velocity is the constant path slope z1 - z0.
   Each rectification provably straightens the flow (paper Thm 3.5), so
   few-step (even 1-step) Euler integration approaches the many-step
   teacher output.
3. **1-step distillation** (paper §3.3): after reflow the path is nearly
   straight, so regressing v(z1, t=1) onto z1 - z0 directly (the
   ``distill_t=1.0`` fixed-time variant below) yields a one-Euler-step
   generator: z0_hat = z1 - v(z1, 1).

TPU shape: pair generation is the pipeline's jitted ``denoise`` scan (one
program, no host round-trips; batch-shardable over the 'data' mesh axis
exactly like bulk sampling); the reflow loss is a single estimator forward —
it jits/pjits and composes with the dp/fsdp partition specs like every other
train step in :mod:`medfusion_tpu.train`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from medfusion_tpu.pipelines.flow import FlowMatchingPipeline
from medfusion_tpu.train.state import TrainState


def generate_reflow_pairs(
    pipeline: FlowMatchingPipeline,
    teacher_params_tree,
    rng: jax.Array,
    num_pairs: int,
    latent_shape,
    condition=None,
    steps: int = 32,
    heun: bool = True,
    guidance_scale: float = 1.0,
    un_cond=None,
):
    """One batch of coupled pairs ``(z1, z0)``: z1 ~ N(0, I), z0 = the
    teacher ODE solution at t=0 (latent space — ``decode=False``). Jit-safe
    (call under ``jax.jit`` or wrap in a batch-sharded program for bulk
    generation). ``guidance_scale != 1`` bakes the CFG-combined teacher into
    the coupling (the flow analog of guided distillation)."""
    z1 = jax.random.normal(rng, (num_pairs, *latent_shape), jnp.float32)
    z0 = pipeline.denoise(teacher_params_tree, z1, None, condition=condition,
                          steps=steps, guidance_scale=guidance_scale,
                          un_cond=un_cond, decode=False, heun=heun)
    return z1, z0


def make_reflow_loss(
    pipeline: FlowMatchingPipeline,
    distill_t: Optional[float] = None,
) -> Callable:
    """Returns ``loss_fn(student_params, batch, rng) -> (loss, metrics)``.

    ``batch`` carries the coupled pairs: ``{'z0', 'z1'[, 'target']}`` (both
    latents; generate with :func:`generate_reflow_pairs`). The loss is the
    conditional flow-matching objective on the straight path between them
    (arXiv:2209.03003 eq. 1 with the deterministic coupling):

        t ~ pipeline's time draw,  x_t = (1-t) z0 + t z1,
        loss = || v_student(x_t, t) - (z1 - z0) ||^2

    ``distill_t`` pins t to a constant instead (paper §3.3 distillation;
    ``distill_t=1.0`` trains the one-Euler-step generator
    z0_hat = z1 - v(z1, 1))."""
    if distill_t is not None and not (0.0 < distill_t <= 1.0):
        raise ValueError("distill_t must be in (0, 1]")

    def loss_fn(student_params, batch: Dict, rng):
        z0, z1 = batch["z0"], batch["z1"]
        condition = batch.get("target")
        b = z0.shape[0]
        if distill_t is None:
            t = pipeline._sample_t(rng, b)
        else:
            t = jnp.full((b,), distill_t, jnp.float32)
        t_b = t.reshape((b,) + (1,) * (z0.ndim - 1))
        x_t = (1.0 - t_b) * z0 + t_b * z1
        target = z1 - z0

        student_tree = {"noise_estimator": student_params}
        cond_mask = None if condition is None else jnp.ones((b,), z0.dtype)
        pred, _ = pipeline._apply_estimator(
            student_tree, x_t, t * pipeline.time_scale, condition, None,
            cond_mask)
        loss = jnp.mean((pred - target) ** 2)
        return loss, {"loss": loss}

    return loss_fn


def make_reflow_train_step(
    pipeline: FlowMatchingPipeline,
    distill_t: Optional[float] = None,
    donate: bool = False,
    compute_dtype=None,
) -> Callable:
    """Returns ``step_fn(state, batch, rng) -> (state, metrics)`` over
    pre-generated pair batches (``{'z0', 'z1'[, 'target']}``). The teacher
    appears only through the pairs, so pair generation amortizes over many
    student steps (regenerate periodically, or precompute a pair dataset as
    the paper does). ``compute_dtype=bf16`` = bf16 forward/backward with f32
    master weights (same recipe as ``make_diffusion_train_step``)."""
    if compute_dtype is not None:
        pipeline = dataclasses.replace(pipeline, compute_dtype=compute_dtype)
    base_loss = make_reflow_loss(pipeline, distill_t)

    def loss_fn(student_params, batch, rng):
        if compute_dtype is not None:
            student_params = jax.tree_util.tree_map(
                lambda v: v.astype(compute_dtype), student_params)
        return base_loss(student_params, batch, rng)

    def step_fn(state: TrainState, batch: Dict, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)
