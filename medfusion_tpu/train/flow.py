"""Flow-matching train step.

:class:`medfusion_tpu.pipelines.flow.FlowMatchingPipeline` keeps the exact
``train_loss(params, batch, rng)`` / ``compute_dtype`` contract of the
diffusion pipeline, so the step factory is the SAME function — AdamW over
the estimator only, frozen latent embedder passed separately, optional bf16
mixed precision with f32 master weights, donate-able. This module exists so
the flow family has a first-class, documented entry point (and so a future
flow-specific step — e.g. reflow pairing — has a home)."""

from __future__ import annotations

from medfusion_tpu.train.diffusion import make_diffusion_train_step


def make_flow_train_step(pipeline, donate: bool = False, compute_dtype=None):
    """Returns ``step_fn(state, latent_params, batch, rng) -> (state, metrics)``
    for a :class:`FlowMatchingPipeline` (see
    :func:`make_diffusion_train_step` — identical semantics)."""
    return make_diffusion_train_step(pipeline, donate=donate,
                                     compute_dtype=compute_dtype)
