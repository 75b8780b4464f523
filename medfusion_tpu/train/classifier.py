"""Noisy-latent classifier training — the guided-diffusion recipe.

Beyond-reference: the reference vendors the ``EncoderUNetModel`` classifier
half (external/stable_diffusion/unet_openai.py:747-961) but never trains or
uses it. Here it becomes a working subsystem: train the classifier on
``(x_t, t) -> label`` pairs where ``x_t = q_sample(encode(x_0), t, eps)``
(Dhariwal & Nichol, arXiv:2105.05233 §4: the classifier must see the SAME
noise levels the sampler will query it at), then plug it into
:func:`medfusion_tpu.pipelines.diffusion.make_classifier_grad` for guided
sampling. CLI: ``python -m medfusion_tpu.cli.train_classifier``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class ClassifierTrainer:
    """Static config; ``classifier`` maps ``(x_t, t) -> [B, K]`` logits
    (e.g. :class:`~medfusion_tpu.models.unet_openai.EncoderUNetOpenAI`)."""

    classifier: Any
    scheduler: GaussianDiffusionSchedule
    latent_embedder: Any = None  # frozen; None = pixel-space classifier

    def loss(self, params, latent_params, batch: Dict, rng
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        x_in = batch["source"]
        labels = batch["target"].astype(jnp.int32)
        b = x_in.shape[0]
        k_enc, k_t, k_noise, k_drop = jax.random.split(rng, 4)

        if self.latent_embedder is not None:
            z = self.latent_embedder.apply(
                {"params": jax.lax.stop_gradient(latent_params)}, x_in,
                method=self.latent_embedder.encode, rngs={"sample": k_enc})
        else:
            z = x_in
        t = jax.random.randint(k_t, (b,), 0, self.scheduler.T, jnp.int32)
        x_t = S.q_sample(self.scheduler, z, t,
                         jax.random.normal(k_noise, z.shape, z.dtype))

        logits = self.classifier.apply({"params": params}, x_t, t, train=True,
                                       rngs={"dropout": k_drop})
        lp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        return ce, {"loss": ce, "acc": acc}


def make_classifier_train_step(trainer: ClassifierTrainer,
                               donate: bool = False) -> Callable:
    """Returns ``step_fn(state, latent_params, batch, rng) -> (state, metrics)``
    (same shape as ``make_diffusion_train_step``)."""

    def step_fn(state: TrainState, latent_params, batch: Dict, rng):
        (_, metrics), grads = jax.value_and_grad(trainer.loss, has_aux=True)(
            state.params, latent_params, batch, rng)
        return state.apply_gradients(grads), metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)
