"""Plain (non-adversarial) autoencoder training: VAE / VQVAE.

Loss semantics parity with the reference:
* VAE.rec_loss  (latent_embedders.py:802-818): elementwise pixel loss +
  per-image LPIPS + per-image (1-SSIM) broadcast together, summed over all
  elements / batch; vertical heads added unweighted with 'nearest-exact'
  downscaled targets.
* VQVAE.rec_loss (latent_embedders.py:355-368): per-level mean with
  normalized 1/2^i pyramid weights.
* total = rec + embedding_loss_weight * emb_loss (KL or commitment)
  (latent_embedders.py:829-830, :383-384).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from medfusion_tpu.losses.ssim import ssim
from medfusion_tpu.nn.functional import interpolate_nearest_exact
from medfusion_tpu.train.state import TrainState


def _pixel_elems(pred, target, kind: str):
    if kind == "l1":
        return jnp.abs(pred - target)
    return (pred - target) ** 2


def ssim_loss_per_image(pred, target):
    """1 - relu(ssim) per image, [B,1,...,1] (latent_embedders.py:798-800).
    Note: pred is clamped to [0,1] after de-centering, target is not."""
    s = ssim(
        jnp.clip((pred + 1) / 2, 0, 1), (target + 1) / 2,
        data_range=1.0, size_average=False, nonnegative_ssim=True,
    )
    return (1.0 - s).reshape(-1, *([1] * (pred.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class AutoencoderTrainer:
    """Static config for AE training; all methods pure."""

    autoencoder: Any  # VAE or VQVAE flax module
    flavor: str = "vae"  # 'vae' (sum/B) or 'vqvae' (weighted mean) rec reduction
    pixel_loss: str = "l1"
    perceiver: Any = None  # LPIPS module or None
    perceptual_loss_weight: float = 1.0
    embedding_loss_weight: float = 1e-6
    # the in-house family adds per-image (1-SSIM) to the pixel loss
    # (latent_embedders.py:798-800); the vendored diffusers wrappers train on
    # the plain pixel loss only (external/diffusers/vae.py:608-610, 719-721,
    # 833-834) — set False for that family.
    use_ssim: bool = True

    def perception(self, perceiver_params, pred, target, depth: int):
        """LPIPS only at pyramid depth < 2 (latent_embedders.py:791-796)."""
        if self.perceiver is None or depth >= 2:
            return 0.0
        val = self.perceiver.apply({"params": perceiver_params}, pred, target)
        return val * self.perceptual_loss_weight

    def _level_elems(self, perceiver_params, pred, target, depth: int):
        elems = (
            _pixel_elems(pred, target, self.pixel_loss)
            + self.perception(perceiver_params, pred, target, depth)
        )
        if self.use_ssim:
            elems = elems + ssim_loss_per_image(pred, target)
        return elems

    def rec_loss(self, perceiver_params, pred, pred_vertical, target):
        b = pred.shape[0]
        if self.flavor == "vae":
            loss = jnp.sum(self._level_elems(perceiver_params, pred, target, 0)) / b
            for i, pred_i in enumerate(pred_vertical):
                target_i = interpolate_nearest_exact(target, pred_i.shape[1:-1])
                loss = loss + jnp.sum(
                    self._level_elems(perceiver_params, pred_i, target_i, i + 1)
                ) / b
            return loss
        # vqvae flavor: normalized pyramid-weighted means
        weights = [1 / 2**i for i in range(1 + len(pred_vertical))]
        weights = [w / sum(weights) for w in weights]
        loss = jnp.mean(self._level_elems(perceiver_params, pred, target, 0)) * weights[0]
        for i, pred_i in enumerate(pred_vertical):
            target_i = interpolate_nearest_exact(target, pred_i.shape[1:-1])
            loss = loss + jnp.mean(
                self._level_elems(perceiver_params, pred_i, target_i, i + 1)
            ) * weights[i + 1]
        return loss

    def loss(
        self, params, perceiver_params, batch: Dict, rng
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        x = batch["source"]
        out = self.autoencoder.apply({"params": params}, x, train=True,
                                     rngs={"sample": rng, "dropout": jax.random.fold_in(rng, 1)})
        pred, pred_vertical, emb_loss = out
        loss = self.rec_loss(perceiver_params, pred, pred_vertical, x)
        loss = loss + emb_loss * self.embedding_loss_weight
        metrics = {
            "loss": loss,
            "emb_loss": emb_loss,
            "L1": jnp.mean(jnp.abs(pred - x)),
            "L2": jnp.mean((pred - x) ** 2),
            "ssim": ssim((pred + 1) / 2, (x + 1) / 2, data_range=1.0),
        }
        return loss, metrics


def make_autoencoder_train_step(trainer: AutoencoderTrainer, donate: bool = False) -> Callable:
    """Returns ``step_fn(state, perceiver_params, batch, rng) -> (state, metrics)``."""

    def step_fn(state: TrainState, perceiver_params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(trainer.loss, has_aux=True)(
            state.params, perceiver_params, batch, rng
        )
        return state.apply_gradients(grads), metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if donate else jax.jit(step_fn)
