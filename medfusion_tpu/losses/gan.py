"""GAN discriminator losses (parity: /root/reference/medical_diffusion/loss/gan_losses.py:6-22)."""

from __future__ import annotations

import jax.numpy as jnp
import jax.nn


def exp_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(jnp.exp(-logits_real)) + jnp.mean(jnp.exp(logits_fake)))


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real)) + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )
