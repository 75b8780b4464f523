"""EMA of model weights with crowsonkb warmup decay.

Parity: reference ``EMAModel`` (``/root/reference/medical_diffusion/utils/
train_utils.py:5-88``) — decay = 1 - (1 + step/inv_gamma)^-power clamped to
[min_value, max_value], 0 while step <= 0. Expressed as pure jnp functions so
the update lives inside the jitted train step (the reference does a host-side
state_dict copy per batch)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(
    optimization_step: jnp.ndarray,
    update_after_step: int = 0,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
    max_value: float = 0.9999,
) -> jnp.ndarray:
    step = jnp.maximum(0, optimization_step - update_after_step - 1)
    value = 1.0 - (1.0 + step / inv_gamma) ** (-power)
    value = jnp.clip(value, min_value, max_value)
    return jnp.where(step <= 0, 0.0, value)


def ema_update(ema_params, new_params, decay):
    """ema <- decay*ema + (1-decay)*new, leafwise."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, new_params
    )
