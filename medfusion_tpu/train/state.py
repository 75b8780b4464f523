"""Train state pytrees.

Replaces the reference's Lightning module state (optimizer inside Trainer,
EMA as a module copy, global_step on the trainer) with one explicit pytree
that Orbax checkpoints atomically."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax
from flax import struct

from medfusion_tpu.train.ema import ema_decay, ema_update


@struct.dataclass
class TrainState:
    """Single-optimizer train state (diffusion UNet, plain VAE/VQVAE)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_kwargs: dict = struct.field(pytree_node=False, default_factory=dict)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema: bool = False,
               ema_kwargs: Optional[dict] = None) -> "TrainState":
        import jax

        # DEEP-copied EMA buffers: aliasing `params` would make a donated
        # train step (donate_argnums over the state) donate the same buffer
        # twice — "Attempt to donate the same buffer twice" on step 1
        ema = (jax.tree_util.tree_map(jnp.copy, params) if use_ema else None)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema,
            tx=tx,
            ema_kwargs=dict(ema_kwargs or {}),
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            decay = ema_decay(self.step, **self.ema_kwargs)
            new_ema = ema_update(self.ema_params, new_params, decay)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state, ema_params=new_ema
        )

    @property
    def inference_params(self):
        """EMA params when tracked (reference uses the averaged model for
        eval/sampling, diffusion_pipeline.py:101-104), else live params."""
        return self.ema_params if self.ema_params is not None else self.params
