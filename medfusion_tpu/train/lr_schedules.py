"""Learning-rate schedules.

``lambda_linear_schedule`` reproduces the reference's (vendored SD)
``LambdaLinearScheduler`` (``/root/reference/medical_diffusion/external/
stable_diffusion/lr_schedulers.py:3-33``) as an optax-compatible
``step -> multiplier`` schedule: per-cycle linear warmup from f_start to
f_max, then linear decay toward f_min over the cycle length."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def lambda_linear_schedule(
    warm_up_steps: Sequence[int] = (10000,),
    f_min: Sequence[float] = (1.0,),
    f_max: Sequence[float] = (1.0,),
    f_start: Sequence[float] = (1.0e-6,),
    cycle_lengths: Sequence[int] = (10_000_000_000_000,),
):
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) == len(cycle_lengths)
    cum = np.cumsum([0] + list(cycle_lengths))
    warm = np.asarray(warm_up_steps, np.float64)
    fmin = np.asarray(f_min, np.float64)
    fmax = np.asarray(f_max, np.float64)
    fstart = np.asarray(f_start, np.float64)
    cyc = np.asarray(cycle_lengths, np.float64)

    def schedule(step):
        n_global = jnp.asarray(step, jnp.float32)
        cycle = jnp.clip(
            jnp.searchsorted(jnp.asarray(cum[1:], jnp.float32), n_global, side="left"),
            0, len(cycle_lengths) - 1,
        )
        n = n_global - jnp.asarray(cum[:-1], jnp.float32)[cycle]
        w = jnp.asarray(warm, jnp.float32)[cycle]
        f_warm = (jnp.asarray(fmax, jnp.float32)[cycle] - jnp.asarray(fstart, jnp.float32)[cycle]) / w * n \
            + jnp.asarray(fstart, jnp.float32)[cycle]
        cl = jnp.asarray(cyc, jnp.float32)[cycle]
        f_decay = jnp.asarray(fmin, jnp.float32)[cycle] + (
            jnp.asarray(fmax, jnp.float32)[cycle] - jnp.asarray(fmin, jnp.float32)[cycle]
        ) * (cl - n) / cl
        return jnp.where(n < w, f_warm, f_decay)

    return schedule


def make_lr_schedule(name: str, base_lr: float, warmup_steps: int = 0,
                     total_steps: int = 100_000):
    """CLI-facing factory: ``step -> learning rate`` (an optax schedule).

    * ``"const"`` — base_lr, with optional linear warmup from 0.
    * ``"cosine"`` — linear warmup then cosine decay to 0 over total_steps.
    * ``"lambda_linear"`` — base_lr x the reference's vendored
      ``LambdaLinearScheduler`` multiplier (lr_schedulers.py:3-33) with its
      SD defaults (warmup f_start=1e-6 -> f_max=1, then flat: f_min=1,
      one effectively-infinite cycle); ``warmup_steps`` overrides the
      warmup length (reference default 10000).

    The schedule position rides optax's own step count inside the optimizer
    state, so checkpoint restore resumes the schedule where it left off.
    """
    import optax

    if name == "const":
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.constant_schedule(base_lr)
    if name == "cosine":
        warm = max(warmup_steps, 1)
        # decay_steps is the TOTAL length incl. warmup and must exceed it
        # (short smoke runs would otherwise hand optax a negative decay)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr,
            warmup_steps=warm, decay_steps=max(total_steps, warm + 1))
    if name == "lambda_linear":
        mult = lambda_linear_schedule(
            warm_up_steps=(warmup_steps or 10000,),
            f_min=(1.0,), f_max=(1.0,), f_start=(1.0e-6,),
            cycle_lengths=(10_000_000_000_000,))
        return lambda step: base_lr * mult(step)
    raise ValueError(f"unknown lr schedule {name!r}")
