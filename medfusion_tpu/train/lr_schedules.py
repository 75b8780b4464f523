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
