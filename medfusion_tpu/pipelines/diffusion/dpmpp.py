"""DPM-Solver++(2M) multistep sampler (arXiv:2211.01095) — beyond the
reference (DDPM/DDIM only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S


class DPMSolverMixin:
    """Sampler methods mixed into :class:`medfusion_tpu.pipelines.diffusion.DiffusionPipeline`
    (package split of the former single-file pipeline; the public
    API is unchanged — import from ``medfusion_tpu.pipelines.diffusion``)."""

    def denoise_dpmpp(
        self,
        params,
        x_t,
        rng=None,
        condition=None,
        steps: Optional[int] = None,
        guidance_scale: float = 1.0,
        un_cond=None,
        decode: bool = True,
        classifier_grad=None,
        classifier_scale: float = 0.0,
        guidance_rescale: float = 0.0,
        timestep_spacing: str = "linspace",
    ):
        """DPM-Solver++(2M) — deterministic second-order multistep sampler
        (Lu et al., arXiv:2211.01095), opt-in and BEYOND the reference (which
        ships DDPM/DDIM only): comparable sample quality at 25-50 steps
        instead of 150-250. Same TPU architecture as :meth:`denoise` — the
        whole solver is ONE ``lax.scan``; n estimator forwards for n steps
        (the final forward returns the data prediction at t=0).

        Works for all three estimator objectives (eps/x_0/v) via the
        x0-prediction formulation; ``rng`` is unused (deterministic) and
        accepted for API symmetry.
        ``classifier_grad``/``classifier_scale``: classifier
        guidance (see :meth:`estimate`) — the guided eps defines the guided
        score the solver integrates; eps-objective only.
        """
        if self.use_self_conditioning:
            raise ValueError("dpmpp sampler: self-cond unsupported")
        if classifier_grad is not None and self.estimator_objective != "x_T":
            raise ValueError(
                "classifier guidance shifts the eps prediction; use the "
                "eps ('x_T') objective")
        sched = self.scheduler
        n = sched.timesteps if steps is None else steps
        if not (2 <= n <= sched.timesteps):
            raise ValueError(
                f"DPM-Solver++(2M) needs 2 <= steps <= T={sched.timesteps}; a grid "
                f"denser than T duplicates timesteps (h=0 -> NaN in the 2M update)"
            )
        ts = sched.ddim_timesteps(n, spacing=timestep_spacing)  # ascending, length n
        ts_rev = ts[::-1]
        b = x_t.shape[0]

        ab = sched.alphas_cumprod
        lam = 0.5 * (jnp.log(ab) - jnp.log1p(-ab))  # log(alpha_t / sigma_t)
        alpha = sched.sqrt_alphas_cumprod
        sigma = sched.sqrt_one_minus_alphas_cumprod

        def x0_pred(x, t_scalar):
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            pred = self._guided_pred(params, x, t_b, condition, None,
                                     guidance_scale, un_cond, guidance_rescale)
            if self.estimate_variance:
                pred, _ = jnp.split(pred, 2, axis=-1)
            if classifier_grad is not None:
                shift = S.extract(sched.sqrt_one_minus_alphas_cumprod, t_b, x.ndim)
                pred = pred - classifier_scale * shift * classifier_grad(x, t_b)
            if self.estimator_objective == "x_T":
                return S.estimate_x_0(sched, x, pred, t_b, clip=self.clip_x0)
            if self.estimator_objective == "v":
                return S.estimate_x_0_from_v(sched, x, pred, t_b, clip=self.clip_x0)
            return jnp.clip(pred, -1.0, 1.0) if self.clip_x0 else pred

        def body(carry, inp):
            x, d_prev, h_prev, has_prev = carry
            t_cur, t_next = inp
            d = x0_pred(x, t_cur)
            h = lam[t_next] - lam[t_cur]  # > 0 (noise decreasing)
            # 2M correction: extrapolate the data prediction using the
            # previous point; first step falls back to first order (DDIM).
            h_prev_safe = jnp.where(has_prev, h_prev, h)
            r = h_prev_safe / h
            d2 = (1.0 + 1.0 / (2.0 * r)) * d - (1.0 / (2.0 * r)) * d_prev
            d_bar = jnp.where(has_prev, d2, d)
            x_new = (sigma[t_next] / sigma[t_cur]) * x \
                - alpha[t_next] * jnp.expm1(-h) * d_bar
            return (x_new, d, h, jnp.ones((), bool)), None

        init = (x_t, jnp.zeros_like(x_t), jnp.zeros(()), jnp.zeros((), bool))
        (x_out, _, _, _), _ = jax.lax.scan(body, init, (ts_rev[:-1], ts_rev[1:]))
        # Final step to zero noise: return the data prediction at the last
        # grid point (k-diffusion convention: sigma_next=0 => x = denoised).
        x_out = x0_pred(x_out, ts_rev[-1])
        if decode:
            x_out = self.decode_latent(params, x_out)
        return x_out

