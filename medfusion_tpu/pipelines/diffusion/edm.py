"""EDM / Karras sampler (arXiv:2206.00364 Alg. 2) — beyond the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S


class EDMSamplerMixin:
    """Sampler methods mixed into :class:`medfusion_tpu.pipelines.diffusion.DiffusionPipeline`
    (package split of the former single-file pipeline; the public
    API is unchanged — import from ``medfusion_tpu.pipelines.diffusion``)."""

    def denoise_edm(
        self,
        params,
        x_t,
        rng=None,
        condition=None,
        steps: Optional[int] = None,
        guidance_scale: float = 1.0,
        un_cond=None,
        decode: bool = True,
        rho: float = 7.0,
        heun: bool = True,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        guidance_rescale: float = 0.0,
    ):
        """EDM sampler (Karras et al., *Elucidating the Design Space of
        Diffusion-Based Generative Models*, arXiv:2206.00364 Alg. 2) —
        Karras sigma grid + 2nd-order Heun + optional stochastic churn.
        Opt-in and BEYOND the reference (DDPM/DDIM only): state-of-the-art
        few-step quality, tunable between deterministic ODE (``s_churn=0``)
        and SDE-like stochastic sampling.

        The discretely-trained VP model is driven off-grid via the standard
        k-diffusion change of variables: sigma_t = sqrt((1-abar)/abar),
        x_kspace = x_vp / sqrt(abar) (so c_in = 1/sqrt(1+sigma^2)), and
        fractional timesteps from log-sigma interpolation
        (:func:`medfusion_tpu.core.schedules.sigma_to_t_frac`) — the
        sinusoidal time embedding is smooth in t. Same TPU architecture as
        the other samplers: the whole solver is ONE ``lax.scan``
        (2n-1 estimator forwards with Heun, n with ``heun=False``).

        ``x_t`` is a standard-normal VP prior draw (same contract as
        :meth:`denoise`); internally rescaled to k-space. ``rng`` is only
        consumed when ``s_churn > 0``. EDM paper defaults: rho=7, Heun;
        churn off. Works for all three objectives (eps/x_0/v).
        Self-conditioning and classifier guidance are unsupported here
        (both are defined on the integer grid)."""
        if self.use_self_conditioning:
            raise ValueError("edm sampler: self-cond unsupported")
        if s_churn > 0.0 and rng is None:
            raise ValueError("edm sampler: s_churn > 0 draws noise — pass rng")
        sched = self.scheduler
        if getattr(sched, "zero_terminal_snr", False) or self.zero_terminal_snr:
            raise ValueError(
                "edm sampler: zero-terminal-SNR schedules have sigma_max = inf "
                "in the k-diffusion parameterization; use denoise(trailing) or "
                "denoise_dpmpp(timestep_spacing='trailing') instead")
        n = sched.timesteps if steps is None else steps
        if n < 1:
            raise ValueError("edm sampler needs steps >= 1")
        b = x_t.shape[0]

        sig_tab = S.kdiff_sigmas(sched)  # ascending in t
        sigma_min, sigma_max = sig_tab[0], sig_tab[-1]
        sigmas = S.karras_sigma_grid(sigma_min, sigma_max, n, rho)  # desc, n+1

        def denoised_at(x, sigma):
            """D(x, sigma): the data prediction in k-space."""
            c_in = 1.0 / jnp.sqrt(1.0 + sigma**2)
            t_b = jnp.full((b,), S.sigma_to_t_frac(sched, sigma), jnp.float32)
            pred = self._guided_pred(params, x * c_in, t_b, condition, None,
                                     guidance_scale, un_cond, guidance_rescale)
            if self.estimate_variance:
                pred, _ = jnp.split(pred, 2, axis=-1)
            if self.estimator_objective == "x_T":
                den = x - sigma * pred
            elif self.estimator_objective == "v":
                # c_skip = 1/(1+s^2), c_out = -s/sqrt(1+s^2) (k-diffusion
                # DiscreteVDDPMDenoiser): x_0 = alpha x_vp - sigma_vp v
                den = x / (1.0 + sigma**2) - (sigma / jnp.sqrt(1.0 + sigma**2)) * pred
            else:
                den = pred  # model saw x_vp = x * c_in; x_0 is data-space
            return jnp.clip(den, -1.0, 1.0) if self.clip_x0 else den

        gamma_max = min(s_churn / n, float(np.sqrt(2.0) - 1.0))
        keys = (jax.random.split(rng, n) if s_churn > 0.0
                else jnp.zeros((n, 2), jnp.uint32))

        def body(x, inp):
            sigma, sigma_next, key = inp
            if s_churn > 0.0:
                gamma = jnp.where((sigma >= s_tmin) & (sigma <= s_tmax),
                                  gamma_max, 0.0)
                sigma_hat = sigma * (1.0 + gamma)
                z = jax.random.normal(key, x.shape, x.dtype) * s_noise
                x = x + jnp.sqrt(jnp.clip(sigma_hat**2 - sigma**2, 0.0)) * z
            else:
                sigma_hat = sigma
            d = (x - denoised_at(x, sigma_hat)) / sigma_hat
            dt = sigma_next - sigma_hat
            x_euler = x + dt * d
            if heun:
                # 2nd-order correction, skipped on the final (sigma_next=0)
                # transition (EDM Alg. 2 line 9) — lax.cond, so the final
                # step never pays the second estimator forward (2n-1 NFE)
                def correct(operand):
                    x, x_euler, d = operand
                    d2 = (x_euler - denoised_at(x_euler, sigma_next)) / sigma_next
                    return x + dt * 0.5 * (d + d2)

                x_new = jax.lax.cond(
                    sigma_next > 0, correct, lambda o: o[1], (x, x_euler, d))
            else:
                x_new = x_euler
            return x_new, None

        # VP standard-normal prior -> k-space: x_k = x_vp / sqrt(abar_max)
        # = x_vp * sqrt(1 + sigma_max^2)
        x = x_t * jnp.sqrt(1.0 + sigma_max**2)
        x_out, _ = jax.lax.scan(body, x, (sigmas[:-1], sigmas[1:], keys))
        if decode:
            x_out = self.decode_latent(params, x_out)
        return x_out

