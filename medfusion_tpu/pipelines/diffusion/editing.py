"""Editing surface: SDEdit img2img (arXiv:2108.01073), latent
interpolation (reference diffusion_pipeline.py:320-332), RePaint-style
inpainting entry point (arXiv:2201.09865) and deterministic DDIM
inversion (arXiv:2010.02502 §4.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S


class EditingMixin:
    """Sampler methods mixed into :class:`medfusion_tpu.pipelines.diffusion.DiffusionPipeline`
    (package split of the former single-file pipeline; the public
    API is unchanged — import from ``medfusion_tpu.pipelines.diffusion``)."""

    def img2img(
        self,
        params,
        rng,
        image,
        strength: float = 0.6,
        condition=None,
        steps: Optional[int] = None,
        use_ddim: bool = True,
        timestep_spacing: str = "linspace",
        **kwargs,
    ):
        """SDEdit-style image-to-image (Meng et al., arXiv:2108.01073;
        beyond the reference): encode ``image``, forward-diffuse it to the
        grid level nearest ``strength`` (fraction of the full noising path),
        and run the tail of the ordinary reverse scan from there — so
        ``strength=1`` is a full :meth:`sample` and small strengths make
        conservative edits. ``kwargs`` are forwarded to :meth:`denoise`
        (guidance_scale, eta, decode, ...). ``image`` is a data-space
        input (it is encoded and centered exactly like training)."""
        if not (0.0 < strength <= 1.0):
            raise ValueError("strength must be in (0, 1]")
        sched = self.scheduler
        if use_ddim:
            n = sched.timesteps if steps is None else steps
            grid_desc = sched.ddim_timesteps_host(n, spacing=timestep_spacing)[::-1]
        else:
            n = steps or sched.timesteps
            grid_desc = np.asarray(sched.timesteps_array())[:n][::-1]
        k = max(1, int(round(strength * n)))
        start_idx = n - k
        t_start = int(grid_desc[start_idx])

        k_enc, k_noise, k_loop = jax.random.split(rng, 3)
        x_0 = self.encode_latent(params, image, k_enc)
        if self.do_input_centering:
            x_0 = 2 * x_0 - 1
        t_b = jnp.full(x_0.shape[:1], t_start, jnp.int32)
        x_t = S.q_sample(sched, x_0, t_b,
                         jax.random.normal(k_noise, x_0.shape, x_0.dtype))
        return self.denoise(params, x_t, k_loop, condition=condition,
                            steps=steps, use_ddim=use_ddim,
                            timestep_spacing=timestep_spacing,
                            start_idx=start_idx, **kwargs)

    def interpolate(
        self,
        params,
        rng,
        img1,
        img2,
        i: Optional[int] = None,
        condition=None,
        lam: float = 0.5,
        **kwargs,
    ):
        """Noise both latents to step i, lerp, denoise (reference
        diffusion_pipeline.py:320-332)."""
        sched = self.scheduler
        t_scalar = sched.T - 1 if i is None else i
        t = jnp.full(img1.shape[:1], t_scalar, jnp.int32)
        k1, k2, k_loop = jax.random.split(rng, 3)
        img1_t = S.q_sample(sched, img1, t, jax.random.normal(k1, img1.shape, img1.dtype))
        img2_t = S.q_sample(sched, img2, t, jax.random.normal(k2, img2.shape, img2.dtype))
        img = (1 - lam) * img1_t + lam * img2_t
        return self.denoise(params, img, k_loop, condition=condition, steps=t_scalar, **kwargs)

    def sample_inpaint(
        self,
        params,
        rng,
        known,
        mask,
        condition=None,
        **kwargs,
    ):
        """Mask-guided generation (RePaint-style, arXiv:2201.09865; beyond
        the reference): start from pure noise and :meth:`denoise` with the
        per-step known-region projection, so the output equals ``known``
        where ``mask == 1`` and is generated (consistently with it) where
        ``mask == 0``. ``known`` is a latent in the sampler's working space
        — encode images with :meth:`encode_latent` (and apply ``2x-1`` if
        ``do_input_centering``); ``mask`` broadcasts against it.

        Pass ``resample_steps=r, jump_length=j`` (kwargs, forwarded to
        :meth:`denoise`) for the full RePaint resampling schedule — the
        paper uses r=10, j=10 at T=250; r=1 is the cheap per-step
        projection."""
        k_init, k_loop = jax.random.split(rng)
        x_T = jax.random.normal(k_init, known.shape, known.dtype)
        return self.denoise(params, x_T, k_loop, condition=condition,
                            known=known, mask=mask, **kwargs)

    def invert(
        self,
        params,
        x_0,
        condition=None,
        steps: Optional[int] = None,
        guidance_scale: float = 1.0,
        un_cond=None,
        guidance_rescale: float = 0.0,
        timestep_spacing: str = "linspace",
    ):
        """Deterministic DDIM inversion (the eta=0 probability-flow update
        run in the noising direction; Song et al. arXiv:2010.02502 §4.3,
        diffusers' ``DDIMInverseScheduler`` convention of evaluating each
        transition at its lower timestep, starting from t=0 on the clean
        input). Beyond the reference, which only offers stochastic
        ``q_sample`` noising (diffusion_pipeline.py:320-332): the returned
        ``x_T`` reconstructs ``x_0`` under ``denoise(..., use_ddim=True,
        eta=0.0)`` over the SAME grid up to discretization error, enabling
        faithful reconstruction/editing and noise-space interpolation.

        ``x_0`` is a latent in the sampler's working space (see
        :meth:`sample_inpaint`). Predictions are NOT x0-clipped here —
        clipping breaks invertibility. One ``lax.scan``, jit-safe."""
        if self.use_self_conditioning:
            # denoise() carries the x0-estimate as self_cond; evaluating the
            # inversion with self_cond=None would use systematically
            # different predictions and break the round-trip silently
            raise ValueError("invert: self-conditioned pipelines unsupported")
        sched = self.scheduler
        n = sched.timesteps if steps is None else steps
        ts = sched.ddim_timesteps(n, spacing=timestep_spacing)  # ascending
        b = x_0.shape[0]
        # state entering transition i sits at level ts[i-1]; the clean input
        # is evaluated at t=0
        ts_eval = jnp.concatenate([jnp.zeros((1,), ts.dtype), ts[:-1]])

        def body(x, inp):
            t_eval, t_to = inp
            t_b = jnp.full((b,), t_eval, jnp.int32)
            pred = self._guided_pred(params, x, t_b, condition, None,
                                     guidance_scale, un_cond, guidance_rescale)
            if self.estimate_variance:
                pred, _ = jnp.split(pred, 2, axis=-1)
            if self.estimator_objective == "x_T":
                eps = pred
                x0p = S.estimate_x_0(sched, x, pred, t_b, clip=False)
            elif self.estimator_objective == "v":
                x0p = S.estimate_x_0_from_v(sched, x, pred, t_b, clip=False)
                eps = S.estimate_x_T_from_v(sched, x, pred, t_b)
            else:
                x0p = pred
                est = S.estimate_x_T_safe if self._terminal_safe else S.estimate_x_T
                eps = est(sched, x, x_0=pred, t=t_b, clip=False)
            t_to_b = jnp.full((b,), t_to, jnp.int32)
            sa = S.extract(sched.sqrt_alphas_cumprod, t_to_b, x.ndim)
            so = S.extract(sched.sqrt_one_minus_alphas_cumprod, t_to_b, x.ndim)
            return sa * x0p + so * eps, None

        x_T, _ = jax.lax.scan(body, x_0, (ts_eval, ts))
        return x_T

