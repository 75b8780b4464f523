"""Encoder-propagation DDIM sampler (Faster Diffusion, arXiv:2312.09608)
— approximate, opt-in.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S


class FastSamplerMixin:
    """Sampler methods mixed into :class:`medfusion_tpu.pipelines.diffusion.DiffusionPipeline`
    (package split of the former single-file pipeline; the public
    API is unchanged — import from ``medfusion_tpu.pipelines.diffusion``)."""

    def denoise_fast(
        self,
        params,
        x_t,
        rng,
        condition=None,
        steps: Optional[int] = None,
        guidance_scale: float = 1.0,
        un_cond=None,
        eta: float = 0.0,
        decode: bool = True,
        encoder_key_every: int = 3,
        timestep_spacing: str = "linspace",
    ):
        """Encoder-propagation DDIM sampler (Faster Diffusion, arXiv:2312.09608).

        UNet encoder features drift slowly across adjacent timesteps; at
        non-key steps the cached encoder skip stack from the last key step is
        reused and only the (time-conditioned) decoder runs — inside the same
        single ``lax.scan`` via ``lax.cond``, so the skipped encoder costs
        nothing. Approximate sampler: an opt-in speed/quality trade
        (``encoder_key_every=1`` == exact :meth:`denoise`). Requires the
        estimator to expose ``embed``/``encode_features``/``decode_features``
        (the in-house UNet does); self-conditioning unsupported here."""
        if self.use_self_conditioning:
            raise ValueError("fast sampler: self-cond unsupported")
        sched = self.scheduler
        unet = self.noise_estimator
        n = sched.timesteps if steps is None else steps
        ts = sched.ddim_timesteps(n, spacing=timestep_spacing)
        b = x_t.shape[0]
        ts_rev = ts[::-1]
        ts_next = jnp.concatenate([ts_rev[1:], jnp.zeros((1,), ts.dtype)])
        has_next = jnp.arange(n) < n - 1
        is_key = (jnp.arange(n) % encoder_key_every) == 0
        keys = jax.random.split(rng, n)

        cfg = (condition is not None) and (guidance_scale != 1.0)
        if cfg:
            cond_u = un_cond if un_cond is not None else jnp.zeros_like(condition)
            cond2 = jnp.concatenate([cond_u, condition], axis=0)
            mask_u = (jnp.ones((b,), jnp.float32) if un_cond is not None
                      else jnp.zeros((b,), jnp.float32))
            mask2 = jnp.concatenate([mask_u, jnp.ones((b,), jnp.float32)], axis=0)
        else:
            cond2 = condition
            mask2 = None if condition is None else jnp.ones((b,), jnp.float32)

        def run(method, *args):
            return unet.apply({"params": params["noise_estimator"]}, *args, method=method)

        def net_in(x):
            x = jnp.concatenate([x, x], axis=0) if cfg else x
            return x.astype(self.compute_dtype) if self.compute_dtype is not None else x

        # cache template from one abstract encoder eval
        init_skips = jax.eval_shape(
            lambda x, e: run(unet.encode_features, x, e),
            jax.ShapeDtypeStruct(net_in(x_t).shape, net_in(x_t).dtype),
            jax.eval_shape(lambda t: run(unet.embed, t, cond2, mask2),
                           jax.ShapeDtypeStruct((net_in(x_t).shape[0],), jnp.int32)),
        )
        init_cache = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), init_skips)

        def body(carry, inp):
            x, cache = carry
            t_scalar, t_next, more, key_step, key = inp
            t_b = jnp.full((net_in(x).shape[0],), t_scalar, jnp.int32)
            emb = run(unet.embed, t_b, cond2, mask2)
            xin = net_in(x)
            cache = jax.lax.cond(
                key_step,
                lambda: run(unet.encode_features, xin, emb),
                lambda: cache,
            )
            pred, _ = run(unet.decode_features, cache, emb)
            pred = pred.astype(jnp.float32)
            if cfg:
                pred = pred[:b] + guidance_scale * (pred[b:] - pred[:b])
            if self.estimate_variance:
                pred, _ = jnp.split(pred, 2, axis=-1)
            anc_noise = jax.random.normal(key, x.shape, x.dtype)
            tb = jnp.full((b,), t_scalar, jnp.int32)
            # the SAME post-processing as estimate() — shared helper, so the
            # fast sampler cannot silently diverge from the exact one
            x_prior, x_0, x_T, _ = self._pred_to_states(x, tb, pred, anc_noise)
            x_ddim = S.ddim_step(sched, x_0, x_T, t_scalar, t_next,
                                 jnp.zeros_like(x) if eta == 0.0 else anc_noise, eta)
            # trailing grids end above t=0: final transition returns the x_0
            # prediction ("set_alpha_to_one"), same as denoise()
            x_final = x_0 if timestep_spacing == "trailing" else x_prior
            x_new = jnp.where(more, x_ddim, x_final)
            return (x_new, cache), None

        (x_out, _), _ = jax.lax.scan(
            body, (x_t, init_cache), (ts_rev, ts_next, has_next, is_key, keys)
        )
        if decode:
            x_out = self.decode_latent(params, x_out)
        return x_out

