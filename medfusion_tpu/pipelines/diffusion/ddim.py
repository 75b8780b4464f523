"""DDIM / ancestral reverse scan + RePaint inpainting op walk
(reference diffusion_pipeline.py:278-310, re-architected as ONE lax.scan).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S


def repaint_op_schedule(n: int, jump_length: int, resample_steps: int):
    """The RePaint time walk (Lugmayr et al., arXiv:2201.09865 §4.2 /
    Alg. 2 with jump schedule): after every ``jump_length`` reverse
    transitions, jump ``jump_length`` levels back up (forward renoising,
    one grid step at a time) and re-descend, ``resample_steps - 1`` extra
    times per jump point. Returns a list of ``(from_pos, to_pos)`` grid
    positions over a descending ``n``-step grid, where position ``p < n``
    is "state at grid level p" and position ``n`` is the clean state.
    ``to_pos == from_pos + 1`` is a reverse (denoising) transition;
    ``to_pos == from_pos - 1`` is a forward (renoising) step. Static —
    computed on host, consumed by one ``lax.scan``."""
    if jump_length < 1 or resample_steps < 1:
        raise ValueError("jump_length and resample_steps must be >= 1")
    if resample_steps > 1 and jump_length >= n:
        raise ValueError(
            f"jump_length={jump_length} >= grid length {n}: no jump point "
            f"exists, so the requested resampling would silently not happen "
            f"— use jump_length < steps (paper default 10 needs steps > 10)")
    ops = []
    jumps = {p: resample_steps - 1 for p in range(jump_length, n, jump_length)}
    pos = 0
    while pos < n:
        ops.append((pos, pos + 1))
        pos += 1
        if jumps.get(pos, 0) > 0:
            jumps[pos] -= 1
            for _ in range(jump_length):
                ops.append((pos, pos - 1))
                pos -= 1
    return ops

class DDIMSamplerMixin:
    """Sampler methods mixed into :class:`medfusion_tpu.pipelines.diffusion.DiffusionPipeline`
    (package split of the former single-file pipeline; the public
    API is unchanged — import from ``medfusion_tpu.pipelines.diffusion``)."""

    def denoise(
        self,
        params,
        x_t,
        rng,
        condition=None,
        steps: Optional[int] = None,
        use_ddim: bool = True,
        guidance_scale: float = 1.0,
        un_cond=None,
        eta: float = 1.0,
        decode: bool = True,
        cold_diffusion: bool = False,
        classifier_grad=None,
        classifier_scale: float = 0.0,
        guidance_rescale: float = 0.0,
        timestep_spacing: str = "linspace",
        known=None,
        mask=None,
        resample_steps: int = 1,
        jump_length: int = 1,
        start_idx: int = 0,
    ):
        """Full reverse process as ONE ``lax.scan`` (replaces the reference's
        host loop, diffusion_pipeline.py:278-310). jit-safe; ``steps``,
        ``use_ddim``, ``guidance_scale``, ``eta``, ``decode`` are static.
        ``classifier_grad``/``classifier_scale``: see :meth:`estimate` (build
        one with :func:`make_classifier_grad`). ``guidance_rescale`` /
        ``timestep_spacing='trailing'``: zero-terminal-SNR sampling fixes
        (arXiv:2305.08891, see :meth:`_guided_pred` / ``ddim_timesteps``).

        ``known``/``mask`` enable RePaint-style inpainting (Lugmayr et al.,
        arXiv:2201.09865 eq. 8, the per-step projection; beyond the
        reference): after every reverse transition the region where
        ``mask == 1`` is replaced by ``known`` forward-diffused to the state's
        noise level (exactly ``known`` on the final, clean state), so
        generation only fills ``mask == 0``. ``known`` is a latent in the
        sampler's working space (``encode_latent`` output, plus ``2x-1`` if
        ``do_input_centering``); ``mask`` broadcasts against it
        (1 = keep input, 0 = generate).

        ``resample_steps`` / ``jump_length`` enable the FULL RePaint
        resampling schedule (arXiv:2201.09865 Alg. 2 + jump schedule §4.2):
        after every ``jump_length`` reverse transitions the sampler renoises
        ``jump_length`` grid levels back up and re-descends,
        ``resample_steps - 1`` extra times per jump point — harmonizing the
        generated region with the known one. Requires ``known``/``mask``;
        the op walk is static (:func:`repaint_op_schedule`), executed as one
        ``lax.scan`` whose body ``lax.cond``-dispatches between the reverse
        transition and the cheap forward renoise (no estimator forward on
        renoise ops). ``resample_steps=1`` is the plain per-step projection.

        ``start_idx`` (static) skips the first ``start_idx`` entries of the
        descending grid — the SDEdit img2img entry point
        (:meth:`img2img` computes it from a strength and q-samples the input
        to the matching level)."""
        if (known is None) != (mask is None):
            raise ValueError("inpainting needs BOTH known and mask (or neither)")
        if (resample_steps > 1 or jump_length > 1) and known is None:
            raise ValueError(
                "RePaint resampling (resample_steps/jump_length > 1) requires "
                "known + mask")
        sched = self.scheduler
        if use_ddim:
            n = sched.timesteps if steps is None else steps
            ts = sched.ddim_timesteps(n, spacing=timestep_spacing)  # ascending, length n
        else:
            ts = sched.timesteps_array()[: (steps or sched.timesteps)]
            n = int(ts.shape[0])

        if not (0 <= start_idx < n):
            raise ValueError(f"start_idx must be in [0, {n}); got {start_idx}")
        if start_idx and resample_steps > 1:
            raise ValueError("start_idx (img2img) does not compose with the "
                             "RePaint resampling op walk")

        b = x_t.shape[0]
        ts_rev = ts[::-1]
        # t_next[i] pairs with t[i] for the DDIM re-mix; the final step has none.
        ts_next = jnp.concatenate([ts_rev[1:], jnp.zeros((1,), ts.dtype)])
        has_next = jnp.arange(n) < n - 1
        keys = jax.random.split(rng, n)
        if start_idx:
            ts_rev, ts_next = ts_rev[start_idx:], ts_next[start_idx:]
            has_next, keys = has_next[start_idx:], keys[start_idx:]

        init_self_cond = jnp.zeros_like(x_t)

        def reverse_transition(x, self_cond, t_scalar, t_next, more, k_anc, k_ddim):
            # one denoising transition t -> t_next (pre-projection)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            sc = self_cond if self.use_self_conditioning else None
            anc_noise = jax.random.normal(k_anc, x.shape, x.dtype)
            x_prior, x_0, x_T, new_sc = self.estimate(
                params, x, t_b, condition, sc,
                guidance_scale=guidance_scale, un_cond=un_cond, noise=anc_noise,
                cold_diffusion=cold_diffusion,
                classifier_grad=classifier_grad,
                classifier_scale=classifier_scale,
                guidance_rescale=guidance_rescale,
            )
            if use_ddim:
                ddim_noise = jax.random.normal(k_ddim, x.shape, x.dtype)
                x_ddim = S.ddim_step(sched, x_0, x_T, t_scalar, t_next, ddim_noise, eta)
                if timestep_spacing == "trailing":
                    # the trailing grid's smallest t is ~T/steps - 1 > 0; the
                    # final transition targets abar = 1, i.e. returns the x_0
                    # prediction ("set_alpha_to_one" DDIM convention). With
                    # linspace the grid ends at t=0 where the ancestral step
                    # already equals x_0 exactly.
                    x_final = x_0
                else:
                    x_final = x_prior
                x_new = jnp.where(more, x_ddim, x_final)
            else:
                x_new = x_prior
            return x_new, new_sc

        def project_known(x_new, t_next, more, k_known):
            # Project the known region to the new state's noise level:
            # both sampler branches leave x_new at level t_next while
            # more, and clean on the final transition (linspace ancestral
            # ends at the t=0 posterior whose std is zeroed; trailing
            # returns the x_0 prediction) — so the final projection
            # composites `known` exactly.
            t_next_b = jnp.full((b,), t_next, jnp.int32)
            known_t = S.q_sample(
                sched, known, t_next_b,
                jax.random.normal(k_known, known.shape, known.dtype))
            known_state = jnp.where(more, known_t, known)
            return mask * known_state + (1.0 - mask) * x_new

        def body(carry, inp):
            x, self_cond = carry
            t_scalar, t_next, more, key = inp
            if known is not None:
                k_anc, k_ddim, k_known = jax.random.split(key, 3)
            else:
                k_anc, k_ddim = jax.random.split(key)
            x_new, new_sc = reverse_transition(
                x, self_cond, t_scalar, t_next, more, k_anc, k_ddim)
            if known is not None:
                x_new = project_known(x_new, t_next, more, k_known)
            return (x_new, new_sc), None

        if resample_steps > 1:
            # RePaint op walk: static schedule, one scan, lax.cond between the
            # reverse transition and the (estimator-free) forward renoise.
            ops = repaint_op_schedule(n, jump_length, resample_steps)
            # descending grid, built on host (ts_rev may be a tracer under jit)
            if use_ddim:
                gd = sched.ddim_timesteps_host(n, spacing=timestep_spacing)[::-1]
            else:
                gd = np.linspace(0, sched.T - 1, sched.timesteps).astype(np.int64)[:n][::-1]
            t_a = np.empty(len(ops), np.int32)
            t_o = np.empty(len(ops), np.int32)
            is_f = np.empty(len(ops), bool)
            mor = np.empty(len(ops), bool)
            for i, (f, to) in enumerate(ops):
                fwd = to < f
                is_f[i] = fwd
                t_a[i] = gd[f]
                t_o[i] = gd[to] if to < n else 0
                mor[i] = fwd or to < n
            op_keys = jax.random.split(rng, len(ops))
            ab = sched.alphas_cumprod

            def op_body(carry, inp):
                x, self_cond = carry
                t_cur, t_to, fwd_flag, more, key = inp
                k_anc, k_ddim, k_known = jax.random.split(key, 3)

                def rev_branch(operand):
                    x, self_cond = operand
                    return reverse_transition(
                        x, self_cond, t_cur, t_to, more, k_anc, k_ddim)

                def fwd_branch(operand):
                    x, self_cond = operand
                    # one-grid-step forward renoise t_cur -> t_to (t_to > t_cur):
                    # x' = sqrt(abar_to/abar_cur) x + sqrt(1-abar_to/abar_cur) z
                    r = (S.extract(ab, jnp.full((b,), t_to, jnp.int32), x.ndim)
                         / S.extract(ab, jnp.full((b,), t_cur, jnp.int32), x.ndim))
                    z = jax.random.normal(k_anc, x.shape, x.dtype)
                    return jnp.sqrt(r) * x + jnp.sqrt(1.0 - r) * z, self_cond

                x_new, new_sc = jax.lax.cond(
                    fwd_flag, fwd_branch, rev_branch, (x, self_cond))
                x_new = project_known(x_new, t_to, more, k_known)
                return (x_new, new_sc), None

            (x_out, _), _ = jax.lax.scan(
                op_body, (x_t, init_self_cond),
                (jnp.asarray(t_a), jnp.asarray(t_o), jnp.asarray(is_f),
                 jnp.asarray(mor), op_keys))
        else:
            (x_out, _), _ = jax.lax.scan(
                body, (x_t, init_self_cond), (ts_rev, ts_next, has_next, keys))
        if decode:
            x_out = self.decode_latent(params, x_out)
        return x_out

