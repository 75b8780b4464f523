"""Rectified-flow / flow-matching pipeline (continuous-time, ODE sampling).

BEYOND the reference (which ships DDPM/DDIM only,
``/root/reference/medical_diffusion/models/pipelines/diffusion_pipeline.py:278-310``):
a second generative family on the same estimators, data pipeline, trainers,
parallel specs and CLIs. Formulation follows conditional flow matching with
the linear (optimal-transport) path (Lipman et al., arXiv:2210.02747;
Liu et al. *Rectified Flow*, arXiv:2209.03003) in the convention of
Stable Diffusion 3 (Esser et al., arXiv:2403.03206):

* forward path  x_t = (1 - t) x_0 + t eps,  t in [0, 1]  (t=1 is pure noise)
* training target = the path velocity  u = dx_t/dt = eps - x_0
* loss = || model(x_t, t) - u ||^2, with t drawn uniform or logit-normal
  (SD3 §3.1, m=0/s=1 default)
* sampling integrates dx/dt = model(x, t) from t=1 to t=0 (Euler, or Heun
  2nd order) — a probability-flow ODE with no scheduler tables at all.
* resolution-dependent timestep shift (SD3 eq. 23):
  t' = shift * t / (1 + (shift - 1) * t), shift >= 1 spends more of the
  grid near t=1 where high-res latents still carry signal.

TPU architecture identical to :class:`DiffusionPipeline`: the whole sampler
is ONE ``lax.scan`` inside one jit (no host round trips), classifier-free
guidance runs cond+uncond in ONE batched forward via the per-sample
``cond_mask``, RNG is functional, scheduler-free math stays f32 while the
estimator may run bf16 (``compute_dtype``).

The estimator contract is unchanged — ``(x_t, t, condition, self_cond,
cond_mask) -> (y, y_ver)`` with a *float* t (the sinusoidal time embedding
is smooth; the EDM sampler already drives fractional t the same way), so
every estimator family in :mod:`medfusion_tpu.models` trains as a flow
model with zero changes. Model time input is ``t * time_scale`` (SD3 feeds
t*1000 to an embedder built for [0, 1000)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from medfusion_tpu.pipelines.diffusion import DiffusionPipeline, _ELT_LOSSES


def shift_time(t, shift: float):
    """SD3 resolution shift (arXiv:2403.03206 eq. 23): monotone [0,1]->[0,1],
    identity at shift=1; shift>1 moves mass toward t=1 (higher noise)."""
    return shift * t / (1.0 + (shift - 1.0) * t)


@dataclasses.dataclass(frozen=True)
class FlowMatchingPipeline:
    """Static flow-matching config; all methods are pure functions of
    ``(params, rng, arrays)`` and jit/pjit-compatible. ``params`` is
    ``{'noise_estimator': ..., 'latent_embedder': ...}`` exactly like
    :class:`DiffusionPipeline`, so TrainState, checkpointing, EMA, the
    parallel partition specs and the train CLIs all apply unchanged."""

    noise_estimator: Any
    latent_embedder: Any = None
    classifier_free_guidance_dropout: float = 0.5
    do_input_centering: bool = True
    loss: str = "l2"  # flow matching is an L2 regression (2210.02747 eq. 9)
    compute_dtype: Any = None
    latent_scale: float = 1.0
    latent_shift: float = 0.0
    # model time input = t * time_scale (t in [0,1]); 1000 = SD3 convention,
    # keeps the sinusoidal embedding in the range the blocks were tuned for
    time_scale: float = 1000.0
    # training-time distribution of t: 'uniform' or 'logit_normal' (SD3 §3.1)
    timestep_sampling: str = "logit_normal"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    # SD3 resolution shift, applied to BOTH the training draw and the default
    # sampling grid (1.0 = off; SD3 uses 3.0 at 1024^2)
    shift: float = 1.0

    # no learned variance in the flow family; lets us share _guided_pred-style
    # helpers written against DiffusionPipeline's field set
    estimate_variance: bool = dataclasses.field(default=False, init=False)

    def __post_init__(self):
        if self.timestep_sampling not in ("uniform", "logit_normal"):
            raise ValueError(
                f"unknown timestep_sampling {self.timestep_sampling!r}")
        if self.loss not in _ELT_LOSSES:
            raise ValueError(f"unknown loss {self.loss!r}")
        if self.shift < 1.0:
            raise ValueError("shift must be >= 1 (1 = identity)")

    # latent plumbing and estimator application are field-compatible with
    # DiffusionPipeline — reuse the exact implementations (one definition
    # of the standardization/bf16/stop-gradient semantics, not two)
    encode_latent = DiffusionPipeline.encode_latent
    decode_latent = DiffusionPipeline.decode_latent
    _apply_estimator = DiffusionPipeline._apply_estimator

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def _sample_t(self, rng, b):
        if self.timestep_sampling == "logit_normal":
            z = jax.random.normal(rng, (b,), jnp.float32)
            t = jax.nn.sigmoid(self.logit_mean + self.logit_std * z)
        else:
            t = jax.random.uniform(rng, (b,), jnp.float32)
        return shift_time(t, self.shift) if self.shift != 1.0 else t

    def train_loss(
        self,
        params: Dict,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """One conditional-flow-matching loss evaluation (2210.02747 eq. 9 /
        2403.03206 'rf' objective). Same batch contract as
        :meth:`DiffusionPipeline.train_loss` ({'source', 'target'}), so
        ``make_diffusion_train_step`` / the dp/fsdp specs work verbatim."""
        x_in = batch["source"]
        condition = batch.get("target")
        b = x_in.shape[0]
        k_enc, k_t, k_noise, k_cfg = jax.random.split(rng, 4)

        x_0 = self.encode_latent(params, x_in, k_enc)
        if self.do_input_centering:
            x_0 = 2 * x_0 - 1

        t = self._sample_t(k_t, b)
        eps = jax.random.normal(k_noise, x_0.shape, x_0.dtype)
        t_b = t.reshape((b,) + (1,) * (x_0.ndim - 1))
        x_t = (1.0 - t_b) * x_0 + t_b * eps
        target = eps - x_0

        # CFG condition drop: one uniform for the whole batch, matching the
        # diffusion family (reference diffusion_pipeline.py:122-123)
        cond_mask = None
        if condition is not None:
            drop = (jax.random.uniform(k_cfg, ())
                    < self.classifier_free_guidance_dropout)
            cond_mask = jnp.where(drop, 0.0, 1.0) * jnp.ones((b,), x_0.dtype)

        pred, pred_vertical, moe_aux = self._apply_estimator(
            params, x_t, t * self.time_scale, condition, None, cond_mask,
            with_aux=True)

        elt = _ELT_LOSSES[self.loss]
        loss = jnp.mean(elt(pred, target)) + moe_aux
        # deep-supervision heads are meaningless for a velocity target at
        # reduced resolution only in principle — keep the pyramid consistent
        # with the diffusion family (1/2^i weights) if the estimator has them
        if pred_vertical:
            from medfusion_tpu.nn.functional import interpolate_area

            weights = [1 / 2 ** i for i in range(1 + len(pred_vertical))]
            weights = [w / sum(weights) for w in weights]
            loss = loss * weights[0]
            for i, pred_i in enumerate(pred_vertical):
                target_i = interpolate_area(target, pred_i.shape[1:-1])
                loss = loss + jnp.mean(elt(pred_i, target_i)) * weights[i + 1]

        metrics = {"loss": loss,
                   "L2": jnp.mean((pred - target) ** 2),
                   "moe_aux": moe_aux}
        return loss, metrics

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def _velocity(self, params, x, t_scalar, condition, guidance_scale,
                  un_cond):
        """One (optionally CFG-batched) velocity evaluation at scalar t."""
        b = x.shape[0]
        t_b = jnp.full((b,), t_scalar, jnp.float32) * self.time_scale
        if (condition is not None) and (guidance_scale != 1.0):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t_b, t_b], axis=0)
            cond_u = un_cond if un_cond is not None else jnp.zeros_like(condition)
            cond2 = jnp.concatenate([cond_u, condition], axis=0)
            mask_u = (jnp.ones((b,), x.dtype) if un_cond is not None
                      else jnp.zeros((b,), x.dtype))
            mask2 = jnp.concatenate([mask_u, jnp.ones((b,), x.dtype)], axis=0)
            pred2, _ = self._apply_estimator(params, x2, t2, cond2, None, mask2)
            pred_u, pred_c = pred2[:b], pred2[b:]
            return pred_u + guidance_scale * (pred_c - pred_u)
        cond_mask = None if condition is None else jnp.ones((b,), x.dtype)
        pred, _ = self._apply_estimator(params, x, t_b, condition, None,
                                        cond_mask)
        return pred

    def denoise(
        self,
        params,
        x_t,
        rng=None,
        condition=None,
        steps: int = 25,
        guidance_scale: float = 1.0,
        un_cond=None,
        decode: bool = True,
        heun: bool = True,
        shift: Optional[float] = None,
        t_start: float = 1.0,
        known=None,
        mask=None,
        resample_steps: int = 1,
    ):
        """Integrate the probability-flow ODE from ``t_start`` down to 0 as
        ONE ``lax.scan``. ``heun=True``: 2nd-order Heun with the final
        correction skipped via ``lax.cond`` (2*steps - 1 estimator forwards,
        the EDM trick); ``heun=False``: Euler (steps forwards). ``shift``
        overrides the pipeline's grid shift at sampling time (SD3 tunes it
        per resolution). ``t_start < 1`` starts mid-path for img2img — the
        caller supplies ``x_t`` noised to that level.

        ``known``/``mask`` enable RePaint-style inpainting on the flow path
        (family parity with :meth:`DiffusionPipeline.denoise`): after every
        ODE step the region where ``mask == 1`` is replaced by ``known``
        placed on the linear forward path at the new level
        (``(1-t) known + t eps``, fresh eps per step; exactly ``known`` at
        the final t=0 state). ``known`` is a latent in the sampler's working
        space (``encode_latent`` output, plus ``2x-1`` if
        ``do_input_centering``); ``mask`` broadcasts (1 = keep, 0 =
        generate). Requires ``rng`` (the ODE itself stays deterministic;
        only the projections draw noise).

        ``resample_steps = r > 1`` is the RePaint harmonization analog
        (arXiv:2201.09865 Alg. 2 with jump length = one grid step): each
        transition is re-done r times, renoising t_next -> t_cur between
        repeats with the marginal-preserving flow renoise
        ``x_up = ((1-u)/(1-s)) x + b eps`` (b chosen so the noise std is u
        on the linear path). Estimator cost multiplies by r.

        ``rng`` is otherwise unused (deterministic ODE); accepted for API
        symmetry with the diffusion samplers."""
        if not (0.0 < t_start <= 1.0):
            raise ValueError("t_start must be in (0, 1]")
        if (known is None) != (mask is None):
            raise ValueError("inpainting needs BOTH known and mask (or neither)")
        if resample_steps < 1:
            raise ValueError("resample_steps must be >= 1")
        if resample_steps > 1 and known is None:
            raise ValueError("resample_steps > 1 requires known + mask")
        if known is not None and rng is None:
            raise ValueError("inpainting draws projection noise: pass rng")
        sh = self.shift if shift is None else shift
        # grid in *unshifted* time, then warped; t_start is given in the
        # shifted (physical) time the caller noised to, so un-warp it first
        if sh != 1.0:
            u_start = t_start / (sh - sh * t_start + t_start)  # shift_time^-1
        else:
            u_start = t_start
        u = jnp.linspace(u_start, 0.0, steps + 1)
        ts = shift_time(u, sh) if sh != 1.0 else u

        n = steps
        is_last = jnp.arange(n) == n - 1
        keys = (jax.random.split(rng, n) if known is not None
                else jnp.zeros((n, 2), jnp.uint32))

        def transition(x, t_cur, t_next, last):
            dt = t_next - t_cur  # negative
            v1 = self._velocity(params, x, t_cur, condition, guidance_scale,
                                un_cond)
            x_euler = x + dt * v1

            def heun_correct(x_e):
                v2 = self._velocity(params, x_e, t_next, condition,
                                    guidance_scale, un_cond)
                return x + dt * 0.5 * (v1 + v2)

            if heun:
                # final step: Euler (the correction would query t=0 for a
                # half-weight term — the EDM final-step convention)
                return jax.lax.cond(last, lambda xe: xe, heun_correct, x_euler)
            return x_euler

        def project_known(x, t_next, key):
            eps = jax.random.normal(key, known.shape, known.dtype)
            known_t = (1.0 - t_next) * known + t_next * eps
            return mask * known_t + (1.0 - mask) * x

        def renoise(x, t_lo, t_hi, key):
            # marginal-preserving move UP the linear path t_lo -> t_hi:
            # scale the state so the clean component lands at (1-t_hi) and
            # top up the noise std from (1-t_hi)/(1-t_lo)*t_lo to t_hi
            a = (1.0 - t_hi) / (1.0 - t_lo)
            b = jnp.sqrt(jnp.maximum(t_hi ** 2 - (a * t_lo) ** 2, 0.0))
            return a * x + b * jax.random.normal(key, x.shape, x.dtype)

        def body(x, inp):
            t_cur, t_next, last, key = inp
            if known is None:
                return transition(x, t_cur, t_next, last), None
            for r in range(resample_steps):  # static unroll (opt-in, small)
                k_proj, k_re, key = jax.random.split(key, 3)
                x = transition(x, t_cur, t_next, last)
                x = project_known(x, t_next, k_proj)
                if r < resample_steps - 1:
                    x = renoise(x, t_next, t_cur, k_re)
            return x, None

        x_out, _ = jax.lax.scan(body, x_t, (ts[:-1], ts[1:], is_last, keys))
        if decode:
            x_out = self.decode_latent(params, x_out)
        return x_out

    def sample(
        self,
        params,
        rng,
        num_samples: int,
        latent_shape,
        condition=None,
        steps: int = 25,
        guidance_scale: float = 1.0,
        un_cond=None,
        decode: bool = True,
        heun: bool = True,
        shift: Optional[float] = None,
    ):
        """Draw ``num_samples`` from pure noise (t=1). Same signature shape
        as :meth:`DiffusionPipeline.sample` so CLIs/serving swap families
        with one flag."""
        x_T = jax.random.normal(rng, (num_samples, *latent_shape), jnp.float32)
        return self.denoise(params, x_T, None, condition=condition,
                            steps=steps, guidance_scale=guidance_scale,
                            un_cond=un_cond, decode=decode, heun=heun,
                            shift=shift)

    def img2img(
        self,
        params,
        rng,
        image,
        strength: float = 0.6,
        condition=None,
        steps: int = 25,
        guidance_scale: float = 1.0,
        un_cond=None,
        decode: bool = True,
        heun: bool = True,
        shift: Optional[float] = None,
    ):
        """SDEdit-style image-to-image (Meng et al., arXiv:2108.01073) on the
        flow path: encode, jump to t=strength on the straight path
        (x_t = (1-t) x0 + t eps), integrate down. strength=1 is a full
        sample; ->0 returns the input."""
        if not (0.0 < strength <= 1.0):
            raise ValueError("strength must be in (0, 1]")
        k_enc, k_noise = jax.random.split(rng)
        x_0 = self.encode_latent(params, image, k_enc)
        if self.do_input_centering:
            x_0 = 2 * x_0 - 1
        eps = jax.random.normal(k_noise, x_0.shape, x_0.dtype)
        x_t = (1.0 - strength) * x_0 + strength * eps
        return self.denoise(params, x_t, None, condition=condition,
                            steps=steps, guidance_scale=guidance_scale,
                            un_cond=un_cond, decode=decode, heun=heun,
                            shift=shift, t_start=strength)

    def sample_inpaint(
        self,
        params,
        rng,
        known,
        mask,
        condition=None,
        **kwargs,
    ):
        """Mask-guided generation on the flow path (family parity with
        :meth:`DiffusionPipeline.sample_inpaint`, RePaint-style
        arXiv:2201.09865): start from pure noise and :meth:`denoise` with the
        per-step known-region projection, so the output equals ``known``
        where ``mask == 1`` and is generated (consistently with it) where
        ``mask == 0``. ``known`` is a latent in the sampler's working space —
        encode images with :meth:`encode_latent` (and apply ``2x-1`` if
        ``do_input_centering``); ``mask`` broadcasts against it. Forward
        ``resample_steps=r`` for the harmonization analog."""
        k_init, k_loop = jax.random.split(rng)
        x_T = jax.random.normal(k_init, known.shape, known.dtype)
        return self.denoise(params, x_T, k_loop, condition=condition,
                            known=known, mask=mask, **kwargs)

    def invert(
        self,
        params,
        x_0,
        condition=None,
        steps: int = 25,
        guidance_scale: float = 1.0,
        un_cond=None,
        heun: bool = True,
        shift: Optional[float] = None,
    ):
        """Deterministic ODE inversion: integrate dx/dt = v(x, t) FORWARD
        from t=0 (clean latent) to t=1 (noise) over the same shifted grid
        :meth:`denoise` descends — the flow-family analog of
        :meth:`DiffusionPipeline.invert` (family parity; the probability-flow
        ODE is time-symmetric, so inversion is just the reverse sweep).

        Integrator is the exact time-mirror of :meth:`denoise`: every
        velocity query happens at the HIGHER-t endpoint of its interval
        (descending Euler evaluates at t_cur; ascending Euler therefore at
        t_next), Heun's symmetric average is used on every step except the
        one touching t=0 — going down that's the final step, going up the
        first — so t=0 is never queried in either direction, NFE matches
        (2*steps - 1 Heun / steps Euler), and for any x-independent velocity
        field the up and down sweeps cancel exactly (pinned by the oracle
        roundtrip test). ``x_0`` is a latent in the sampler's working space
        (see :meth:`sample_inpaint`). One ``lax.scan``, jit-safe."""
        sh = self.shift if shift is None else shift
        u = jnp.linspace(0.0, 1.0, steps + 1)
        ts = shift_time(u, sh) if sh != 1.0 else u
        n = steps
        is_first = jnp.arange(n) == 0

        def body(x, inp):
            t_cur, t_next, first = inp
            dt = t_next - t_cur  # positive
            # Euler steps mirror the descending convention (evaluate at the
            # higher t of the interval => t_next going up); Heun's v1 is the
            # standard lower-endpoint slope on non-first steps
            t_eval = jnp.where(first, t_next, t_cur) if heun else t_next
            v1 = self._velocity(params, x, t_eval, condition, guidance_scale,
                                un_cond)
            x_euler = x + dt * v1

            def heun_correct(x_e):
                v2 = self._velocity(params, x_e, t_next, condition,
                                    guidance_scale, un_cond)
                return x + dt * 0.5 * (v1 + v2)

            if heun:
                x_new = jax.lax.cond(first, lambda xe: xe, heun_correct,
                                     x_euler)
            else:
                x_new = x_euler
            return x_new, None

        x_T, _ = jax.lax.scan(body, x_0, (ts[:-1], ts[1:], is_first))
        return x_T

    def interpolate(
        self,
        params,
        rng,
        img1,
        img2,
        strength: float = 1.0,
        condition=None,
        lam: float = 0.5,
        ode_invert: bool = False,
        **kwargs,
    ):
        """Latent interpolation, family parity with
        :meth:`DiffusionPipeline.interpolate` (reference
        diffusion_pipeline.py:320-332). Default mode mirrors the reference
        semantics on the flow path: place both latents at ``t = strength``
        on the linear forward path (fresh noise each), lerp with ``lam``,
        integrate down from there. ``ode_invert=True`` uses the
        deterministic :meth:`invert` to carry each input to t=1 and SLERPs
        in noise space (endpoints then reconstruct the inputs faithfully) —
        the analog of the diffusion family's ``--ddim-invert`` mode.
        ``img1``/``img2`` are latents in the sampler's working space."""
        if not (0.0 < strength <= 1.0):
            raise ValueError("strength must be in (0, 1]")
        steps = kwargs.get("steps", 25)
        if ode_invert:
            z1 = self.invert(params, img1, condition=condition, steps=steps,
                             heun=kwargs.get("heun", True),
                             shift=kwargs.get("shift"))
            z2 = self.invert(params, img2, condition=condition, steps=steps,
                             heun=kwargs.get("heun", True),
                             shift=kwargs.get("shift"))
            # per-sample slerp: noise-space interpolation keeps the radius a
            # Gaussian sample would have (lerp shrinks it by up to sqrt(2))
            b = z1.shape[0]
            f1, f2 = z1.reshape(b, -1), z2.reshape(b, -1)
            dot = jnp.sum(f1 * f2, axis=-1) / jnp.maximum(
                jnp.linalg.norm(f1, axis=-1) * jnp.linalg.norm(f2, axis=-1),
                1e-12)
            omega = jnp.arccos(jnp.clip(dot, -1.0 + 1e-7, 1.0 - 1e-7))
            omega = omega.reshape((b,) + (1,) * (z1.ndim - 1))
            so = jnp.sin(omega)
            z = (jnp.sin((1 - lam) * omega) / so) * z1 + \
                (jnp.sin(lam * omega) / so) * z2
            return self.denoise(params, z, rng, condition=condition, **kwargs)
        k1, k2, k_loop = jax.random.split(rng, 3)
        e1 = jax.random.normal(k1, img1.shape, img1.dtype)
        e2 = jax.random.normal(k2, img2.shape, img2.dtype)
        x1 = (1.0 - strength) * img1 + strength * e1
        x2 = (1.0 - strength) * img2 + strength * e2
        x = (1 - lam) * x1 + lam * x2
        return self.denoise(params, x, k_loop, condition=condition,
                            t_start=strength, **kwargs)

    def jit_sampler(self, **static_kwargs):
        """Jitted closure over :meth:`sample` with static config baked in
        (mirror of :meth:`DiffusionPipeline.jit_sampler`)."""
        from functools import partial

        def fn(params, rng, num_samples, latent_shape, condition=None,
               un_cond=None):
            return self.sample(params, rng, num_samples, latent_shape,
                               condition=condition, un_cond=un_cond,
                               **static_kwargs)

        return jax.jit(fn, static_argnums=(2, 3))
