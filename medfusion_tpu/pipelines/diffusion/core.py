"""Latent diffusion pipeline — training loss + fully-fused sampling.

Capability parity with the reference ``DiffusionPipeline``
(``/root/reference/medical_diffusion/models/pipelines/diffusion_pipeline.py:20-348``),
re-architected for TPU:

* The reference's ``denoise`` runs a host python loop with one (or two, under
  CFG) eager UNet forwards per step (:283-304). Here the ENTIRE denoise loop is
  a single ``lax.scan`` inside one jitted function — zero host round-trips,
  one compiled graph for any step count.
* Classifier-free guidance runs cond+uncond in ONE batched forward (batch-dim
  concat) instead of the reference's two sequential calls (:240-249) — better
  MXU utilization at identical math.
* The condition drop for CFG training (:122-123) and the uncond branch use a
  per-sample ``cond_mask`` that zeroes the label embedding, keeping a single
  static graph (the reference re-traces a condition=None python branch).
* RNG is functional: every random draw comes from an explicit key.

The pipeline object is static configuration; all methods are pure functions of
``(params, rng, arrays)`` and jit/pjit-compatible. ``params`` is
``{'noise_estimator': ..., 'latent_embedder': ...}`` — the latent embedder
subtree is frozen (reference: grads disabled, diffusion_pipeline.py:56-62) by
simply not including it in the optimizer; training code applies
``stop_gradient`` defensively.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule, kl_gaussians
from medfusion_tpu.nn.functional import interpolate_area
from medfusion_tpu.pipelines.diffusion.ddim import DDIMSamplerMixin
from medfusion_tpu.pipelines.diffusion.dpmpp import DPMSolverMixin
from medfusion_tpu.pipelines.diffusion.edm import EDMSamplerMixin
from medfusion_tpu.pipelines.diffusion.editing import EditingMixin
from medfusion_tpu.pipelines.diffusion.fast import FastSamplerMixin


def _l1_elt(pred, target):
    return jnp.abs(pred - target)


def _l2_elt(pred, target):
    return (pred - target) ** 2


# One elementwise definition per loss; reductions (plain mean, or the
# Min-SNR per-sample weighting) are applied at the call site so both paths
# share the same math for every entry.
_ELT_LOSSES = {"l1": _l1_elt, "l2": _l2_elt, "mse": _l2_elt}
_LOSSES = {k: (lambda f: (lambda p, t: jnp.mean(f(p, t))))(f)
           for k, f in _ELT_LOSSES.items()}
_l1 = _LOSSES["l1"]
_l2 = _LOSSES["l2"]



def gaussian_nll(pred, target, var, eps: float = 1e-6):
    """torch F.gaussian_nll_loss(reduction='none') semantics (var clamped)."""
    var = jnp.clip(var, eps)
    return 0.5 * (jnp.log(var) + (pred - target) ** 2 / var)


@dataclasses.dataclass(frozen=True)
class DiffusionPipeline(DDIMSamplerMixin, DPMSolverMixin, EDMSamplerMixin,
                        FastSamplerMixin, EditingMixin):
    """Static pipeline config. See module docstring for the design."""

    scheduler: GaussianDiffusionSchedule
    noise_estimator: Any  # flax module: (x_t, t, condition, self_cond, cond_mask) -> (y, y_ver)
    latent_embedder: Any = None  # flax module with encode/decode, or None
    estimator_objective: str = "x_T"  # 'x_T' (eps), 'x_0', or 'v' (2202.00512)
    estimate_variance: bool = False
    use_self_conditioning: bool = False
    classifier_free_guidance_dropout: float = 0.5
    do_input_centering: bool = True
    clip_x0: bool = True
    loss: str = "l1"
    # Estimator compute dtype (e.g. jnp.bfloat16 for production sampling).
    # Inputs are cast on the way into the UNet; all scheduler math stays f32.
    compute_dtype: Any = None
    # Zero-terminal-SNR mode (arXiv:2305.08891): the eps<->x_0 inversions
    # switch to forms that stay finite at abar_t = 0. Implied automatically
    # by a schedule created with zero_terminal_snr=True.
    zero_terminal_snr: bool = False
    # Min-SNR-gamma loss weighting (arXiv:2303.09556): per-sample weight
    # min(SNR_t, gamma) in the objective's native space. None = off
    # (reference behavior: uniform weighting); paper default gamma=5.0.
    min_snr_gamma: Optional[float] = None
    # Latent standardization (SD's scale_factor, generalized with a shift):
    # diffusion runs on (z - latent_shift) * latent_scale; decode inverts.
    # The reference trains on raw VAE latents (whatever scale they landed
    # at); standardizing to ~unit scale makes the N(0,1) sampling prior,
    # x0-clipping and schedule SNRs mean what they claim. Compute stats with
    # `cli/helpers latent-stats` and pass --latent-scale/--latent-shift.
    latent_scale: float = 1.0
    latent_shift: float = 0.0

    def __post_init__(self):
        if self.estimator_objective not in ("x_T", "x_0", "v"):
            raise ValueError(f"unknown estimator_objective {self.estimator_objective!r}")
        if self._terminal_safe and self.estimator_objective == "x_T":
            raise ValueError(
                "zero-terminal-SNR schedules cannot use the eps ('x_T') "
                "objective: x_0 is unrecoverable from eps at abar_T = 0 "
                "(arXiv:2305.08891 §3.1) — train with objective 'v' (or 'x_0')")

    @property
    def _terminal_safe(self) -> bool:
        """True when the abar_t=0-safe inversion forms must be used."""
        return self.zero_terminal_snr or getattr(
            self.scheduler, "zero_terminal_snr", False)

    # ------------------------------------------------------------------
    # model application helpers
    # ------------------------------------------------------------------

    def _apply_estimator(self, params, x_t, t, condition, self_cond, cond_mask,
                         with_aux: bool = False):
        """``with_aux=True`` (training forwards only) also returns the summed
        auxiliary losses the estimator sows under 'intermediates' (MoE
        load-balance + router z-loss, parallel/moe.py) — 0.0 for dense
        estimators and for duck-typed estimators (test oracles, plain
        callables) that lack flax's mutable protocol."""
        if self.compute_dtype is not None:
            x_t = x_t.astype(self.compute_dtype)
            self_cond = None if self_cond is None else self_cond.astype(self.compute_dtype)
        import flax.linen as _nn

        inter = {}
        if with_aux and isinstance(self.noise_estimator, _nn.Module):
            (y, y_ver), inter = self.noise_estimator.apply(
                {"params": params["noise_estimator"]},
                x_t, t, condition, self_cond, cond_mask,
                mutable=["intermediates"],
            )
        else:
            y, y_ver = self.noise_estimator.apply(
                {"params": params["noise_estimator"]},
                x_t, t, condition, self_cond, cond_mask,
            )
        if self.compute_dtype is not None:
            y = y.astype(jnp.float32)
            y_ver = [v.astype(jnp.float32) for v in y_ver]
        if with_aux:
            from medfusion_tpu.parallel.moe import moe_aux_loss

            return y, y_ver, moe_aux_loss(inter).astype(jnp.float32)
        return y, y_ver

    def encode_latent(self, params, x, rng):
        """Frozen latent-embedder encode (diffusion_pipeline.py:86-90),
        followed by the optional standardization (z - shift) * scale."""
        if self.latent_embedder is None:
            return x
        le_params = jax.lax.stop_gradient(params["latent_embedder"])
        if self.compute_dtype is not None:
            # frozen encoder rides the compute dtype too (it is a real chunk
            # of the train step at 256^2); the latent returns to f32 for the
            # scheduler math
            x = x.astype(self.compute_dtype)
            le_params = jax.tree_util.tree_map(
                lambda v: v.astype(self.compute_dtype), le_params)
        z = self.latent_embedder.apply(
            {"params": le_params}, x,
            method=self.latent_embedder.encode, rngs={"sample": rng},
        )
        if self.compute_dtype is not None:
            z = z.astype(jnp.float32)
        if self.latent_scale != 1.0 or self.latent_shift != 0.0:
            z = (z - self.latent_shift) * self.latent_scale
        return z

    def decode_latent(self, params, z):
        if self.latent_embedder is None:
            return z
        if self.latent_scale != 1.0 or self.latent_shift != 0.0:
            z = z / self.latent_scale + self.latent_shift
        le_params = params["latent_embedder"]
        if self.compute_dtype is not None:
            # cast the PARAMS too, not just the input: flax promotes
            # bf16-activation x f32-param convs back to f32, so without this
            # a caller that keeps master params in f32 (every product CLI;
            # bench.py pre-casts and never noticed) pays the f32 decode
            # (measured 31.3 vs 23.0 ms at B=32, tools/decode_profile.py) —
            # mirrors encode_latent above
            z = z.astype(self.compute_dtype)
            le_params = jax.tree_util.tree_map(
                lambda v: v.astype(self.compute_dtype), le_params)
        out = self.latent_embedder.apply(
            {"params": le_params}, z,
            method=self.latent_embedder.decode,
        )
        return out.astype(jnp.float32) if self.compute_dtype is not None else out

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def train_loss(
        self,
        params: Dict,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """One training-loss evaluation (reference ``_step``,
        diffusion_pipeline.py:78-229, minus host-side logging/image dumps which
        live in the train loop, not the library)."""
        sched = self.scheduler
        loss_fct = _LOSSES[self.loss]
        x_in = batch["source"]
        condition = batch.get("target")
        b = x_in.shape[0]
        k_enc, k_t, k_noise, k_cfg, k_sc = jax.random.split(rng, 5)

        x_0 = self.encode_latent(params, x_in, k_enc)
        if self.do_input_centering:
            x_0 = 2 * x_0 - 1

        t = jax.random.randint(k_t, (b,), 0, sched.T, dtype=jnp.int32)
        x_T = jax.random.normal(k_noise, x_0.shape, x_0.dtype)
        x_t = S.q_sample(sched, x_0, t, x_T)

        # Self-conditioning pre-pass, gradient-stopped (reference :109-119).
        self_cond = None
        if self.use_self_conditioning:
            pred_sc, _ = self._apply_estimator(params, x_t, t, condition, None, None)
            if self.estimate_variance:
                pred_sc, _ = jnp.split(pred_sc, 2, axis=-1)
            if self.estimator_objective == "x_T":
                self_cond = S.estimate_x_0(sched, x_t, pred_sc, t, clip=self.clip_x0)
            elif self.estimator_objective == "v":
                self_cond = S.estimate_x_0_from_v(sched, x_t, pred_sc, t, clip=self.clip_x0)
            elif self._terminal_safe:
                # x_0 objective on a zero-SNR schedule: the reference-form
                # inversion is inf/inf = NaN whenever t lands on T-1
                self_cond = S.estimate_x_T_safe(sched, x_t, pred_sc, t, clip=self.clip_x0)
            else:
                self_cond = S.estimate_x_T(sched, x_t, pred_sc, t, clip=self.clip_x0)
            self_cond = jax.lax.stop_gradient(self_cond)

        # CFG condition drop: the reference draws ONE uniform for the whole
        # batch (:122-123); same here for parity.
        cond_mask = None
        if condition is not None:
            drop = jax.random.uniform(k_cfg, ()) < self.classifier_free_guidance_dropout
            cond_mask = jnp.where(drop, 0.0, 1.0) * jnp.ones((b,), x_0.dtype)

        pred, pred_vertical, moe_aux = self._apply_estimator(
            params, x_t, t, condition, self_cond, cond_mask, with_aux=True
        )
        pred_var = None
        if self.estimate_variance:
            pred, pred_var = jnp.split(pred, 2, axis=-1)

        if self.estimator_objective == "x_T":
            target = x_T
        elif self.estimator_objective == "v":
            target = S.v_target(sched, x_0, x_T, t)
        else:
            target = x_0

        # Pyramid weights 1/2^i, normalized (reference :141-146).
        weights = [1 / 2**i for i in range(1 + len(pred_vertical))]
        weights = [w / sum(weights) for w in weights]

        if self.min_snr_gamma is not None:
            # per-sample Min-SNR weight on the main objective term
            # (arXiv:2303.09556); elementwise loss -> per-sample mean ->
            # weighted batch mean, so the scalar equals loss_fct when w == 1
            w_snr = S.min_snr_weight(sched, t, self.min_snr_gamma,
                                     self.estimator_objective)
            elt = _ELT_LOSSES[self.loss](pred, target)
            per_sample = jnp.mean(elt, axis=tuple(range(1, elt.ndim)))
            loss = jnp.mean(w_snr * per_sample) * weights[0]
        else:
            loss = loss_fct(pred, target) * weights[0]
        metrics: Dict[str, jnp.ndarray] = {}

        if self.estimate_variance:
            var_scale = (pred_var + 1) / 2  # [-1,1] -> [0,1]
            pred_logvar = S.posterior_variance(sched, t, x_t.ndim, log=True, var_scale=var_scale)
            if self.estimator_objective == "x_T":
                pred_x_0 = S.estimate_x_0(sched, x_t, x_T, t, clip=self.clip_x0)
            elif self.estimator_objective == "v":
                # mirror the eps branch's reference convention (the TRUE
                # target reconstructs x_0, diffusion_pipeline.py:160): the
                # KL then trains var_scale alone, not mean error
                pred_x_0 = S.estimate_x_0_from_v(
                    sched, x_t, target, t, clip=self.clip_x0)
            else:
                pred_x_0 = pred
            pred_mean = jax.lax.stop_gradient(S.posterior_mean(sched, x_t, pred_x_0, t))
            true_mean = jax.lax.stop_gradient(S.posterior_mean(sched, x_t, x_0, t))
            true_logvar = S.posterior_variance(sched, t, x_t.ndim, log=True, var_scale=0.0)
            red_axes = tuple(range(1, x_0.ndim))
            kl_loss = jnp.mean(
                kl_gaussians(true_mean, true_logvar, pred_mean, pred_logvar), axis=red_axes
            )
            nll_loss = jnp.mean(
                gaussian_nll(pred_x_0, x_0, jnp.exp(pred_logvar)), axis=red_axes
            )
            var_loss = jnp.mean(jnp.where(t == 0, nll_loss, kl_loss))
            loss = loss + var_loss
            metrics["variance_scale"] = jnp.mean(var_scale)
            metrics["variance_loss"] = var_loss

        for i, pred_i in enumerate(pred_vertical):
            target_i = interpolate_area(target, pred_i.shape[1:-1])
            loss = loss + loss_fct(pred_i, target_i) * weights[i + 1]

        # MoE router auxiliary losses (already weighted inside the layer;
        # 0.0 for dense estimators) — without this the router receives no
        # load-balancing gradient and routing collapses
        loss = loss + moe_aux
        metrics["moe_aux"] = moe_aux

        metrics["loss"] = loss
        metrics["L1"] = _l1(pred, target)
        metrics["L2"] = _l2(pred, target)
        return loss, metrics

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def _guided_pred(self, params, x_t, t, condition=None, self_cond=None,
                     guidance_scale: float = 1.0, un_cond=None,
                     guidance_rescale: float = 0.0):
        """One (optionally classifier-free-guided) estimator output.
        CFG runs [uncond | cond] in ONE batched forward (reference runs two
        sequential calls, diffusion_pipeline.py:240-249).

        ``guidance_rescale`` (phi in arXiv:2305.08891 §3.4): rescales the
        guided prediction's per-sample std back to the conditional
        prediction's std, then lerps — fixes the over-exposure/over-saturation
        that large guidance scales cause on zero-terminal-SNR models. 0.0
        (default) = plain CFG."""
        b = x_t.shape[0]
        if (condition is not None) and (guidance_scale != 1.0):
            x2 = jnp.concatenate([x_t, x_t], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            cond_u = un_cond if un_cond is not None else jnp.zeros_like(condition)
            cond2 = jnp.concatenate([cond_u, condition], axis=0)
            mask_u = jnp.ones((b,), x_t.dtype) if un_cond is not None else jnp.zeros((b,), x_t.dtype)
            mask2 = jnp.concatenate([mask_u, jnp.ones((b,), x_t.dtype)], axis=0)
            sc2 = None if self_cond is None else jnp.concatenate([self_cond, self_cond], axis=0)
            pred2, _ = self._apply_estimator(params, x2, t2, cond2, sc2, mask2)
            pred_uncond, pred_cond = pred2[:b], pred2[b:]
            guided = pred_uncond + guidance_scale * (pred_cond - pred_uncond)
            if guidance_rescale > 0.0:
                if self.estimate_variance:
                    # only the mean (eps) half is std-rescaled; the [-1,1]
                    # var_scale channels pass through the plain CFG lerp
                    g_eps, g_var = jnp.split(guided, 2, axis=-1)
                    c_eps, _ = jnp.split(pred_cond, 2, axis=-1)
                    g_eps = self._rescale_guided(g_eps, c_eps, guidance_rescale)
                    guided = jnp.concatenate([g_eps, g_var], axis=-1)
                else:
                    guided = self._rescale_guided(guided, pred_cond, guidance_rescale)
            return guided
        cond_mask = None if condition is None else jnp.ones((b,), x_t.dtype)
        pred, _ = self._apply_estimator(params, x_t, t, condition, self_cond, cond_mask)
        return pred

    @staticmethod
    def _rescale_guided(guided, cond, phi):
        """std-pin the guided prediction to the conditional one, lerp by phi
        (arXiv:2305.08891 eq. 15-16)."""
        axes = tuple(range(1, guided.ndim))
        std_cond = jnp.std(cond, axis=axes, keepdims=True)
        std_guided = jnp.std(guided, axis=axes, keepdims=True)
        rescaled = guided * (std_cond / jnp.clip(std_guided, 1e-8))
        return phi * rescaled + (1 - phi) * guided

    def estimate(
        self,
        params,
        x_t,
        t,
        condition=None,
        self_cond=None,
        guidance_scale: float = 1.0,
        un_cond=None,
        cold_diffusion: bool = False,
        noise=None,
        classifier_grad=None,
        classifier_scale: float = 0.0,
        guidance_rescale: float = 0.0,
    ):
        """One reverse step (reference ``forward``, diffusion_pipeline.py:232-275).

        Returns ``(x_t_prior, x_0, x_T, self_cond)``. ``noise`` is the ancestral
        step's gaussian draw (callers control RNG).

        ``classifier_grad(x_t, t) -> grad`` enables classifier guidance
        (Dhariwal & Nichol, arXiv:2105.05233 Alg. 2 — beyond the reference,
        which vendors the ``EncoderUNetModel`` classifier but never uses it):
        the eps prediction is shifted by
        ``-classifier_scale * sqrt(1 - abar_t) * grad`` before the posterior
        step, steering sampling toward ``p(x|y)``. eps-objective only.
        """
        sched = self.scheduler
        pred = self._guided_pred(params, x_t, t, condition, self_cond,
                                 guidance_scale, un_cond, guidance_rescale)

        if self.estimate_variance:
            pred, pred_var = jnp.split(pred, 2, axis=-1)
            var_scale = pred_var / 2 + 0.5
        else:
            var_scale = 0.0

        if classifier_grad is not None:
            if self.estimator_objective != "x_T":
                raise ValueError(
                    "classifier guidance shifts the eps prediction; use the "
                    "eps ('x_T') objective")
            grad = classifier_grad(x_t, t)
            shift = S.extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
            pred = pred - classifier_scale * shift * grad

        if noise is None:
            noise = jnp.zeros_like(x_t)

        return self._pred_to_states(x_t, t, pred, noise,
                                    cold_diffusion=cold_diffusion,
                                    var_scale=var_scale)

    def _pred_to_states(self, x_t, t, pred, noise, cold_diffusion=False,
                        var_scale=0.0):
        """The ONE definition of prediction post-processing shared by every
        sampler: objective-space ``pred`` -> (x_t_prior, x_0, x_T,
        new_self_cond), including the terminal-safe eps inversions
        (arXiv:2305.08891) and the cold-diffusion/learned-variance options.
        ``denoise_fast`` consumes it too, so the encoder-propagation sampler
        cannot silently diverge from ``estimate()``."""
        sched = self.scheduler
        if self.estimator_objective == "x_0":
            if cold_diffusion:
                x_t_prior, x_0 = S.cold_diffusion_step(sched, x_t, t, pred, clip=self.clip_x0)
            else:
                x_t_prior, x_0 = S.ancestral_step(
                    sched, x_t, t, pred, noise, clip=self.clip_x0, var_scale=var_scale
                )
            est_x_T = S.estimate_x_T_safe if self._terminal_safe else S.estimate_x_T
            x_T = est_x_T(sched, x_t, x_0=pred, t=t, clip=self.clip_x0)
            new_self_cond = x_T
        elif self.estimator_objective == "v":
            # convert to an x0-estimate, then share the x_0 branch's step
            x_0v = S.estimate_x_0_from_v(sched, x_t, pred, t, clip=self.clip_x0)
            if cold_diffusion:
                x_t_prior, x_0 = S.cold_diffusion_step(sched, x_t, t, x_0v, clip=self.clip_x0)
            else:
                x_t_prior, x_0 = S.ancestral_step(
                    sched, x_t, t, x_0v, noise, clip=self.clip_x0, var_scale=var_scale
                )
            if self._terminal_safe and not self.clip_x0:
                # direct v->eps (estimate_x_T_from_v): division-free, exact
                # at abar_t = 0 (arXiv:2305.08891)
                x_T = S.estimate_x_T_from_v(sched, x_t, pred, t)
            elif self._terminal_safe:
                # eps implied by the CLIPPED x_0 (reference thresholding
                # semantics), via the abar=0-safe direct form
                x_T = S.estimate_x_T_safe(sched, x_t, x_0=x_0v, t=t, clip=self.clip_x0)
            else:
                x_T = S.estimate_x_T(sched, x_t, x_0=x_0v, t=t, clip=self.clip_x0)
            new_self_cond = x_0
        else:
            if cold_diffusion:
                x_0c = S.estimate_x_0(sched, x_t, pred, t, clip=self.clip_x0)
                x_t_prior, x_0 = S.cold_diffusion_step(sched, x_t, t, x_0c, clip=self.clip_x0)
            else:
                x_t_prior, x_0 = S.ancestral_step_from_eps(
                    sched, x_t, t, pred, noise, clip=self.clip_x0, var_scale=var_scale
                )
            x_T = pred
            new_self_cond = x_0
        return x_t_prior, x_0, x_T, new_self_cond

    def sample(
        self,
        params,
        rng,
        num_samples: int,
        img_size: Tuple[int, ...],
        condition=None,
        **kwargs,
    ):
        """Noise -> images (reference ``sample``, diffusion_pipeline.py:312-317).
        ``img_size`` is the channels-last latent shape, e.g. (32, 32, 8).

        Note on ``steps``: under DDIM it is the full-range grid density; for
        the ancestral sampler (``use_ddim=False``) it TRUNCATES to the lowest
        ``steps`` noise levels (reference parity) — valid only when the
        input is pre-noised to that level, which pure noise is not. Since
        this method always starts from pure noise, a truncating ancestral
        call is rejected rather than silently denoising N(0,1) as if it sat
        at level steps-1 (``denoise`` keeps the truncation semantics for
        img2img/interpolate-style callers)."""
        if (kwargs.get("use_ddim") is False
                and kwargs.get("steps") not in (None, self.scheduler.timesteps)):
            raise ValueError(
                "sample(use_ddim=False, steps<T) would start the ancestral "
                "scan mid-schedule on PURE noise; use use_ddim=True for "
                "fewer steps, or denoise() with a pre-noised input")
        k_init, k_loop = jax.random.split(rng)
        x_T = jax.random.normal(k_init, (num_samples, *img_size))
        return self.denoise(params, x_T, k_loop, condition=condition, **kwargs)

    # ------------------------------------------------------------------
    # jit helpers
    # ------------------------------------------------------------------

    def jit_sampler(self, **static_kwargs):
        """Returns a jitted ``(params, rng, condition) -> images`` closure with
        all sampling hyperparameters baked in as compile-time constants."""

        @partial(jax.jit, static_argnames=("num_samples",))
        def run(params, rng, num_samples, condition=None):
            return self.sample(params, rng, num_samples, condition=condition, **static_kwargs)

        return run

