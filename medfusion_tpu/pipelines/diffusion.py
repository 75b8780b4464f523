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


def gaussian_nll(pred, target, var, eps: float = 1e-6):
    """torch F.gaussian_nll_loss(reduction='none') semantics (var clamped)."""
    var = jnp.clip(var, eps)
    return 0.5 * (jnp.log(var) + (pred - target) ** 2 / var)


@dataclasses.dataclass(frozen=True)
class DiffusionPipeline:
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
        if self.compute_dtype is not None:
            z = z.astype(self.compute_dtype)
        out = self.latent_embedder.apply(
            {"params": params["latent_embedder"]}, z,
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


def make_classifier_grad(classifier_apply, label):
    """Build the ``classifier_grad(x_t, t)`` callback for classifier-guided
    sampling (Dhariwal & Nichol, *Diffusion Models Beat GANs on Image
    Synthesis*, arXiv:2105.05233 Alg. 2).

    ``classifier_apply(x_t, t) -> [B, K]`` logits of a noisy-image classifier
    (e.g. :class:`medfusion_tpu.models.unet_openai.EncoderUNetOpenAI` — the
    vendored classifier half the reference ships but never uses,
    unet_openai.py:747-961). ``label``: [B] int targets. Returns
    ``grad(x_t, t) = d/dx_t sum_b log softmax(logits)[b, label_b]`` — the
    per-sample score of p(y|x_t) (the sum decouples across the batch).
    """

    def grad_fn(x_t, t):
        def logp(x):
            logits = classifier_apply(x, t)
            lp = jax.nn.log_softmax(logits, axis=-1)
            lab = jnp.asarray(label)[:, None]
            return jnp.sum(jnp.take_along_axis(lp, lab, axis=-1))

        return jax.grad(logp)(x_t)

    return grad_fn
