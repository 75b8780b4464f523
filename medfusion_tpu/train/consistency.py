"""Consistency distillation (Song et al., *Consistency Models*,
arXiv:2303.01469; improved-techniques loss from arXiv:2310.14189).

BEYOND the reference: distill a trained diffusion model into a ONE-step
(or few-step) generator. Where progressive distillation
(:mod:`medfusion_tpu.train.distillation`) halves step counts stage by stage,
consistency distillation trains a single student whose *consistency
function* f(x, sigma) maps ANY point of the probability-flow ODE trajectory
straight to its x0 endpoint; sampling is then one forward (optionally a few
f/renoise alternations for quality).

Formulation (EDM/k-diffusion parameterization, matching
:meth:`DiffusionPipeline.denoise_edm`): points live in k-space
x = x0 + sigma*eps with sigma_t = sqrt((1-abar)/abar); the trained VP model
is queried at x_vp = x * c_in with fractional t from log-sigma interpolation.

* Boundary-respecting parameterization (paper eq. 5/6):
      f(x, sigma) = c_skip(sigma) x + c_out(sigma) F(x, sigma)
      c_skip = sigma_data^2 / ((sigma - sigma_min)^2 + sigma_data^2)
      c_out  = sigma_data (sigma - sigma_min) / sqrt(sigma^2 + sigma_data^2)
  so f(x, sigma_min) == x exactly, for ANY F. F is the student estimator's
  x0-prediction (objective-aware: eps/x_0/v all work).
* Training (paper Alg. 2): draw a grid index n, noise data to sigma_{n+1},
  take ONE teacher probability-flow Euler step to sigma_n, and minimize
      d( f_student(x_{n+1}, sigma_{n+1}),  f_target(x_hat_n, sigma_n) )
  with the target through stop_gradient. ``target_params`` may be an EMA of
  the student (the paper's target network) or the student itself (the
  arXiv:2310.14189 recommendation); d is squared-L2 or pseudo-Huber
  (sqrt(||.||^2 + c^2) - c, 2310.14189 eq. 10 — more robust early on).

Everything is jit-compatible (one graph per train step: teacher Euler +
student fwd + target fwd + grad) and composes with the dp/fsdp specs like
the other train steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medfusion_tpu.core import schedules as S
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train.state import TrainState


def _sigma_bounds(sched):
    sig = S.kdiff_sigmas(sched)
    return sig[0], sig[-1]


def _x0_from_model(pipeline: DiffusionPipeline, params_tree, x_k, sigma,
                   condition, guidance_scale: float = 1.0, un_cond=None):
    """The estimator's x0-prediction at a k-space point (unclipped), queried
    in VP space with a fractional timestep — identical conventions to
    :meth:`DiffusionPipeline.denoise_edm`. ``guidance_scale != 1`` uses the
    CFG-combined prediction (guided teacher)."""
    sched = pipeline.scheduler
    b = x_k.shape[0]
    c_in = 1.0 / jnp.sqrt(1.0 + sigma**2)
    t_b = jnp.broadcast_to(S.sigma_to_t_frac(sched, sigma), (b,)).astype(jnp.float32)
    x_vp = x_k * _bcast(c_in, x_k.ndim, b)
    if guidance_scale != 1.0 and condition is not None:
        pred = pipeline._guided_pred(params_tree, x_vp, t_b, condition, None,
                                     guidance_scale, un_cond)
    else:
        cond_mask = None if condition is None else jnp.ones((b,), x_k.dtype)
        pred, _ = pipeline._apply_estimator(
            params_tree, x_vp, t_b, condition, None, cond_mask)
    if pipeline.estimate_variance:
        pred, _ = jnp.split(pred, 2, axis=-1)
    s_b = _bcast(sigma, x_k.ndim, b)
    if pipeline.estimator_objective == "x_T":
        return x_k - s_b * pred
    if pipeline.estimator_objective == "v":
        return x_k / (1.0 + s_b**2) - (s_b / jnp.sqrt(1.0 + s_b**2)) * pred
    return pred


def _bcast(sigma, ndim, b):
    """Broadcast a scalar or [B] sigma to [B, 1, 1, ...]."""
    s = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
    return s.reshape(b, *([1] * (ndim - 1)))


def consistency_function(
    pipeline: DiffusionPipeline,
    params_tree,
    x_k: jnp.ndarray,
    sigma,
    condition=None,
    sigma_data: float = 0.5,
):
    """f(x, sigma) with the boundary parameterization (c_skip/c_out above):
    f(x, sigma_min) == x for any parameters."""
    sched = pipeline.scheduler
    sigma_min, _ = _sigma_bounds(sched)
    b = x_k.shape[0]
    s = _bcast(sigma, x_k.ndim, b)
    c_skip = sigma_data**2 / ((s - sigma_min) ** 2 + sigma_data**2)
    c_out = sigma_data * (s - sigma_min) / jnp.sqrt(s**2 + sigma_data**2)
    F = _x0_from_model(pipeline, params_tree, x_k, sigma, condition)
    out = c_skip * x_k + c_out * F
    return jnp.clip(out, -1.0, 1.0) if pipeline.clip_x0 else out


def make_consistency_distillation_loss(
    pipeline: DiffusionPipeline,
    n_grid: int = 18,
    rho: float = 7.0,
    sigma_data: float = 0.5,
    huber_c: Optional[float] = None,
    teacher_guidance_scale: float = 1.0,
    solver: str = "euler",
) -> Callable:
    """Returns ``loss_fn(student_params, target_params, teacher_params,
    batch, rng) -> (loss, metrics)``.

    * ``n_grid`` — discretization size N of the sigma grid (paper Alg. 2).
    * ``huber_c`` — None = squared L2; a float enables the pseudo-Huber
      metric sqrt(||.||^2 + c^2) - c (arXiv:2310.14189; c ~ 0.00054*sqrt(D)).
    * ``teacher_guidance_scale`` — CFG-combined teacher (guided consistency
      distillation; ``batch['un_cond']`` supplies negatives).
    * ``solver`` — the teacher ODE step Phi (paper Alg. 2): ``"euler"`` (one
      probability-flow Euler step) or ``"heun"`` (2nd-order Heun, the CM
      paper's experimental default following EDM — one extra teacher forward,
      but O(h^2) target bias instead of O(h), which matters on coarse Karras
      grids whose top-level gaps span tens of sigma).
    ``batch['source']`` is an x_0 in the diffusion working space (like
    :mod:`~medfusion_tpu.train.distillation`)."""
    sched = pipeline.scheduler
    if pipeline.use_self_conditioning:
        raise ValueError("consistency distillation: self-cond unsupported")
    if pipeline.clip_x0:
        raise ValueError(
            "consistency training/distillation needs clip_x0=False: clipping "
            "f breaks the boundary parameterization and zeroes gradients "
            "where |f| > 1 (common at mid/large sigma early in training)")
    if getattr(sched, "zero_terminal_snr", False) or pipeline.zero_terminal_snr:
        raise ValueError(
            "consistency distillation runs in k-space (sigma_max = inf on "
            "zero-terminal-SNR schedules); use a standard schedule")
    if n_grid < 2:
        raise ValueError("n_grid must be >= 2")
    if solver not in ("euler", "heun"):
        raise ValueError(f"solver must be 'euler' or 'heun', got {solver!r}")

    def teacher_x0(params_tree, x_k, sigma, condition, un_cond):
        return _x0_from_model(pipeline, params_tree, x_k, sigma, condition,
                              teacher_guidance_scale, un_cond)

    def loss_fn(student_params, target_params, teacher_params, batch: Dict, rng):
        x_0 = batch["source"]
        condition = batch.get("target")
        un_cond = batch.get("un_cond")
        b = x_0.shape[0]
        k_n, k_noise = jax.random.split(rng)

        sigma_min, sigma_max = _sigma_bounds(sched)
        # ascending Karras grid sigma_1..sigma_N (grid[i] below = sigma_{i+1})
        grid = S.karras_sigma_grid(sigma_min, sigma_max, n_grid, rho)[:-1][::-1]
        n = jax.random.randint(k_n, (b,), 0, n_grid - 1)
        s_lo = grid[n]        # sigma_n
        s_hi = grid[n + 1]    # sigma_{n+1}

        eps = jax.random.normal(k_noise, x_0.shape, x_0.dtype)
        x_hi = x_0 + _bcast(s_hi, x_0.ndim, b) * eps

        # one teacher probability-flow ODE step sigma_{n+1} -> sigma_n
        teacher_tree = {"noise_estimator": jax.lax.stop_gradient(teacher_params)}
        h = _bcast(s_lo - s_hi, x_0.ndim, b)
        d = (x_hi - teacher_x0(teacher_tree, x_hi, s_hi, condition, un_cond)) \
            / _bcast(s_hi, x_0.ndim, b)
        x_lo = x_hi + h * d
        if solver == "heun":
            # 2nd-order correction at (x_lo_euler, sigma_n); sigma_n >= the
            # grid's sigma_min > 0 so the slope is always well-defined
            d2 = (x_lo - teacher_x0(teacher_tree, x_lo, s_lo, condition,
                                    un_cond)) / _bcast(s_lo, x_0.ndim, b)
            x_lo = x_hi + h * 0.5 * (d + d2)

        f_student = consistency_function(
            pipeline, {"noise_estimator": student_params}, x_hi, s_hi,
            condition, sigma_data)
        f_target = consistency_function(
            pipeline, {"noise_estimator": jax.lax.stop_gradient(target_params)},
            jax.lax.stop_gradient(x_lo), s_lo, condition, sigma_data)
        f_target = jax.lax.stop_gradient(f_target)

        diff = f_student - f_target
        if huber_c is None:
            per_sample = jnp.mean(diff**2, axis=tuple(range(1, x_0.ndim)))
        else:
            sq = jnp.sum(diff**2, axis=tuple(range(1, x_0.ndim)))
            per_sample = jnp.sqrt(sq + huber_c**2) - huber_c
        loss = jnp.mean(per_sample)
        return loss, {"loss": loss,
                      "f_gap": jnp.mean(jnp.abs(diff))}

    return loss_fn


def make_consistency_train_step(
    pipeline: DiffusionPipeline,
    n_grid: int = 18,
    rho: float = 7.0,
    sigma_data: float = 0.5,
    huber_c: Optional[float] = None,
    teacher_guidance_scale: float = 1.0,
    solver: str = "euler",
    donate: bool = False,
    compute_dtype=None,
) -> Callable:
    """Returns ``step_fn(state, teacher_params, batch, rng) ->
    (state, metrics)``. The consistency target uses the student's EMA when
    the TrainState carries one (``use_ema=True`` — the paper's target
    network; the EMA update runs inside ``apply_gradients``), else the
    student itself through stop_gradient (arXiv:2310.14189's recommendation,
    which dispenses with the target EMA)."""
    if compute_dtype is not None:
        pipeline = dataclasses.replace(pipeline, compute_dtype=compute_dtype)
    base_loss = make_consistency_distillation_loss(
        pipeline, n_grid, rho, sigma_data, huber_c, teacher_guidance_scale,
        solver)

    def loss_fn(student_params, target_params, teacher_params, batch, rng):
        if compute_dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(
                lambda v: v.astype(compute_dtype), t)
            student_params, target_params, teacher_params = (
                cast(student_params), cast(target_params), cast(teacher_params))
        return base_loss(student_params, target_params, teacher_params, batch, rng)

    def step_fn(state: TrainState, teacher_params, batch: Dict, rng):
        target = state.ema_params if state.ema_params is not None else state.params
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, target, teacher_params, batch, rng)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)


def make_consistency_training_loss(
    pipeline: DiffusionPipeline,
    n_grid: int = 18,
    rho: float = 7.0,
    sigma_data: float = 0.5,
    huber_c: Optional[float] = None,
    p_mean: float = -1.1,
    p_std: float = 2.0,
) -> Callable:
    """Teacher-FREE consistency training (CT, arXiv:2303.01469 Alg. 3, with
    the arXiv:2310.14189 'improved techniques'): trains a 1-step generator
    from data alone — no pretrained diffusion model anywhere.

    Where distillation estimates the ODE step with a teacher forward, CT
    uses the unbiased trajectory estimate from the data point itself: with
    ONE shared eps, x_{n+1} = x0 + sigma_{n+1} eps and x_n = x0 + sigma_n eps
    lie on the same (estimated) trajectory, so the consistency condition is
        d( f_student(x_{n+1}, sigma_{n+1}), f_-(x_n, sigma_n) )
    with f_- the stop-gradient student (2310.14189 drops the EMA target).
    Improved-techniques pieces implemented here:

    * lognormal discretization sampling (§3.5): p(n) proportional to
      erf((ln sigma_{n+1} - P_mean)/(sqrt2 P_std)) - erf(same at sigma_n),
      P_mean=-1.1, P_std=2.0 — mass concentrates at the small-sigma levels
      that shape sample quality;
    * loss weighting lambda(n) = 1/(sigma_{n+1} - sigma_n) (§3.2);
    * pseudo-Huber metric (eq. 10) via ``huber_c`` (recommended
      c = 0.00054*sqrt(D)); squared-L2 when None.

    The discretization CURRICULUM N(k) (§3.6 doubling schedule) lives in the
    driver: ``n_grid`` is static per compiled step, so the CLI re-makes the
    step at each doubling (:func:`ct_curriculum_grid`).

    ``loss_fn(student_params, batch, rng) -> (loss, metrics)``;
    ``batch['source']`` is an x_0 in the diffusion working space."""
    sched = pipeline.scheduler
    if pipeline.use_self_conditioning:
        raise ValueError("consistency training: self-cond unsupported")
    if pipeline.clip_x0:
        raise ValueError(
            "consistency training/distillation needs clip_x0=False: clipping "
            "f breaks the boundary parameterization and zeroes gradients "
            "where |f| > 1 (common at mid/large sigma early in training)")
    if getattr(sched, "zero_terminal_snr", False) or pipeline.zero_terminal_snr:
        raise ValueError(
            "consistency training runs in k-space (sigma_max = inf on "
            "zero-terminal-SNR schedules); use a standard schedule")
    if n_grid < 2:
        raise ValueError("n_grid must be >= 2")

    sigma_min, sigma_max = _sigma_bounds(sched)
    grid = S.karras_sigma_grid(sigma_min, sigma_max, n_grid, rho)[:-1][::-1]
    # static categorical logits over the n_grid-1 adjacent (lo, hi) pairs
    # (host-side table; jax erf avoids a scipy dependency)
    g = np.asarray(grid, np.float64)
    cdf = np.asarray(jax.scipy.special.erf(
        jnp.asarray((np.log(g) - p_mean) / (np.sqrt(2.0) * p_std),
                    jnp.float32)))
    probs = np.clip(cdf[1:] - cdf[:-1], 1e-12, None)
    logits = jnp.asarray(np.log(probs / probs.sum()), jnp.float32)

    def loss_fn(student_params, batch: Dict, rng):
        x_0 = batch["source"]
        condition = batch.get("target")
        b = x_0.shape[0]
        k_n, k_noise = jax.random.split(rng)

        n = jax.random.categorical(k_n, logits, shape=(b,))
        s_lo = grid[n]
        s_hi = grid[n + 1]

        eps = jax.random.normal(k_noise, x_0.shape, x_0.dtype)
        # the SAME eps puts both points on one estimated trajectory
        x_hi = x_0 + _bcast(s_hi, x_0.ndim, b) * eps
        x_lo = x_0 + _bcast(s_lo, x_0.ndim, b) * eps

        f_student = consistency_function(
            pipeline, {"noise_estimator": student_params}, x_hi, s_hi,
            condition, sigma_data)
        f_target = consistency_function(
            pipeline,
            {"noise_estimator": jax.lax.stop_gradient(student_params)},
            x_lo, s_lo, condition, sigma_data)
        f_target = jax.lax.stop_gradient(f_target)

        diff = f_student - f_target
        if huber_c is None:
            per_sample = jnp.mean(diff**2, axis=tuple(range(1, x_0.ndim)))
        else:
            sq = jnp.sum(diff**2, axis=tuple(range(1, x_0.ndim)))
            per_sample = jnp.sqrt(sq + huber_c**2) - huber_c
        w = 1.0 / (s_hi - s_lo)  # 2310.14189 §3.2
        loss = jnp.mean(w * per_sample)
        return loss, {"loss": loss,
                      "f_gap": jnp.mean(jnp.abs(diff)),
                      "sigma_hi_mean": jnp.mean(s_hi)}

    return loss_fn


def make_consistency_training_step(
    pipeline: DiffusionPipeline,
    n_grid: int = 18,
    rho: float = 7.0,
    sigma_data: float = 0.5,
    huber_c: Optional[float] = None,
    p_mean: float = -1.1,
    p_std: float = 2.0,
    donate: bool = False,
    compute_dtype=None,
) -> Callable:
    """``step_fn(state, batch, rng) -> (state, metrics)`` for teacher-free
    consistency training (no teacher argument — compare
    :func:`make_consistency_train_step`)."""
    if compute_dtype is not None:
        pipeline = dataclasses.replace(pipeline, compute_dtype=compute_dtype)
    base_loss = make_consistency_training_loss(
        pipeline, n_grid, rho, sigma_data, huber_c, p_mean, p_std)

    def loss_fn(student_params, batch, rng):
        if compute_dtype is not None:
            student_params = jax.tree_util.tree_map(
                lambda v: v.astype(compute_dtype), student_params)
        return base_loss(student_params, batch, rng)

    def step_fn(state: TrainState, batch: Dict, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)


def ct_curriculum_grid(total_iters: int, s0: int = 10, s1: int = 1280,
                       doublings: Optional[int] = None):
    """The iCT discretization curriculum (arXiv:2310.14189 §3.6,
    N(k) = min(s0*2^k, s1) + 1): a list of ``(start_iter, n_grid)`` stages
    doubling N from ``s0+1`` and CLAMPING at ``s1+1`` (so the final stage
    always trains at the requested target discretization, even when s1 is
    not a power-of-two multiple of s0) across ``total_iters`` (each stage
    gets an equal share). ``doublings`` caps the stage count
    (smoke/testing)."""
    ns = []
    n = s0
    while True:
        ns.append(min(n, s1) + 1)
        if n >= s1:
            break
        n *= 2
    if doublings is not None:
        ns = ns[: max(1, doublings)]
    share = max(1, total_iters // len(ns))
    return [(i * share, ns[i]) for i in range(len(ns))]


def consistency_sample(
    pipeline: DiffusionPipeline,
    params_tree,
    x_T_vp: jnp.ndarray,
    rng=None,
    steps: int = 1,
    condition=None,
    sigma_data: float = 0.5,
    rho: float = 7.0,
    decode: bool = True,
):
    """One- or few-step consistency sampling (paper Alg. 1 multistep):
    f at sigma_max, then (steps-1) renoise-to-intermediate-sigma / f
    alternations over a descending Karras grid. ``x_T_vp`` is a
    standard-normal VP prior draw (same contract as the other samplers);
    ``rng`` is needed for steps > 1 (the renoise draws)."""
    if steps > 1 and rng is None:
        raise ValueError("consistency_sample: steps > 1 renoises — pass rng")
    sched = pipeline.scheduler
    sigma_min, sigma_max = _sigma_bounds(sched)
    x = x_T_vp * jnp.sqrt(1.0 + sigma_max**2)  # VP prior -> k-space
    out = consistency_function(pipeline, params_tree, x, sigma_max,
                               condition, sigma_data)
    if steps > 1:
        # steps-1 strictly-intermediate renoise levels between max and min
        grid = S.karras_sigma_grid(sigma_min, sigma_max, steps + 1, rho)[1:steps]
        for i in range(steps - 1):
            k = jax.random.fold_in(rng, i)
            s = grid[i]
            z = jax.random.normal(k, out.shape, out.dtype)
            # renoise the current estimate to sigma (above the boundary)
            s_eff = jnp.sqrt(jnp.clip(s**2 - sigma_min**2, 0.0))
            x = out + s_eff * z
            out = consistency_function(pipeline, params_tree, x, s,
                                       condition, sigma_data)
    if decode:
        out = pipeline.decode_latent(params_tree, out)
    return out
