"""Progressive distillation (Salimans & Ho, arXiv:2202.00512).

BEYOND the reference (which samples with 150-250 step DDIM only): distill a
trained diffusion model into a student that needs HALF the sampling steps,
repeatedly — 1-4 step samplers after a few stages. Builds on the v-prediction
objective this framework already ships (the paper's recommended student
parameterization: eps-parameterized students degenerate as step counts
shrink, §4/App. G).

The discrete-time adaptation of the paper's Algorithm 2:

* The student targets an ``N``-step sampler over the schedule's ``T`` grid
  points: student signal levels t_i = round(i*T/N) - 1, i in {1..N}.
* Draw i ~ U{1..N}, noise the data to z_t at t = t_i, run the TEACHER two
  deterministic DDIM (eta=0) half-steps t -> t_mid -> t_end
  (t_mid = round((i-.5)*T/N)-1, t_end = t_{i-1}; t_0 = -1 means fully clean,
  alpha=1/sigma=0).
* The one-step target is the x-prediction a single student DDIM step from
  z_t must make to land exactly on the teacher's z_end (paper eq. 9):
      x~ = (z_end - (sigma_end/sigma_t) z_t) / (alpha_end - (sigma_end/sigma_t) alpha_t)
* Loss: truncated-SNR-weighted x-space MSE (paper App. E):
      w(t) ||x~ - x_hat_student(z_t)||^2,   w(t) = max(alpha_t^2/sigma_t^2, 1)

Every stage is one jitted train step (teacher rollout + student grad in a
single graph, no host round-trips); stages chain by promoting the student to
teacher and halving N (:func:`next_stage_steps`). TPU notes: the teacher's
two forwards and the student's one share the compiled UNet program; the
whole loss is jit/pjit-compatible and composes with the dp/fsdp parallel
specs exactly like ``make_diffusion_train_step``.
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


def _alpha_sigma(sched, t, ndim):
    """(alpha, sigma) = (sqrt(abar_t), sqrt(1-abar_t)) with the t = -1
    convention alpha=1, sigma=0 (the fully-clean terminal of the student
    grid)."""
    tc = jnp.clip(t, 0)
    a = S.extract(sched.sqrt_alphas_cumprod, tc, ndim)
    s = S.extract(sched.sqrt_one_minus_alphas_cumprod, tc, ndim)
    neg = (t < 0).reshape(-1, *([1] * (ndim - 1)))
    return jnp.where(neg, 1.0, a), jnp.where(neg, 0.0, s)


def _x0_eps(pipeline: DiffusionPipeline, params_tree, z, t, condition,
            guidance_scale: float = 1.0, un_cond=None):
    """One estimator forward -> (x0, eps), unclipped (clipping breaks the
    algebra of the distillation target). ``guidance_scale != 1`` runs the
    batched-CFG combined prediction — the guided-distillation teacher
    (Meng et al., arXiv:2210.03142, at a FIXED guidance weight: the student
    absorbs the two-forward CFG teacher into one conditional forward)."""
    if guidance_scale != 1.0 and condition is not None:
        pred = pipeline._guided_pred(params_tree, z, t, condition, None,
                                     guidance_scale, un_cond)
        if pipeline.estimate_variance:
            pred, _ = jnp.split(pred, 2, axis=-1)
    else:
        b = z.shape[0]
        cond_mask = None if condition is None else jnp.ones((b,), z.dtype)
        pred, _ = pipeline._apply_estimator(params_tree, z, t, condition, None, cond_mask)
        if pipeline.estimate_variance:
            pred, _ = jnp.split(pred, 2, axis=-1)
    sched = pipeline.scheduler
    if pipeline.estimator_objective == "x_T":
        x0 = S.estimate_x_0(sched, z, pred, t, clip=False)
        eps = pred
    elif pipeline.estimator_objective == "v":
        x0 = S.estimate_x_0_from_v(sched, z, pred, t, clip=False)
        eps = S.estimate_x_T_from_v(sched, z, pred, t)
    else:
        x0 = pred
        eps = S.estimate_x_T_safe(sched, z, x_0=pred, t=t, clip=False)
    return x0, eps


def _ddim_to(pipeline, params_tree, z, t_from, t_to, condition,
             guidance_scale: float = 1.0, un_cond=None):
    """One deterministic DDIM (eta=0) transition evaluated at t_from:
    z_to = alpha_to x0 + sigma_to eps."""
    x0, eps = _x0_eps(pipeline, params_tree, z, t_from, condition,
                      guidance_scale, un_cond)
    a_to, s_to = _alpha_sigma(pipeline.scheduler, t_to, z.ndim)
    return a_to * x0 + s_to * eps


def student_timestep_grid(T: int, student_steps: int):
    """The three per-draw timesteps as functions of i in {1..N}:
    (t_i, t_mid, t_end) int32 arrays given an int i array.

    Built as HOST float64 tables gathered under trace — a traced float32
    ``jnp.round(i * (T/N))`` rounds exact-.5 products to the other side than
    the float64 host grid for some (T, N) (e.g. T=1000, N=208/240/304),
    which would train the student one step off the grid it samples on. The
    t table is bit-identical to ``ddim_timesteps_host(N, 'trailing')`` by
    construction (the sampling contract of ``student_sample_timesteps``)."""
    i_host = np.arange(1, student_steps + 1, dtype=np.float64)
    t_tab = jnp.asarray(np.round(i_host * (T / student_steps)) - 1, jnp.int32)
    t_mid_tab = jnp.asarray(
        np.round((i_host - 0.5) * (T / student_steps)) - 1, jnp.int32)
    # t_end[i] = t[i-1]; i=1 -> -1 (the fully-clean terminal convention)
    t_end_tab = jnp.concatenate(
        [jnp.asarray([-1], jnp.int32), t_tab[:-1]])

    def grid(i):
        idx = i.astype(jnp.int32) - 1
        return t_tab[idx], t_mid_tab[idx], t_end_tab[idx]

    return grid


def distillation_targets(
    pipeline: DiffusionPipeline,
    teacher_params_tree,
    x_0: jnp.ndarray,
    i: jnp.ndarray,
    noise: jnp.ndarray,
    student_steps: int,
    condition=None,
    teacher_guidance_scale: float = 1.0,
    un_cond=None,
):
    """(z_t, t, x_tilde, w) for one batch: noise to the student level, run
    the teacher two half-steps, solve for the one-step x-target (paper
    eq. 9) and the truncated-SNR weight. ``teacher_guidance_scale != 1``
    makes the teacher the CFG-combined prediction (guided distillation at a
    fixed weight, arXiv:2210.03142): the student then does with ONE forward
    what the guided teacher needs 2 (CFG) x 2 (steps) for."""
    sched = pipeline.scheduler
    grid = student_timestep_grid(sched.T, student_steps)
    t, t_mid, t_end = grid(i)

    z_t = S.q_sample(sched, x_0, t, noise)
    z_mid = _ddim_to(pipeline, teacher_params_tree, z_t, t, t_mid, condition,
                     teacher_guidance_scale, un_cond)
    z_end = _ddim_to(pipeline, teacher_params_tree, z_mid, t_mid, t_end, condition,
                     teacher_guidance_scale, un_cond)

    a_t, s_t = _alpha_sigma(sched, t, x_0.ndim)
    a_e, s_e = _alpha_sigma(sched, t_end, x_0.ndim)
    ratio = s_e / s_t  # s_t > 0: t >= round(T/N)-1 >= 1 for N <= T//2
    x_tilde = (z_end - ratio * z_t) / (a_e - ratio * a_t)
    w = jnp.maximum((a_t / s_t) ** 2, 1.0)  # truncated SNR (App. E)
    return z_t, t, x_tilde, w


def make_distillation_loss(
    pipeline: DiffusionPipeline,
    student_steps: int,
    teacher_guidance_scale: float = 1.0,
) -> Callable:
    """Returns ``loss_fn(student_est_params, teacher_est_params, batch, rng)
    -> (loss, metrics)``. ``batch['source']`` is a LATENT (or pixel) x_0 in
    the diffusion working space — encode + center upstream; this keeps the
    frozen-VAE encode out of the distillation graph, where the teacher
    already costs two forwards.

    ``teacher_guidance_scale``: fixed-weight guided distillation
    (arXiv:2210.03142) — the teacher rollout uses the CFG-combined
    prediction (``batch['un_cond']`` optionally supplies the negative
    labels, reference convention 1-label); the student learns the GUIDED
    map, so guided sampling of the student needs guidance_scale=1."""
    sched = pipeline.scheduler
    if not (1 <= student_steps <= sched.T // 2):
        raise ValueError(
            f"student_steps must be in [1, T//2={sched.T // 2}]: the teacher "
            f"takes two half-steps per student step on the T={sched.T} grid")
    if pipeline.use_self_conditioning:
        raise ValueError("distillation: self-conditioning unsupported")
    if pipeline.estimate_variance:
        raise ValueError("distillation: learned-variance estimators unsupported")

    def loss_fn(student_params, teacher_params, batch: Dict, rng):
        x_0 = batch["source"]
        condition = batch.get("target")
        b = x_0.shape[0]
        k_i, k_noise = jax.random.split(rng)
        i = jax.random.randint(k_i, (b,), 1, student_steps + 1)
        noise = jax.random.normal(k_noise, x_0.shape, x_0.dtype)

        teacher_tree = {"noise_estimator": jax.lax.stop_gradient(teacher_params)}
        z_t, t, x_tilde, w = distillation_targets(
            pipeline, teacher_tree, x_0, i, noise, student_steps, condition,
            teacher_guidance_scale, batch.get("un_cond"))
        x_tilde = jax.lax.stop_gradient(x_tilde)

        student_tree = {"noise_estimator": student_params}
        x_hat, _ = _x0_eps(pipeline, student_tree, z_t, t, condition)
        per_sample = jnp.mean((x_tilde - x_hat) ** 2,
                              axis=tuple(range(1, x_0.ndim)))
        loss = jnp.mean(w.reshape(-1) * per_sample)
        metrics = {"loss": loss,
                   "x_mse": jnp.mean(per_sample),
                   "weight_mean": jnp.mean(w)}
        return loss, metrics

    return loss_fn


def make_distillation_train_step(
    pipeline: DiffusionPipeline,
    student_steps: int,
    donate: bool = False,
    compute_dtype=None,
    teacher_guidance_scale: float = 1.0,
) -> Callable:
    """Returns ``step_fn(state, teacher_params, batch, rng) ->
    (state, metrics)`` — same shape as ``make_diffusion_train_step`` with the
    frozen teacher subtree in place of the latent embedder. ``compute_dtype``
    = bf16 runs teacher+student forwards and the backward in bf16 with f32
    master weights (same recipe as the diffusion step)."""
    if compute_dtype is not None:
        pipeline = dataclasses.replace(pipeline, compute_dtype=compute_dtype)
    base_loss = make_distillation_loss(pipeline, student_steps,
                                       teacher_guidance_scale)

    def loss_fn(student_params, teacher_params, batch, rng):
        if compute_dtype is not None:
            student_params = jax.tree_util.tree_map(
                lambda v: v.astype(compute_dtype), student_params)
            teacher_params = jax.tree_util.tree_map(
                lambda v: v.astype(compute_dtype), teacher_params)
        return base_loss(student_params, teacher_params, batch, rng)

    def step_fn(state: TrainState, teacher_params, batch: Dict, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch, rng)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)


def next_stage_steps(student_steps: int) -> Optional[int]:
    """The next halving, or None when the 1-step student is reached."""
    return None if student_steps <= 1 else max(1, student_steps // 2)


def student_sample_timesteps(sched, student_steps: int) -> jnp.ndarray:
    """The ascending DDIM grid a distilled N-step student was trained for:
    t_i = round(i*T/N) - 1 for i in {1..N}. This is bit-identical to the
    sampler's ``timestep_spacing='trailing'`` grid (``ddim_timesteps_host``
    builds the SAME index-multiply expression), so a distilled student
    samples with ``denoise(steps=N, use_ddim=True, eta=0.0,
    timestep_spacing='trailing')`` and a ``clip_x0=False`` pipeline — no
    dedicated sampler needed (identity tested for every N in
    tests/test_distillation.py)."""
    import numpy as np

    i = np.arange(1, student_steps + 1, dtype=np.float64)
    return jnp.asarray(np.round(i * (sched.T / student_steps)).astype(np.int64) - 1,
                       dtype=jnp.int32)
