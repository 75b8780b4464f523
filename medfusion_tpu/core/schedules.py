"""Gaussian diffusion schedule — pure functional TPU-native core.

Capability parity with the reference ``GaussianNoiseScheduler``
(``/root/reference/medical_diffusion/models/noise_schedulers/gaussian_scheduler.py:8-151``
and ``scheduler_base.py:7-46``), redesigned for JAX:

* Schedule tables are precomputed in **float64 numpy** (reference computes the
  betas in torch.float64, :22-44) and stored as float32 device arrays.
* ``q_sample`` replaces the reference's per-sample host python loop
  (``gaussian_scheduler.py:68-76``) with a vectorized ``jnp.where`` over the
  whole batch — identical semantics (t<0 -> x_0, t>=T -> x_T), zero host work.
* Every function is a pure function of ``(schedule, arrays)`` so it can run
  inside ``jit`` / ``lax.scan`` / ``shard_map`` with no Python in the hot loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct


def _make_betas(
    timesteps: int,
    schedule_strategy: str,
    beta_start: float,
    beta_end: float,
    betas: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Float64 beta table. Mirrors gaussian_scheduler.py:22-36."""
    if betas is not None:
        b = np.asarray(betas, dtype=np.float64)
    elif schedule_strategy == "linear":
        b = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
    elif schedule_strategy == "scaled_linear":
        b = np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float64) ** 2
    elif schedule_strategy == "cosine":
        s = 0.008
        x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
        alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        b = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        b = np.clip(b, 0, 0.999)
    else:
        raise NotImplementedError(f"unknown schedule_strategy {schedule_strategy!r}")
    return b


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale a beta table so the terminal SNR is exactly zero
    (Lin et al., *Common Diffusion Noise Schedules and Sample Steps are
    Flawed*, arXiv:2305.08891 Alg. 1 — beyond the reference, whose
    scaled_linear schedule has abar_T ~ 4e-5 > 0, i.e. the model never sees
    pure noise during training yet sampling starts from pure noise).

    sqrt(abar) is shifted so sqrt(abar_T) = 0 and rescaled so sqrt(abar_1)
    keeps its original value; betas are recovered from the adjusted abar.
    The resulting abar_T == 0.0 EXACTLY (beta_T == 1)."""
    b = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - b
    abar_sqrt = np.sqrt(np.cumprod(alphas))
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    abar = abar_sqrt**2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


@struct.dataclass
class GaussianDiffusionSchedule:
    """Immutable pytree of diffusion schedule buffers (all float32, shape [T]).

    Buffer parity: gaussian_scheduler.py:46-58.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_variance: jnp.ndarray
    # Static (non-pytree) fields.
    timesteps: int = struct.field(pytree_node=False, default=1000)
    T: int = struct.field(pytree_node=False, default=1000)
    zero_terminal_snr: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        T: Optional[int] = None,
        schedule_strategy: str = "cosine",
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        betas: Optional[Sequence[float]] = None,
        dtype=jnp.float32,
        zero_terminal_snr: bool = False,
    ) -> "GaussianDiffusionSchedule":
        T = timesteps if T is None else T
        if T != timesteps:
            # the signature mirrors the reference ctor (scheduler_base.py:12
            # takes independent timesteps/T) but every buffer here — and in
            # the reference's shipped configs — is a length-`timesteps` table
            # indexed by t in [0, T): with T != timesteps the gathers clamp
            # SILENTLY under jit and sigma_to_t_frac shape-errors
            raise ValueError(
                f"T={T} != timesteps={timesteps} is unsupported: the noise "
                f"tables are indexed by t directly (every reference config "
                f"uses T == timesteps)")
        b = _make_betas(timesteps, schedule_strategy, beta_start, beta_end, betas)
        if zero_terminal_snr:
            b = rescale_zero_terminal_snr(b)
        alphas = 1.0 - b
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        # abar_T == 0 under zero_terminal_snr: the 1/abar reciprocal tables
        # are legitimately +inf at the terminal index (the eps<->x_0
        # inversions that would touch them are unusable there by
        # construction; the v-parameterized inversions never divide).
        as_f = lambda x: jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)
        with np.errstate(divide="ignore"):
            return cls(
                betas=as_f(b),
                alphas=as_f(alphas),
                alphas_cumprod=as_f(alphas_cumprod),
                alphas_cumprod_prev=as_f(alphas_cumprod_prev),
                sqrt_alphas_cumprod=as_f(np.sqrt(alphas_cumprod)),
                sqrt_one_minus_alphas_cumprod=as_f(np.sqrt(1.0 - alphas_cumprod)),
                sqrt_recip_alphas_cumprod=as_f(np.sqrt(1.0 / alphas_cumprod)),
                sqrt_recipm1_alphas_cumprod=as_f(np.sqrt(1.0 / alphas_cumprod - 1.0)),
                posterior_mean_coef1=as_f(b * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
                posterior_mean_coef2=as_f((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
                posterior_variance=as_f(b * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
                timesteps=timesteps,
                T=T,
                zero_terminal_snr=zero_terminal_snr,
            )

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def timesteps_array(self) -> jnp.ndarray:
        """[0 .. T-1] int32 (scheduler_base.py:17)."""
        return jnp.asarray(
            np.linspace(0, self.T - 1, self.timesteps).astype(np.int64), dtype=jnp.int32
        )

    def ddim_timesteps(self, steps: int, spacing: str = "linspace") -> jnp.ndarray:
        """Sub-sampled timestep grid, ascending, length ``steps``.

        * ``"linspace"`` — torch.linspace(0, T-1, steps).long() semantics
          (reference diffusion_pipeline.py:285; cast truncates, so done in f64).
        * ``"trailing"`` — arange(T, 0, -T/steps).round()-1 reversed
          (arXiv:2305.08891 §3.2, Table 2): always includes the terminal step
          T-1 and spaces the rest evenly from the end — the recommended grid
          for zero-terminal-SNR schedules.
        """
        return jnp.asarray(self.ddim_timesteps_host(steps, spacing), dtype=jnp.int32)

    def ddim_timesteps_host(self, steps: int, spacing: str = "linspace") -> np.ndarray:
        """Host (numpy) version of :meth:`ddim_timesteps` — the grid is a
        static function of ``(T, steps, spacing)``; callers that build static
        schedules from it (e.g. the RePaint op walk) need it concrete even
        when the pipeline is traced under ``jit``."""
        if spacing == "linspace":
            vals = np.linspace(0.0, float(self.T - 1), steps)
            return vals.astype(np.int64).astype(np.int32)
        if spacing == "trailing":
            # Index-multiply form round(i*T/steps)-1 for i in {1..steps}, NOT
            # np.arange(T, 0, -T/steps): the float-stride arange accumulates
            # rounding error and returns steps+1 entries (with a bogus t=-1)
            # for ~6% of step counts (e.g. T=1000, steps=61/103/121...), and
            # its products round-half to the other side than the direct
            # multiply for others (e.g. steps=48). This form is also the
            # progressive-distillation student grid, so the two are
            # IDENTICAL by construction (train/distillation.py contract).
            i = np.arange(1, steps + 1, dtype=np.float64)
            vals = np.round(i * (self.T / steps)).astype(np.int64) - 1
            return vals.astype(np.int32)
        raise ValueError(f"unknown timestep spacing {spacing!r}")


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """a[t] broadcast to `ndim` dims: [B] -> [B, 1, 1, ...] (scheduler_base.py:43-46)."""
    out = a[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def clip_x0(x_0: jnp.ndarray, m: float = 1.0) -> jnp.ndarray:
    """Static thresholding (gaussian_scheduler.py:138-151)."""
    return jnp.clip(x_0, -m, m)


def q_sample(
    sched: GaussianDiffusionSchedule,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    x_T: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0); `estimate_x_t` (gaussian_scheduler.py:61-77).

    Vectorized replacement for the reference per-sample loop: per-sample t is
    clamped with `where` masks (t<0 -> x_0, t>=T -> x_T).
    """
    ndim = x_0.ndim
    tc = jnp.clip(t, 0, sched.T - 1)
    x_t = (
        extract(sched.sqrt_alphas_cumprod, tc, ndim) * x_0
        + extract(sched.sqrt_one_minus_alphas_cumprod, tc, ndim) * x_T
    )
    tb = t.reshape(-1, *([1] * (ndim - 1)))
    x_t = jnp.where(tb < 0, x_0, x_t)
    x_t = jnp.where(tb >= sched.T, x_T, x_t)
    return x_t


def estimate_x_0(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    x_T: jnp.ndarray,
    t: jnp.ndarray,
    clip: bool = True,
) -> jnp.ndarray:
    """Invert q to get x_0 from (x_t, eps) (gaussian_scheduler.py:119-124)."""
    ndim = x_t.ndim
    x_0 = (
        extract(sched.sqrt_recip_alphas_cumprod, t, ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, ndim) * x_T
    )
    return clip_x0(x_0) if clip else x_0


def estimate_x_T(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    clip: bool = True,
) -> jnp.ndarray:
    """Invert q to get eps from (x_t, x_0) (gaussian_scheduler.py:127-131)."""
    ndim = x_t.ndim
    x_0 = clip_x0(x_0) if clip else x_0
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, ndim) * x_t - x_0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, ndim)


def estimate_x_T_safe(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    clip: bool = True,
) -> jnp.ndarray:
    """eps from (x_t, x_0) via the direct form
    (x_t - sqrt(abar)*x_0) / sqrt(1-abar) — algebraically equal to
    :func:`estimate_x_T` but finite at abar_t = 0 (the reference's form
    divides inf/inf at the terminal step of a zero-terminal-SNR schedule,
    arXiv:2305.08891)."""
    ndim = x_t.ndim
    x_0 = clip_x0(x_0) if clip else x_0
    return (
        x_t - extract(sched.sqrt_alphas_cumprod, t, ndim) * x_0
    ) / extract(sched.sqrt_one_minus_alphas_cumprod, t, ndim)


def posterior_mean(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_{t-1} | x_t, x_0) mean (gaussian_scheduler.py:104-107)."""
    ndim = x_t.ndim
    return (
        extract(sched.posterior_mean_coef1, t, ndim) * x_0
        + extract(sched.posterior_mean_coef2, t, ndim) * x_t
    )


def posterior_variance(
    sched: GaussianDiffusionSchedule,
    t: jnp.ndarray,
    ndim: int,
    log: bool = True,
    var_scale=0.0,
    eps: float = 1e-20,
):
    """Posterior variance, optionally log-interpolated between min (posterior)
    and max (beta) by a learned `var_scale` (gaussian_scheduler.py:110-116)."""
    min_variance = extract(sched.posterior_variance, t, ndim)
    max_variance = extract(sched.betas, t, ndim)
    if log:
        min_variance = jnp.log(jnp.clip(min_variance, eps))
        max_variance = jnp.log(jnp.clip(max_variance, eps))
    return var_scale * max_variance + (1 - var_scale) * min_variance


def ancestral_step(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    x_0: jnp.ndarray,
    noise: jnp.ndarray,
    use_log: bool = True,
    clip: bool = True,
    var_scale=0.0,
):
    """DDPM ancestral step x_t -> x_{t-1} given predicted x_0
    (`estimate_x_t_prior_from_x_0`, gaussian_scheduler.py:85-101, non-cold branch).

    `noise` replaces the reference's internal randn so callers control RNG.
    Returns (x_t_prior, x_0_clipped).
    """
    ndim = x_t.ndim
    x_0 = clip_x0(x_0) if clip else x_0
    mean = posterior_mean(sched, x_t, x_0, t)
    variance = posterior_variance(sched, t, ndim, log=use_log, var_scale=var_scale)
    std = jnp.exp(0.5 * variance) if use_log else jnp.sqrt(variance)
    tb = t.reshape(-1, *([1] * (ndim - 1)))
    std = jnp.where(tb == 0, 0.0, std)  # reference: std[t==0] = 0
    return mean + std * noise, x_0


def ancestral_step_from_eps(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    x_T: jnp.ndarray,
    noise: jnp.ndarray,
    use_log: bool = True,
    clip: bool = True,
    var_scale=0.0,
):
    """`estimate_x_t_prior_from_x_T` (gaussian_scheduler.py:80-82)."""
    x_0 = estimate_x_0(sched, x_t, x_T, t, clip=clip)
    return ancestral_step(sched, x_t, t, x_0, noise, use_log, clip, var_scale)


def cold_diffusion_step(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    x_0: jnp.ndarray,
    clip: bool = True,
):
    """Cold-diffusion sampling branch (gaussian_scheduler.py:88-93).

    x_t_prior = x_t - (D(x_0, t) - D(x_0, t-1)) with the degradation operator D
    re-noising with the eps implied by (x_t, x_0).
    """
    x_0 = clip_x0(x_0) if clip else x_0
    # estimate_x_T_safe: algebraically equal to the reference form but finite
    # at abar_t = 0 (zero-terminal-SNR schedules; the reference form is
    # inf/inf = NaN at the terminal step)
    x_T_est = estimate_x_T_safe(sched, x_t, x_0, t, clip=False)
    x_t_est = q_sample(sched, x_0, t, x_T_est)
    x_t_prior = q_sample(sched, x_0, t - 1, x_T_est)
    return x_t - (x_t_est - x_t_prior), x_0


def ddim_sigma(sched: GaussianDiffusionSchedule, t, t_next, eta) -> jnp.ndarray:
    """DDIM sigma_t (diffusion_pipeline.py:301)."""
    alpha = sched.alphas_cumprod[t]
    alpha_next = sched.alphas_cumprod[t_next]
    return eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))


def ddim_step(
    sched: GaussianDiffusionSchedule,
    x_0: jnp.ndarray,
    x_T: jnp.ndarray,
    t,
    t_next,
    noise: jnp.ndarray,
    eta=1.0,
):
    """DDIM re-mix x_{t_next} = x_0*sqrt(a') + c*eps + sigma*noise
    (diffusion_pipeline.py:297-304)."""
    alpha_next = sched.alphas_cumprod[t_next]
    sigma = ddim_sigma(sched, t, t_next, eta)
    # clamp: at abar_t = 0 (zero-terminal-SNR terminal step) sigma^2 equals
    # 1 - abar_next EXACTLY in real arithmetic, and one ulp of f32 rounding
    # makes the radicand negative -> sqrt = NaN poisoning the whole scan
    # (bisected: trailing spacing + eta=1.0 on a zero-SNR schedule)
    c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0))
    return x_0 * jnp.sqrt(alpha_next) + c * x_T + sigma * noise


def v_target(
    sched: GaussianDiffusionSchedule,
    x_0: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """v-prediction target v = sqrt(abar_t)*eps - sqrt(1-abar_t)*x_0
    (Salimans & Ho, *Progressive Distillation*, arXiv:2202.00512 §2.4 —
    beyond the reference, which ships eps/x_0 objectives only)."""
    ndim = x_0.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, ndim) * eps
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, ndim) * x_0
    )


def estimate_x_0_from_v(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    v: jnp.ndarray,
    t: jnp.ndarray,
    clip: bool = True,
) -> jnp.ndarray:
    """x_0 = sqrt(abar_t)*x_t - sqrt(1-abar_t)*v (arXiv:2202.00512)."""
    ndim = x_t.ndim
    x_0 = (
        extract(sched.sqrt_alphas_cumprod, t, ndim) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, ndim) * v
    )
    return clip_x0(x_0) if clip else x_0


def estimate_x_T_from_v(
    sched: GaussianDiffusionSchedule,
    x_t: jnp.ndarray,
    v: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """eps = sqrt(1-abar_t)*x_t + sqrt(abar_t)*v (arXiv:2202.00512).

    Unlike routing through the x_0 estimate (``estimate_x_T`` divides by
    sqrt(1/abar_t - 1), which is inf at abar_t = 0), this form stays finite
    for every t — the prerequisite for zero-terminal-SNR schedules
    (arXiv:2305.08891)."""
    ndim = x_t.ndim
    return (
        extract(sched.sqrt_one_minus_alphas_cumprod, t, ndim) * x_t
        + extract(sched.sqrt_alphas_cumprod, t, ndim) * v
    )


def snr(sched: GaussianDiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio abar_t / (1 - abar_t) per sample ([B])."""
    ab = sched.alphas_cumprod[t]
    return ab / (1.0 - ab)


def min_snr_weight(
    sched: GaussianDiffusionSchedule,
    t: jnp.ndarray,
    gamma: float,
    objective: str,
) -> jnp.ndarray:
    """Min-SNR-gamma per-sample loss weight (Hang et al., *Efficient
    Diffusion Training via Min-SNR Weighting*, arXiv:2303.09556 — beyond the
    reference, which weights all timesteps equally).

    Balances the effective per-timestep gradient scale so easy low-noise
    steps stop dominating training: clamp SNR at gamma (paper default 5),
    then express in each parameterization's native loss space:
      eps: min(SNR, g)/SNR      x_0: min(SNR, g)      v: min(SNR, g)/(SNR+1)

    Zero-terminal-SNR composition: at SNR == 0 exactly (the rescaled
    schedule's terminal step) the paper formulas degenerate to weight 0 —
    which would silently never train the t = T-1 prediction that trailing
    sampling consumes FIRST. Min-SNR's purpose is capping the easy
    high-SNR steps, not deleting the terminal one, so the weight falls back
    to the uniform-training value (1.0) exactly at SNR == 0 for the v and
    x_0 objectives (eps is rejected on zero-SNR schedules anyway)."""
    s = snr(sched, t)
    clamped = jnp.minimum(s, gamma)
    if objective == "x_T":
        return clamped / jnp.maximum(s, 1e-20)
    if objective == "v":
        return jnp.where(s == 0.0, 1.0, clamped / (s + 1.0))
    return jnp.where(s == 0.0, 1.0, clamped)  # x_0


def kdiff_sigmas(sched: GaussianDiffusionSchedule) -> jnp.ndarray:
    """Per-timestep k-diffusion noise levels sigma_t = sqrt((1-abar_t)/abar_t)
    ([T], ascending in t). This is the change of variables that maps the VP
    forward process x_t = sqrt(abar) x_0 + sqrt(1-abar) eps onto the
    EDM/k-diffusion parameterization x = x_0 + sigma eps with
    x = x_vp / sqrt(abar_t) (Karras et al., arXiv:2206.00364 §B/Table 1;
    beyond the reference, which ships DDPM/DDIM only)."""
    ab = sched.alphas_cumprod
    return jnp.sqrt((1.0 - ab) / ab)


def karras_sigma_grid(
    sigma_min, sigma_max, n: int, rho: float = 7.0
) -> jnp.ndarray:
    """Karras sampling grid (arXiv:2206.00364 eq. 5): ``n`` noise levels
    descending from sigma_max to sigma_min, evenly spaced in sigma^(1/rho)
    (rho=7 concentrates steps near sigma_min where the ODE curves most),
    with the terminal 0 appended — length ``n + 1``."""
    ramp = jnp.linspace(0.0, 1.0, n)
    inv_rho = 1.0 / rho
    sig = (sigma_max**inv_rho + ramp * (sigma_min**inv_rho - sigma_max**inv_rho)) ** rho
    return jnp.concatenate([sig, jnp.zeros((1,), sig.dtype)])


def sigma_to_t_frac(sched: GaussianDiffusionSchedule, sigma) -> jnp.ndarray:
    """Continuous (fractional) timestep for a k-diffusion sigma, by linear
    interpolation of log-sigma over the schedule's own table (the
    k-diffusion ``DiscreteSchedule.sigma_to_t`` convention). The sinusoidal
    time embedding is a smooth function of t, so fractional t is exactly the
    right query for a discretely-trained model evaluated off-grid."""
    log_tab = jnp.log(kdiff_sigmas(sched))
    t = jnp.interp(jnp.log(jnp.clip(sigma, 1e-20)), log_tab,
                   jnp.arange(sched.T, dtype=jnp.float32))
    return t


def kl_gaussians(mean1, logvar1, mean2, logvar2):
    """Closed-form KL(N1||N2) per element (utils/math_utils.py:3-5)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


# ---------------------------------------------------------------------------
# Stable-Diffusion schedule helpers
# (external/stable_diffusion/util.py:38-115 — the vendored SD utility
# surface; float64 numpy host-side table builders)
# ---------------------------------------------------------------------------

def sd_make_beta_schedule(schedule: str, n_timestep: int,
                          linear_start: float = 1e-4,
                          linear_end: float = 2e-2,
                          cosine_s: float = 8e-3) -> np.ndarray:
    """``make_beta_schedule`` (util.py:38-61). SD's naming differs from the
    in-house scheduler: SD 'linear' is sqrt-space (== 'scaled_linear' here,
    gaussian_scheduler.py:27-30), SD 'sqrt_linear' is plain linspace."""
    if schedule == "linear":
        return np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                           n_timestep, dtype=np.float64) ** 2
    if schedule == "cosine":
        x = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(x / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        return np.clip(betas, 0, 0.999)
    if schedule == "sqrt_linear":
        return np.linspace(linear_start, linear_end, n_timestep,
                           dtype=np.float64)
    if schedule == "sqrt":
        return np.linspace(linear_start, linear_end, n_timestep,
                           dtype=np.float64) ** 0.5
    raise ValueError(f"schedule '{schedule}' unknown.")


def sd_ddim_timesteps(num_ddim_timesteps: int, num_ddpm_timesteps: int,
                      method: str = "uniform") -> np.ndarray:
    """``make_ddim_timesteps`` (util.py:63-77): 'uniform' strided or 'quad'
    quadratic subsampling, +1 so the final alpha scales to data."""
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8),
                             num_ddim_timesteps) ** 2).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{method}"')
    return steps + 1


def sd_ddim_sampling_parameters(alphacums: np.ndarray,
                                ddim_timesteps: np.ndarray, eta: float):
    """``make_ddim_sampling_parameters`` (util.py:80-92): per-step
    (sigma, alpha, alpha_prev) for the DDIM sampler (arXiv:2010.02502)."""
    alphacums = np.asarray(alphacums)
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray(
        [alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def betas_for_alpha_bar(num_diffusion_timesteps: int, alpha_bar,
                        max_beta: float = 0.999) -> np.ndarray:
    """``betas_for_alpha_bar`` (util.py:94-110): discretize a continuous
    alpha-bar(t) into betas."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)
