"""EDM/Karras sampler (arXiv:2206.00364): grid helpers, oracle exactness,
2nd-order accuracy, stochastic churn, objective coverage, error contracts."""

import numpy as np
import pytest
import flax.linen as nn
import jax
import jax.numpy as jnp

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

KEY = jax.random.PRNGKey(0)


def _sched(T=100):
    return GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)


# ---------------------------------------------------------------------------
# grid helpers
# ---------------------------------------------------------------------------

def test_kdiff_sigmas_matches_definition():
    sched = _sched()
    sig = np.asarray(S.kdiff_sigmas(sched))
    ab = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(sig, np.sqrt((1 - ab) / ab), rtol=1e-6)
    assert np.all(np.diff(sig) > 0)  # ascending in t


def test_karras_grid_endpoints_and_monotone():
    grid = np.asarray(S.karras_sigma_grid(0.03, 15.0, 12, rho=7.0))
    assert grid.shape == (13,)
    np.testing.assert_allclose(grid[0], 15.0, rtol=1e-6)
    np.testing.assert_allclose(grid[-2], 0.03, rtol=1e-6)
    assert grid[-1] == 0.0
    assert np.all(np.diff(grid) < 0)  # strictly descending


def test_sigma_to_t_frac_inverts_table_nodes():
    sched = _sched()
    sig = S.kdiff_sigmas(sched)
    # at table nodes the fractional t is the integer index
    t = np.asarray(S.sigma_to_t_frac(sched, sig[::7]))
    np.testing.assert_allclose(t, np.arange(sched.T)[::7], atol=1e-3)
    # between nodes: strictly inside the bracketing indices
    mid = float((sig[10] * sig[11]) ** 0.5)
    tm = float(S.sigma_to_t_frac(sched, jnp.asarray(mid)))
    assert 10.0 < tm < 11.0


# ---------------------------------------------------------------------------
# oracle exactness (all objectives)
# ---------------------------------------------------------------------------

class _OracleX0(nn.Module):
    """Returns the TRUE x0 regardless of input: any consistent
    probability-flow solver then reproduces x0 exactly."""

    x0: tuple

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        _ = self.param("dummy", lambda k: jnp.zeros(()))
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        return jnp.broadcast_to(x0, x_t.shape), []


class _OracleEps(nn.Module):
    """Exact eps for a single known data point: eps = (x_vp - a x0)/s, with
    (a, s) interpolated at the (fractional) query t — the exact score of a
    delta-at-x0 data distribution under the VP forward process."""

    x0: tuple
    abar: tuple  # schedule abar table, baked

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        _ = self.param("dummy", lambda k: jnp.zeros(()))
        ab_tab = jnp.asarray(np.asarray(self.abar, np.float32))
        ab = jnp.interp(t.astype(jnp.float32),
                        jnp.arange(ab_tab.shape[0], dtype=jnp.float32), ab_tab)
        a = jnp.sqrt(ab).reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1.0 - ab).reshape(-1, 1, 1, 1)
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        return (x_t - a * x0) / s, []


class _OracleV(nn.Module):
    """Exact v for a single known data point: v = (a x_vp - x0)/s."""

    x0: tuple
    abar: tuple

    @nn.compact
    def __call__(self, x_t, t=None, condition=None, self_cond=None,
                 cond_mask=None, train=False):
        _ = self.param("dummy", lambda k: jnp.zeros(()))
        ab_tab = jnp.asarray(np.asarray(self.abar, np.float32))
        ab = jnp.interp(t.astype(jnp.float32),
                        jnp.arange(ab_tab.shape[0], dtype=jnp.float32), ab_tab)
        a = jnp.sqrt(ab).reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1.0 - ab).reshape(-1, 1, 1, 1)
        x0 = jnp.asarray(np.asarray(self.x0, np.float32))[None, :, :, None]
        return (a * x_t - x0) / s, []


def _x0_tuple(x0):
    return tuple(map(tuple, x0[0, :, :, 0].tolist()))


def _run_oracle(objective, steps, heun=True):
    rng = np.random.default_rng(5)
    x0 = rng.uniform(-0.9, 0.9, (1, 4, 4, 1)).astype(np.float32)
    sched = _sched()
    ab = tuple(np.asarray(sched.alphas_cumprod, np.float64).tolist())
    if objective == "x_0":
        est = _OracleX0(x0=_x0_tuple(x0))
    elif objective == "x_T":
        est = _OracleEps(x0=_x0_tuple(x0), abar=ab)
    else:
        est = _OracleV(x0=_x0_tuple(x0), abar=ab)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=est,
                             estimator_objective=objective, clip_x0=False,
                             do_input_centering=False)
    x_T = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    params = {"noise_estimator": est.init(
        KEY, jnp.zeros((2, 4, 4, 1)), jnp.zeros((2,), jnp.float32))["params"]}
    out = pipe.denoise_edm(params, x_T, steps=steps, heun=heun, decode=False)
    return np.asarray(out), np.broadcast_to(x0, (2, 4, 4, 1))


def test_edm_oracle_x0_exact():
    """With an oracle x0-denoiser the k-space ODE trajectory x = x0 + s*e is
    followed exactly by Euler AND Heun at any step count."""
    for steps in (4, 20):
        out, want = _run_oracle("x_0", steps)
        np.testing.assert_allclose(out, want, atol=1e-4, err_msg=f"steps={steps}")


def test_edm_oracle_euler_also_exact():
    out, want = _run_oracle("x_0", 6, heun=False)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_edm_oracle_eps_and_v_recover_x0():
    """eps/v oracles are exact only up to the log-sigma<->t interpolation of
    the fractional-t query; 25 steps must land within a loose tolerance and
    improve over 8 steps (consistency of the solver, not the interp)."""
    for objective in ("x_T", "v"):
        out, want = _run_oracle(objective, 25)
        np.testing.assert_allclose(out, want, atol=5e-2, err_msg=objective)


def test_edm_heun_beats_euler_and_matches_ddim_truth():
    """2nd-order selling point on a real (random-weight) UNet: vs a 400-step
    DDIM(eta=0) ground truth of the same probability-flow ODE, Heun at 20
    steps lands closer than Euler at 20 steps."""
    T = 1000
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0)
    sched = GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False, clip_x0=False)
    raw = unet.init(KEY, jnp.zeros((2, 8, 8, 1)), jnp.zeros((2,), jnp.int32))["params"]
    rng = np.random.default_rng(6)
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    params = {"noise_estimator": jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1)
                  for l in leaves])}
    x_T = jnp.asarray(rng.standard_normal((2, 8, 8, 1)).astype(np.float32))

    truth = pipe.denoise(params, x_T, jax.random.PRNGKey(0), steps=400,
                         use_ddim=True, eta=0.0, decode=False)
    heun20 = pipe.denoise_edm(params, x_T, steps=20, heun=True, decode=False)
    euler20 = pipe.denoise_edm(params, x_T, steps=20, heun=False, decode=False)

    err_heun = float(jnp.linalg.norm(heun20 - truth))
    err_euler = float(jnp.linalg.norm(euler20 - truth))
    assert np.isfinite(err_heun) and np.isfinite(err_euler)
    assert err_heun < err_euler, (
        f"EDM Heun 20-step error {err_heun:.4f} !< Euler 20-step {err_euler:.4f}")
    # and the solver agrees with the DDIM-discretized ODE to a sane margin
    assert err_heun < 0.35 * float(jnp.linalg.norm(truth)), (
        f"EDM Heun 20-step error {err_heun:.4f} vs truth norm "
        f"{float(jnp.linalg.norm(truth)):.4f}")


# ---------------------------------------------------------------------------
# churn / CFG / contracts
# ---------------------------------------------------------------------------

def _tiny_pipe(**pipe_kwargs):
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, cond_emb_num_classes=2)
    sched = _sched(T=50)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False, **pipe_kwargs)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 1)).astype(np.float32))
    raw = unet.init(
        KEY, x, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))["params"]
    # randomize: init zero-convs would make conditioning a no-op
    rng = np.random.default_rng(9)
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    params = {"noise_estimator": jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1)
                  for l in leaves])}
    return pipe, params, x


def test_edm_churn_reproducible_and_distinct():
    pipe, params, x = _tiny_pipe()
    a = pipe.denoise_edm(params, x, rng=jax.random.PRNGKey(3), steps=6,
                         s_churn=10.0, decode=False)
    b = pipe.denoise_edm(params, x, rng=jax.random.PRNGKey(3), steps=6,
                         s_churn=10.0, decode=False)
    c = pipe.denoise_edm(params, x, steps=6, s_churn=0.0, decode=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6  # churn actually perturbs


def test_edm_cfg_runs_and_guidance_changes_output():
    pipe, params, x = _tiny_pipe()
    cond = jnp.asarray([0, 1], jnp.int32)
    base = pipe.denoise_edm(params, x, condition=cond, steps=5,
                            guidance_scale=1.0, decode=False)
    guided = pipe.denoise_edm(params, x, condition=cond, steps=5,
                              guidance_scale=4.0, decode=False)
    assert np.all(np.isfinite(np.asarray(guided)))
    assert float(jnp.max(jnp.abs(base - guided))) > 1e-6


def test_edm_error_contracts():
    pipe, params, x = _tiny_pipe()
    with pytest.raises(ValueError, match="pass rng"):
        pipe.denoise_edm(params, x, steps=4, s_churn=5.0)
    sc_pipe, sc_params, _ = _tiny_pipe(use_self_conditioning=True)
    with pytest.raises(ValueError, match="self-cond"):
        sc_pipe.denoise_edm(sc_params, x, steps=4)
    zsched = GaussianDiffusionSchedule.create(
        timesteps=50, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02, zero_terminal_snr=True)
    zpipe = DiffusionPipeline(scheduler=zsched, noise_estimator=pipe.noise_estimator,
                              estimator_objective="v", do_input_centering=False)
    with pytest.raises(ValueError, match="zero-terminal-SNR"):
        zpipe.denoise_edm(params, x, steps=4)


def test_edm_under_jit():
    """The whole sampler is one scan — must trace/compile under jit with the
    step count static."""
    pipe, params, x = _tiny_pipe()

    @jax.jit
    def run(p, x):
        return pipe.denoise_edm(p, x, steps=4, decode=False)

    out = run(params, x)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))
