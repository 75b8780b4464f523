"""Flow-family editing surface (pipelines/flow.py: invert / sample_inpaint /
interpolate) — family parity with the diffusion pipeline's editing stack
(round-3 verdict ask #5; mirrors tests/test_inversion_inpaint.py).

``invert`` — deterministic forward ODE sweep. The integrator is the exact
time-mirror of ``denoise`` (every query at the higher-t interval endpoint,
Heun's symmetric step elsewhere, t=0 never queried), so for any
x-INDEPENDENT velocity field the invert -> denoise roundtrip cancels
exactly; pinned here with a time-varying oracle field.

``denoise(known=, mask=)`` / ``sample_inpaint`` — per-step known-region
projection on the linear path: the mask==1 region must equal ``known``
EXACTLY in the output (t=0 projection composites the clean input).

``interpolate(ode_invert=True)`` — slerp in inverted noise space; endpoints
reconstruct the inputs under the oracle field.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.flow import FlowMatchingPipeline

KEY = jax.random.PRNGKey(0)


class _TimeField:
    """x-independent, time-varying oracle velocity v(x, t) = (a + b t) * c.
    Any pair of time-mirrored integrators must cancel exactly on it."""

    def __init__(self, c, a=0.5, b=2.0):
        self.c, self.a, self.b = c, a, b

    def apply(self, variables, x, t, condition=None, self_cond=None,
              cond_mask=None):
        tt = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return (self.a + self.b * tt) * self.c, []


class _ContractField:
    """v(x, t) = -x (test_flow.py's analytic stub): x-dependent, used for
    the approximate-roundtrip and inpaint-generation checks."""

    def apply(self, variables, x, t, condition=None, self_cond=None,
              cond_mask=None):
        return -x, []


def _pipe(est, **kw):
    kw.setdefault("do_input_centering", False)
    return FlowMatchingPipeline(noise_estimator=est, **kw)


@pytest.mark.parametrize("heun", [True, False])
@pytest.mark.parametrize("shift", [1.0, 3.0])
def test_invert_then_denoise_roundtrip_oracle(heun, shift):
    rng = np.random.default_rng(0)
    x_0 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 3)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    pipe = _pipe(_TimeField(c), shift=shift)
    params = {"noise_estimator": {}}
    x_T = pipe.invert(params, x_0, steps=13, heun=heun)
    assert x_T.shape == x_0.shape
    # the inverted state really moved (the field integrates to ~1.5*c)
    assert float(jnp.abs(x_T - x_0).mean()) > 0.1
    out = pipe.denoise(params, x_T, steps=13, heun=heun, decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_0), atol=1e-5)


def test_invert_roundtrip_real_dynamics_converges():
    """x-dependent field (v = -x): the mirrored integrators are no longer an
    algebraic identity, but the roundtrip error is pure discretization error
    and must shrink with the grid."""
    x_0 = jax.random.normal(KEY, (2, 8, 8, 1)) * 0.3
    pipe = _pipe(_ContractField())
    params = {"noise_estimator": {}}
    errs = []
    for steps in (8, 32):
        x_T = pipe.invert(params, x_0, steps=steps)
        out = pipe.denoise(params, x_T, steps=steps, decode=False)
        errs.append(float(jnp.max(jnp.abs(out - x_0))))
    assert errs[1] < 0.3 * errs[0], errs
    assert errs[1] < 5e-3, errs


def test_invert_real_unet_finite_and_guided():
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                cond_emb_num_classes=2, deep_supervision=0, time_emb_dim=16)
    x = jax.random.normal(KEY, (2, 8, 8, 1)) * 0.1
    t0 = jnp.zeros((2,), jnp.float32)
    cond = jnp.asarray([0, 1], jnp.int32)
    params = {"noise_estimator": unet.init(jax.random.PRNGKey(1), x, t0,
                                           cond)["params"]}
    pipe = _pipe(unet)
    for gs in (1.0, 2.0):
        z = pipe.invert(params, x, condition=cond, steps=6,
                        guidance_scale=gs)
        assert z.shape == x.shape
        assert np.all(np.isfinite(np.asarray(z)))


@pytest.mark.parametrize("resample_steps", [1, 3])
def test_inpaint_known_region_exact(resample_steps):
    rng = np.random.default_rng(1)
    known = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 8, 1)).astype(np.float32))
    mask = jnp.zeros((2, 8, 8, 1)).at[:, :4].set(1.0)  # top half fixed
    pipe = _pipe(_ContractField())
    params = {"noise_estimator": {}}
    out = pipe.sample_inpaint(params, jax.random.PRNGKey(3), known, mask,
                              steps=9, resample_steps=resample_steps,
                              decode=False)
    out, known_np, m = np.asarray(out), np.asarray(known), np.asarray(mask)
    np.testing.assert_array_equal(out * m, known_np * m)
    # the free region was actually generated, not copied
    assert np.max(np.abs((out - known_np) * (1 - m))) > 1e-3


def test_inpaint_via_denoise_midpath_and_heun_off():
    known = jax.random.normal(KEY, (1, 8, 8, 1)) * 0.5
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :, :4].set(1.0)
    pipe = _pipe(_ContractField())
    params = {"noise_estimator": {}}
    x_T = jax.random.normal(jax.random.PRNGKey(7), known.shape)
    out = pipe.denoise(params, x_T, jax.random.PRNGKey(8), steps=7,
                       heun=False, known=known, mask=mask, decode=False)
    np.testing.assert_array_equal(np.asarray(out * mask),
                                  np.asarray(known * mask))


def test_interpolate_ode_invert_endpoints_reconstruct():
    rng = np.random.default_rng(2)
    img1 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 1)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 1)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    pipe = _pipe(_TimeField(c))
    params = {"noise_estimator": {}}
    for lam, ref in ((0.0, img1), (1.0, img2)):
        out = pipe.interpolate(params, jax.random.PRNGKey(5), img1, img2,
                               lam=lam, ode_invert=True, steps=11,
                               decode=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)
    mid = pipe.interpolate(params, jax.random.PRNGKey(5), img1, img2,
                           lam=0.5, ode_invert=True, steps=11, decode=False)
    assert np.all(np.isfinite(np.asarray(mid)))
    assert float(jnp.abs(mid - img1).mean()) > 1e-3


def test_interpolate_default_mode_runs_and_midpath():
    img1 = jax.random.normal(KEY, (2, 8, 8, 1)) * 0.4
    img2 = -img1
    pipe = _pipe(_ContractField())
    params = {"noise_estimator": {}}
    out = pipe.interpolate(params, jax.random.PRNGKey(9), img1, img2,
                           strength=0.5, lam=0.5, steps=8, decode=False)
    assert out.shape == img1.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # lam=0.5 of exact opposites noised with fresh eps: output is pure noise
    # integrated down — just pin shape/finiteness; the arg contract below
    # carries the semantics
    with pytest.raises(ValueError):
        pipe.interpolate(params, KEY, img1, img2, strength=0.0)


def test_editing_arg_contracts():
    pipe = _pipe(_ContractField())
    params = {"noise_estimator": {}}
    x = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones_like(x)
    with pytest.raises(ValueError, match="BOTH known and mask"):
        pipe.denoise(params, x, KEY, steps=4, known=x)
    with pytest.raises(ValueError, match="requires known"):
        pipe.denoise(params, x, KEY, steps=4, resample_steps=2)
    with pytest.raises(ValueError, match="pass rng"):
        pipe.denoise(params, x, None, steps=4, known=x, mask=mask)
    with pytest.raises(ValueError, match="resample_steps"):
        pipe.denoise(params, x, KEY, steps=4, known=x, mask=mask,
                     resample_steps=0)
