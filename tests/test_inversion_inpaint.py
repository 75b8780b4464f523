"""DDIM inversion and RePaint-style inpainting (beyond the reference).

``DiffusionPipeline.invert`` — deterministic DDIM inversion (arXiv:2010.02502
§4.3): with an oracle estimator (exact prediction implied by a fixed true x_0)
the invert -> eta=0-denoise roundtrip must reconstruct the input exactly; the
analogous sampling-only loops are pinned in tests/test_zero_terminal_snr.py.

``denoise(known=, mask=)`` / ``sample_inpaint`` — per-step known-region
projection (arXiv:2201.09865 eq. 8): the mask==1 region must equal ``known``
EXACTLY in the output (the final projection composites the clean input), the
mask==0 region is generated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline


def _sched(T=100):
    return GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)


class _OracleEps:
    """Exact eps implied by (x_t, fixed true x_0): eps = (x_t - sa*x_0)/so."""

    def __init__(self, sched, x_0):
        self.sched = sched
        self.x_0 = x_0

    def apply(self, variables, x_t, t, condition=None, self_cond=None, cond_mask=None):
        nd = x_t.ndim
        sa = S.extract(self.sched.sqrt_alphas_cumprod, t, nd)
        so = S.extract(self.sched.sqrt_one_minus_alphas_cumprod, t, nd)
        return (x_t - sa * self.x_0) / so, []


class _OracleV:
    def __init__(self, sched, x_0):
        self.sched = sched
        self.x_0 = x_0

    def apply(self, variables, x_t, t, condition=None, self_cond=None, cond_mask=None):
        nd = x_t.ndim
        num = S.extract(self.sched.sqrt_alphas_cumprod, t, nd) * x_t - self.x_0
        den = S.extract(self.sched.sqrt_one_minus_alphas_cumprod, t, nd)
        return num / den, []


@pytest.mark.parametrize("objective,oracle_cls", [("x_T", _OracleEps), ("v", _OracleV)])
def test_invert_then_denoise_roundtrip_oracle(objective, oracle_cls):
    """invert -> same-grid eta=0 denoise is the identity under an oracle
    estimator (every step's x0-prediction is exact, so the two ODE
    discretizations cancel)."""
    sched = _sched(T=100)
    rng = np.random.default_rng(0)
    x_0 = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 8, 8, 3)).astype(np.float32))
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=oracle_cls(sched, x_0),
                             latent_embedder=None, estimator_objective=objective,
                             do_input_centering=False, clip_x0=False)
    params = {"noise_estimator": {}}
    x_T = pipe.invert(params, x_0, steps=25)
    assert x_T.shape == x_0.shape
    assert np.all(np.isfinite(np.asarray(x_T)))
    # the inverted state really is at the top noise level, not still clean
    assert float(jnp.abs(x_T - x_0).mean()) > 0.1
    out = pipe.denoise(params, x_T, jax.random.PRNGKey(1), steps=25,
                       use_ddim=True, eta=0.0, decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_0), atol=1e-3)


def test_invert_real_unet_finite_and_guided():
    """Real (random-init) tiny UNet: inversion is finite, shaped, and the
    CFG-guided path compiles/runs."""
    sched = _sched(T=50)
    unet = UNet(in_ch=2, out_ch=2, spatial_dims=2, hid_chs=(8, 16),
                kernel_sizes=(3, 3), strides=(1, 2), num_res_blocks=1,
                use_attention=("none", "none"), time_emb_dim=16,
                cond_emb_num_classes=2, deep_supervision=0,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 8, 8, 2), minval=-0.5, maxval=0.5)
    t0 = jnp.zeros((2,), jnp.int32)
    cond = jnp.array([0, 1], jnp.int32)
    raw = unet.init(key, x, t0, cond)["params"]
    # the out head is zero-init (the reference's convention), which makes a
    # fresh UNet predict exactly 0 for ANY input/condition — jitter every
    # leaf so conditioning actually reaches the output
    leaves, treedef = jax.tree_util.tree_flatten(raw)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    raw = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    params = {"noise_estimator": raw}
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False,
                             clip_x0=False)
    x_T = pipe.invert(params, x, steps=6)
    assert x_T.shape == x.shape and np.all(np.isfinite(np.asarray(x_T)))
    x_Tg = pipe.invert(params, x, condition=cond, guidance_scale=2.0, steps=6)
    assert np.all(np.isfinite(np.asarray(x_Tg)))
    # guidance changes the trajectory
    assert float(jnp.abs(x_Tg - x_T).max()) > 1e-6


@pytest.mark.parametrize("use_ddim,eta", [(True, 0.0), (True, 1.0), (False, 0.0)])
def test_inpaint_keeps_known_region_exactly(use_ddim, eta):
    """sample_inpaint output == known wherever mask == 1 (the final
    projection composites the clean input), for DDIM (deterministic and
    stochastic) and ancestral sampling; the generated region is pulled to
    the oracle's x_0."""
    sched = _sched(T=40)
    rng = np.random.default_rng(2)
    x_target = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 8, 8, 1)).astype(np.float32))
    x_known = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 8, 8, 1)).astype(np.float32))
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[:, :, :4, :] = 1.0  # left half kept
    mask = jnp.asarray(mask)
    pipe = DiffusionPipeline(scheduler=sched,
                             noise_estimator=_OracleEps(sched, x_target),
                             latent_embedder=None, do_input_centering=False,
                             clip_x0=False)
    params = {"noise_estimator": {}}
    out = pipe.sample_inpaint(params, jax.random.PRNGKey(3), x_known, mask,
                              steps=20 if use_ddim else None,
                              use_ddim=use_ddim, eta=eta, decode=False)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(out[m], np.asarray(x_known)[m], atol=1e-6)
    # generated half converges to the oracle's x_0 under eta=0 DDIM
    if use_ddim and eta == 0.0:
        np.testing.assert_allclose(out[~m], np.asarray(x_target)[~m], atol=0.05)


def test_inpaint_real_unet_smoke():
    sched = _sched(T=20)
    unet = UNet(in_ch=1, out_ch=1, spatial_dims=2, hid_chs=(8, 16),
                kernel_sizes=(3, 3), strides=(1, 2), num_res_blocks=1,
                use_attention=("none", "none"), time_emb_dim=16,
                deep_supervision=0,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    key = jax.random.PRNGKey(0)
    known = jax.random.uniform(key, (2, 8, 8, 1), minval=-0.5, maxval=0.5)
    params = {"noise_estimator": unet.init(
        key, known, jnp.zeros((2,), jnp.int32), None)["params"]}
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False)
    mask = jnp.asarray(np.eye(8, dtype=np.float32)[None, :, :, None])
    out = pipe.sample_inpaint(params, jax.random.PRNGKey(1), known, mask,
                              steps=5, use_ddim=True, eta=1.0, decode=False)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    m = np.broadcast_to(np.asarray(mask), out.shape).astype(bool)
    np.testing.assert_allclose(out[m], np.asarray(known)[m], atol=1e-6)


def test_repaint_op_schedule_structure():
    """The op walk (arXiv:2201.09865 Alg. 2): starts at position 0, ends at
    n (clean), consecutive ops chain and move exactly one grid level, and
    the op counts match the closed form — n + 2*j*(r-1)*#jump_points total
    (each jump point replays j reverse steps and j forward steps, r-1
    times)."""
    from medfusion_tpu.pipelines.diffusion import repaint_op_schedule

    for n, j, r in [(10, 2, 3), (12, 4, 2), (7, 3, 4), (5, 1, 1)]:
        ops = repaint_op_schedule(n, j, r)
        assert ops[0][0] == 0 and ops[-1][1] == n
        for (f1, t1), (f2, _) in zip(ops, ops[1:]):
            assert t1 == f2  # the walk chains
        assert all(abs(t - f) == 1 for f, t in ops)
        n_jump_points = len(range(j, n, j))
        n_fwd = sum(1 for f, t in ops if t < f)
        assert n_fwd == j * (r - 1) * n_jump_points
        assert len(ops) - n_fwd == n + j * (r - 1) * n_jump_points
    with pytest.raises(ValueError, match="must be >= 1"):
        repaint_op_schedule(10, 0, 2)
    # jump_length >= n with resampling requested: no jump point would exist
    # and the resampling would silently not happen — rejected instead
    with pytest.raises(ValueError, match="no jump point"):
        repaint_op_schedule(6, 10, 5)
    assert len(repaint_op_schedule(6, 10, 1)) == 6  # plain descent is fine


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_inpaint_resampling_keeps_known_and_converges(eta):
    """Full RePaint resampling (resample_steps=3, jump_length=2): the
    mask==1 region is still composited exactly, the generated region is
    still pulled to the oracle's x_0, everything finite."""
    sched = _sched(T=40)
    rng = np.random.default_rng(5)
    x_target = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 8, 8, 1)).astype(np.float32))
    x_known = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 8, 8, 1)).astype(np.float32))
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[:, :4, :, :] = 1.0  # top half kept
    mask = jnp.asarray(mask)
    pipe = DiffusionPipeline(scheduler=sched,
                             noise_estimator=_OracleEps(sched, x_target),
                             latent_embedder=None, do_input_centering=False,
                             clip_x0=False)
    params = {"noise_estimator": {}}
    out = pipe.sample_inpaint(params, jax.random.PRNGKey(6), x_known, mask,
                              steps=20, use_ddim=True, eta=eta, decode=False,
                              resample_steps=3, jump_length=2)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(out[m], np.asarray(x_known)[m], atol=1e-6)
    if eta == 0.0:
        np.testing.assert_allclose(out[~m], np.asarray(x_target)[~m], atol=0.05)


def test_inpaint_resampling_real_unet_smoke():
    """Resampling through a real UNet (self-cond carry rides through the
    lax.cond ops) — finite, exact known composite."""
    sched = _sched(T=20)
    unet = UNet(in_ch=1, out_ch=1, spatial_dims=2, hid_chs=(8, 16),
                kernel_sizes=(3, 3), strides=(1, 2), num_res_blocks=1,
                use_attention=("none", "none"), time_emb_dim=16,
                deep_supervision=0,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    key = jax.random.PRNGKey(0)
    known = jax.random.uniform(key, (2, 8, 8, 1), minval=-0.5, maxval=0.5)
    params = {"noise_estimator": unet.init(
        key, known, jnp.zeros((2,), jnp.int32), None)["params"]}
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False)
    mask = jnp.asarray(np.eye(8, dtype=np.float32)[None, :, :, None])
    out = pipe.sample_inpaint(params, jax.random.PRNGKey(1), known, mask,
                              steps=6, use_ddim=True, eta=1.0, decode=False,
                              resample_steps=2, jump_length=3)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    m = np.broadcast_to(np.asarray(mask), out.shape).astype(bool)
    np.testing.assert_allclose(out[m], np.asarray(known)[m], atol=1e-6)


def test_resampling_requires_known_mask():
    sched = _sched(T=10)
    pipe = DiffusionPipeline(scheduler=sched,
                             noise_estimator=_OracleEps(sched, jnp.zeros((1, 4, 4, 1))),
                             latent_embedder=None)
    x = jnp.zeros((1, 4, 4, 1))
    with pytest.raises(ValueError, match="requires"):
        pipe.denoise({"noise_estimator": {}}, x, jax.random.PRNGKey(0),
                     steps=2, resample_steps=2)


def test_inpaint_requires_both_known_and_mask():
    sched = _sched(T=10)
    pipe = DiffusionPipeline(scheduler=sched,
                             noise_estimator=_OracleEps(sched, jnp.zeros((1, 4, 4, 1))),
                             latent_embedder=None)
    x = jnp.zeros((1, 4, 4, 1))
    with pytest.raises(ValueError, match="BOTH known and mask"):
        pipe.denoise({"noise_estimator": {}}, x, jax.random.PRNGKey(0),
                     steps=2, known=x)
    with pytest.raises(ValueError, match="BOTH known and mask"):
        pipe.denoise({"noise_estimator": {}}, x, jax.random.PRNGKey(0),
                     steps=2, mask=jnp.ones_like(x))


def test_helpers_inpaint_cli(tmp_path):
    from medfusion_tpu.cli import helpers

    helpers.main(["inpaint", "--preset", "smoke", "--steps", "4",
                  "--box", "0.25,0.25,0.75,0.75", "--out", str(tmp_path)])
    assert (tmp_path / "inpaint.png").exists()


def test_helpers_interpolate_ddim_invert_cli(tmp_path):
    from medfusion_tpu.cli import helpers

    helpers.main(["interpolate", "--preset", "smoke", "--n", "3",
                  "--steps", "4", "--ddim-invert", "--out", str(tmp_path)])
    assert (tmp_path / "interpolation.png").exists()


# ---------------------------------------------------------------------------
# img2img (SDEdit, arXiv:2108.01073 — beyond the reference)
# ---------------------------------------------------------------------------

def test_img2img_oracle_recovers_x0_at_any_strength():
    """With an exact eps oracle and eta=0 DDIM, the reverse scan lands on the
    oracle's x_0 from ANY starting level — pinning the start_idx grid
    arithmetic (a one-off-grid bug would leave residual noise)."""
    sched = _sched(T=100)
    x_star = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 1)) * 0.3
    pipe = DiffusionPipeline(scheduler=sched,
                             noise_estimator=_OracleEps(sched, x_star),
                             latent_embedder=None, do_input_centering=False,
                             clip_x0=False)
    params = {"noise_estimator": {}}
    for strength in (0.25, 0.6, 1.0):
        out = pipe.img2img(params, jax.random.PRNGKey(4), x_star,
                           strength=strength, steps=20, use_ddim=True, eta=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x_star),
                                   atol=1e-4, err_msg=f"strength={strength}")


def test_img2img_strength_scales_deviation_untrained():
    from medfusion_tpu.models.unet import UNet as _U

    sched = _sched(T=50)
    unet = _U(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
              strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
              cond_emb_num_classes=2, deep_supervision=0, time_emb_dim=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 1), minval=-1, maxval=1)
    params = {"noise_estimator": unet.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32))["params"]}
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False, clip_x0=True)
    near = pipe.img2img(params, jax.random.PRNGKey(2), x, strength=0.1,
                        steps=10, eta=0.0)
    far = pipe.img2img(params, jax.random.PRNGKey(2), x, strength=1.0,
                       steps=10, eta=0.0)
    d_near = float(jnp.mean(jnp.abs(near - x)))
    d_far = float(jnp.mean(jnp.abs(far - x)))
    assert d_near < d_far
    with pytest.raises(ValueError):
        pipe.img2img(params, jax.random.PRNGKey(2), x, strength=1.5)
    with pytest.raises(ValueError, match="does not compose"):
        pipe.denoise(params, x, jax.random.PRNGKey(0), steps=4, start_idx=1,
                     known=x, mask=jnp.ones_like(x), resample_steps=2,
                     jump_length=2)


def test_helpers_img2img_cli(tmp_path):
    from medfusion_tpu.cli import helpers

    helpers.main(["img2img", "--preset", "smoke", "--steps", "4",
                  "--strength", "0.5", "--out", str(tmp_path)])
    assert (tmp_path / "img2img.png").exists()
