"""Exact-forward parity of models.unet_lucidrains.UNetLucidrains vs the
reference's vendored lucidrains DDPM UNet
(external/unet_lucidrains.py:205-332). The vendored file is torch-pure
(torch + einops) and importable directly."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from medfusion_tpu.models.unet_lucidrains import (
    UNetLucidrains,
    convert_lucidrains_state_dict,
)

REF_PATH = "/root/reference/medical_diffusion/external/unet_lucidrains.py"


def _ref_module():
    if "ref_lucid" not in sys.modules:
        spec = importlib.util.spec_from_file_location("ref_lucid", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_lucid"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_lucid"]


def _build_pair(**kw):
    m = _ref_module()
    cfg = dict(dim=32, dim_mults=(1, 2), channels=3, self_condition=False,
               resnet_block_groups=8, learned_variance=False,
               learned_sinusoidal_cond=False, learned_sinusoidal_dim=16)
    cfg.update(kw)
    torch.manual_seed(0)
    ref = m.UNet(**cfg).eval()
    model = UNetLucidrains(**cfg)
    params = convert_lucidrains_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    return ref, model, params


def _check_parity(ref, model, params, self_cond=False, tol=2e-5):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, ref.channels, 16, 16)).astype(np.float32)
    t = np.array([7, 421], dtype=np.int64)
    sc = (rng.normal(size=x.shape).astype(np.float32) if self_cond else None)

    with torch.no_grad():
        y_ref, ver = ref(torch.from_numpy(x), torch.from_numpy(t),
                         self_cond=None if sc is None else torch.from_numpy(sc))
    assert ver == []
    y_ref = y_ref.numpy()

    x_j = jnp.asarray(np.moveaxis(x, 1, -1))
    sc_j = None if sc is None else jnp.asarray(np.moveaxis(sc, 1, -1))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t),
                      None, sc_j)["params"]
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(params)), (
        f"param trees differ:\n{jax.tree_util.tree_structure(init)}\n"
        f"vs\n{jax.tree_util.tree_structure(params)}")
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")), init, params)

    y, y_ver = model.apply({"params": params}, x_j, jnp.asarray(t), None, sc_j)
    assert y_ver == []
    y = np.moveaxis(np.asarray(y), -1, 1)
    np.testing.assert_allclose(y, y_ref, atol=tol, rtol=0)


def test_parity_base():
    ref, model, params = _build_pair()
    _check_parity(ref, model, params)


def test_parity_learned_sinusoidal_self_cond_learned_variance():
    ref, model, params = _build_pair(self_condition=True,
                                     learned_sinusoidal_cond=True,
                                     learned_variance=True)
    _check_parity(ref, model, params, self_cond=True)


def test_parity_three_levels():
    ref, model, params = _build_pair(dim_mults=(1, 2, 4), channels=1)
    _check_parity(ref, model, params)


def test_pipeline_contract():
    """Drops into DiffusionPipeline: train step + short DDIM sample."""
    import optax

    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    unet = UNetLucidrains(dim=16, dim_mults=(1, 2), channels=2,
                          resnet_block_groups=4)
    sched = GaussianDiffusionSchedule.create(
        timesteps=10, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False)
    b = 2
    z = jnp.zeros((b, 8, 8, 2), jnp.float32)
    t0 = jnp.zeros((b,), jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), z, t0)["params"]
    state = TrainState.create(params, optax.adamw(1e-3), use_ema=False)
    step = make_diffusion_train_step(pipe, donate=False)
    batch = {"source": jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, z.shape), jnp.float32)}
    state, metrics = step(state, None, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    imgs = pipe.sample({"noise_estimator": state.params},
                       jax.random.PRNGKey(2), num_samples=2,
                       img_size=(8, 8, 2), steps=5, use_ddim=True)
    assert np.isfinite(np.asarray(imgs)).all()
