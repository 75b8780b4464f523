"""Exact-forward parity of models.unet_diffusers.UNet2DConditionDiffusers vs
the reference's vendored diffusers conditional UNet
(external/diffusers/unet.py:42-257)."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

from medfusion_tpu.models.unet_diffusers import (
    UNet2DConditionDiffusers,
    convert_diffusers_unet_state_dict,
    diffusers_timestep_embedding,
)

REF_DIR = "/root/reference/medical_diffusion/external/diffusers"


def _ref_unet_module():
    if "refdif.unet" in sys.modules:
        return sys.modules["refdif.unet"]
    if "refdif" not in sys.modules:
        pkg = types.ModuleType("refdif")
        pkg.__path__ = [REF_DIR]
        sys.modules["refdif"] = pkg
    return importlib.import_module("refdif.unet")


def _build_pair(**kw):
    m = _ref_unet_module()
    cfg = dict(
        in_channels=3, out_channels=3,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1,
        norm_num_groups=32, norm_eps=1e-5,
        cross_attention_dim=16, attention_head_dim=8,
    )
    cfg.update(kw)
    torch.manual_seed(0)
    ref = m.UNet2DConditionModel(**cfg).eval()
    model = UNet2DConditionDiffusers(**{k: v for k, v in cfg.items()})
    params = convert_diffusers_unet_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    return ref, model, params


def test_timestep_embedding_matches():
    m = _ref_unet_module()
    emb_mod = sys.modules["refdif.embeddings"]
    t = torch.tensor([0, 1, 17, 999], dtype=torch.float32)
    for dim in (32, 64):
        ref = emb_mod.get_timestep_embedding(
            t, dim, flip_sin_to_cos=True, downscale_freq_shift=0).numpy()
        got = np.asarray(diffusers_timestep_embedding(
            jnp.asarray(t.numpy()), dim))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_forward_parity_cross_attention_unet():
    ref, model, params = _build_pair()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.array([3, 250], dtype=np.int64)
    labels = np.array([[0], [1]], dtype=np.int64)  # [B, 1] context tokens

    with torch.no_grad():
        y_ref, ver = ref(torch.from_numpy(x), torch.from_numpy(t),
                         encoder_hidden_states=torch.from_numpy(labels))
    assert ver == []
    y_ref = y_ref.numpy()

    x_j = jnp.asarray(np.moveaxis(x, 1, -1))
    init = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t),
                      jnp.asarray(labels))["params"]
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(params))
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")), init, params)

    y, y_ver = model.apply({"params": params}, x_j, jnp.asarray(t),
                           jnp.asarray(labels))
    assert y_ver == []
    np.testing.assert_allclose(np.moveaxis(np.asarray(y), -1, 1), y_ref,
                               atol=3e-5, rtol=0)


def test_forward_parity_three_levels_two_layers():
    ref, model, params = _build_pair(
        down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                          "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                        "CrossAttnUpBlock2D"),
        block_out_channels=(32, 32, 64), layers_per_block=2, in_channels=1,
        out_channels=1)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)
    t = np.array([7, 77], dtype=np.int64)
    labels = np.array([[1], [0]], dtype=np.int64)

    with torch.no_grad():
        y_ref, _ = ref(torch.from_numpy(x), torch.from_numpy(t),
                       encoder_hidden_states=torch.from_numpy(labels))
    y, _ = model.apply({"params": params},
                       jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t),
                       jnp.asarray(labels))
    np.testing.assert_allclose(np.moveaxis(np.asarray(y), -1, 1),
                               y_ref.numpy(), atol=5e-5, rtol=0)


def test_pipeline_contract_with_1d_labels_and_cfg_mask():
    """1-D labels become one context token; cond_mask zeroes the context —
    the estimator drops into DiffusionPipeline's batched-CFG machinery."""
    import optax

    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    model = UNet2DConditionDiffusers(
        in_channels=2, out_channels=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 2)),
                    jnp.float32)
    t = jnp.array([1, 5], jnp.int32)
    cond = jnp.array([0, 1], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    # randomize so outputs are label-sensitive (conv_out is torch-init, fine)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, a.shape, a.dtype) * 0.1
                  for k, a in zip(keys, leaves)])

    y_cond, _ = model.apply({"params": params}, x, t, cond)
    y_masked, _ = model.apply({"params": params}, x, t, cond, None,
                              jnp.zeros((2,)))
    y_masked2, _ = model.apply({"params": params}, x, t,
                               jnp.zeros((2,), jnp.int32), None,
                               jnp.zeros((2,)))
    assert not np.allclose(np.asarray(y_cond), np.asarray(y_masked))
    # masked context is label-independent
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_masked2),
                               atol=1e-6)

    sched = GaussianDiffusionSchedule.create(
        timesteps=10, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=model,
                             latent_embedder=None, do_input_centering=False,
                             classifier_free_guidance_dropout=0.5)
    state = TrainState.create(params, optax.adamw(1e-4))
    step = make_diffusion_train_step(pipe, donate=False)
    batch = {"source": x, "target": cond}
    state, metrics = step(state, None, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
