"""Exact-forward parity of models.unet_openai.UNetOpenAI vs the reference's
vendored SD/OpenAI UNet (external/stable_diffusion/unet_openai.py:413-744),
plus estimator-contract and remat checks.

The vendored package is torch-pure (torch + einops), so it is imported
directly as a synthetic package rooted at the reference directory.
"""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from medfusion_tpu.models.unet_openai import (
    UNetOpenAI,
    convert_openai_state_dict,
    sd_timestep_embedding,
)

REF_SD = "/root/reference/medical_diffusion/external/stable_diffusion"


def _ref_unet_module():
    if "refsd" not in sys.modules:
        pkg = types.ModuleType("refsd")
        pkg.__path__ = [REF_SD]
        sys.modules["refsd"] = pkg
    return importlib.import_module("refsd.unet_openai")


def _np_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _build_pair(**kw):
    """(torch UNetModel, flax UNetOpenAI, converted params) on one config."""
    m = _ref_unet_module()
    cfg = dict(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[2], dropout=0.0,
        channel_mult=(1, 2), conv_resample=True, dims=2, num_classes=None,
        num_heads=4, num_head_channels=-1, num_heads_upsample=-1,
        use_scale_shift_norm=False, resblock_updown=False,
        use_new_attention_order=False,
        use_spatial_transformer=False, transformer_depth=1, context_dim=None,
    )
    cfg.update(kw)
    torch.manual_seed(0)
    ref = m.UNetModel(**cfg).eval()

    flax_model = UNetOpenAI(
        in_channels=cfg["in_channels"], model_channels=cfg["model_channels"],
        out_channels=cfg["out_channels"], num_res_blocks=cfg["num_res_blocks"],
        attention_resolutions=tuple(cfg["attention_resolutions"]),
        dropout=cfg["dropout"], channel_mult=tuple(cfg["channel_mult"]),
        conv_resample=cfg["conv_resample"], spatial_dims=cfg["dims"],
        num_classes=cfg["num_classes"], num_heads=cfg["num_heads"],
        num_head_channels=cfg["num_head_channels"],
        num_heads_upsample=cfg["num_heads_upsample"],
        use_scale_shift_norm=cfg["use_scale_shift_norm"],
        resblock_updown=cfg["resblock_updown"],
        use_new_attention_order=cfg["use_new_attention_order"],
        use_spatial_transformer=cfg["use_spatial_transformer"],
        transformer_depth=cfg["transformer_depth"],
        context_dim=cfg["context_dim"],
    )
    params = convert_openai_state_dict(_np_state_dict(ref))
    return ref, flax_model, params


def _check_forward_parity(ref, flax_model, params, b=2, hw=16, tol=3e-5):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, ref.in_channels, hw, hw)).astype(np.float32)
    t = np.array([3, 250], dtype=np.int64)[:b]

    with torch.no_grad():
        y_ref, _ = ref(torch.from_numpy(x), torch.from_numpy(t))
    y_ref = y_ref.numpy()

    # Structure check: converted tree must exactly match an init tree.
    init = flax_model.init(jax.random.PRNGKey(0),
                           jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t))
    ref_paths = jax.tree_util.tree_structure(init["params"])
    got_paths = jax.tree_util.tree_structure(params)
    assert ref_paths == got_paths, f"param tree mismatch:\n{ref_paths}\nvs\n{got_paths}"
    jax.tree_util.tree_map(
        lambda a, b_: (_ for _ in ()).throw(
            AssertionError(f"shape {a.shape} vs {b_.shape}"))
        if a.shape != b_.shape else None,
        init["params"], params)

    y, y_ver = flax_model.apply({"params": params},
                                jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t))
    assert y_ver == []
    y = np.moveaxis(np.asarray(y), -1, 1)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=tol, rtol=0)


def test_timestep_embedding_matches_reference():
    m = _ref_unet_module()
    util = importlib.import_module("refsd.util")
    t = torch.tensor([0, 1, 17, 999], dtype=torch.float32)
    for dim in (32, 64, 30):
        ref = util.timestep_embedding(t, dim).numpy()
        got = np.asarray(sd_timestep_embedding(jnp.asarray(t.numpy()), dim))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_forward_parity_base():
    ref, model, params = _build_pair()
    _check_forward_parity(ref, model, params)


def test_forward_parity_scale_shift_resblock_updown_new_order():
    ref, model, params = _build_pair(
        use_scale_shift_norm=True, resblock_updown=True,
        num_head_channels=8, num_heads=-1, use_new_attention_order=True,
    )
    _check_forward_parity(ref, model, params)


def test_forward_parity_avgpool_downsample():
    ref, model, params = _build_pair(conv_resample=False,
                                     attention_resolutions=[1, 2])
    _check_forward_parity(ref, model, params)


def test_forward_parity_spatial_transformer_cross_attention():
    """use_spatial_transformer with context: exact parity vs the vendored
    SD SpatialTransformer path (attention.py:113-260)."""
    ref, model, params = _build_pair(
        use_spatial_transformer=True, transformer_depth=2, context_dim=16,
        attention_resolutions=[1, 2],
    )
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.array([3, 250], dtype=np.int64)
    ctx = rng.normal(size=(2, 5, 16)).astype(np.float32)

    with torch.no_grad():
        y_ref, _ = ref(torch.from_numpy(x), torch.from_numpy(t),
                       context=torch.from_numpy(ctx))
    y, _ = model.apply({"params": params},
                       jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t),
                       None, None, None, False, jnp.asarray(ctx))
    np.testing.assert_allclose(np.moveaxis(np.asarray(y), -1, 1),
                               y_ref.numpy(), atol=3e-5, rtol=0)
    # (context=None "falls back to self-attention" only type-checks when
    # context_dim == query_dim; with a distinct context_dim the vendored
    # torch model crashes on its own to_k shapes, so it is not parity-tested)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                  "spatial_v2"])
def test_encoder_unet_parity(pool):
    """EncoderUNetModel (the classifier half, unet_openai.py:747-961) exact
    forward parity on every pooling head."""
    from medfusion_tpu.models.unet_openai import EncoderUNetOpenAI

    m = _ref_unet_module()
    cfg = dict(image_size=16, in_channels=3, model_channels=32,
               out_channels=5, num_res_blocks=1, attention_resolutions=[2],
               channel_mult=(1, 2), num_heads=4,
               num_head_channels=(8 if pool == "attention" else -1),
               use_scale_shift_norm=True, resblock_updown=False, pool=pool)
    torch.manual_seed(0)
    ref = m.EncoderUNetModel(**cfg).eval()
    model = EncoderUNetOpenAI(
        image_size=16, in_channels=3, model_channels=32, out_channels=5,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, num_head_channels=(8 if pool == "attention" else -1),
        use_scale_shift_norm=True, pool=pool)
    params = convert_openai_state_dict(_np_state_dict(ref))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.array([3, 250], dtype=np.int64)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    init = model.init(jax.random.PRNGKey(0),
                      jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t))
    assert (jax.tree_util.tree_structure(init["params"])
            == jax.tree_util.tree_structure(params))
    y = model.apply({"params": params},
                    jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t))
    assert y.shape == y_ref.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-5, rtol=0)


def test_class_conditioning_and_cfg_mask():
    """The vendored reference force-disables labels (unet_openai.py:720) —
    a reference bug, so conditioning is validated by internal consistency:
    cond_mask=0 must reproduce the label-free embedding path."""
    model = UNetOpenAI(in_channels=2, model_channels=32, out_channels=2,
                       num_res_blocks=1, attention_resolutions=(),
                       channel_mult=(1, 2), num_classes=3, num_heads=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 2)),
                    jnp.float32)
    t = jnp.array([5, 9], jnp.int32)
    cond = jnp.array([1, 2], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    # every residual tail is zero-init (reference zero_module), so a fresh
    # init is embedding-independent — randomize all leaves to test the wiring
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, a.shape, a.dtype) * 0.1
         for k, a in zip(keys, leaves)])

    y_cond, _ = model.apply({"params": params}, x, t, cond)
    y_uncond, _ = model.apply({"params": params}, x, t, None)
    y_masked, _ = model.apply({"params": params}, x, t, cond,
                              None, jnp.zeros((2,)))
    assert not np.allclose(np.asarray(y_cond), np.asarray(y_uncond))
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_uncond),
                               atol=1e-6)


def test_remat_matches_and_grads_flow():
    kw = dict(in_channels=2, model_channels=32, out_channels=2,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_heads=4, use_scale_shift_norm=True,
              resblock_updown=True)
    model = UNetOpenAI(**kw)
    model_r = UNetOpenAI(**kw, remat=True)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 2)),
                    jnp.float32)
    t = jnp.array([1, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    # randomize past the zero-init heads so outputs/grads are non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, a.shape, a.dtype) * 0.1
         for k, a in zip(keys, leaves)])

    y, _ = model.apply({"params": params}, x, t)
    y_r, _ = model_r.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r), atol=1e-6)

    def loss(p):
        out, _ = model_r.apply({"params": p}, x, t)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    norms = jax.tree_util.tree_map(lambda a: float(jnp.abs(a).sum()), g)
    total = sum(jax.tree_util.tree_leaves(norms))
    assert np.isfinite(total) and total > 0


def test_3d_shape_smoke():
    model = UNetOpenAI(in_channels=1, model_channels=32, out_channels=1,
                       num_res_blocks=1, attention_resolutions=(),
                       channel_mult=(1, 2), spatial_dims=3, num_heads=4)
    x = jnp.zeros((1, 4, 8, 8, 1), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    y, _ = model.apply({"params": params}, x, t)
    # 3D down/upsampling touches only the inner two dims (D, 2H, 2W rule)
    assert y.shape == x.shape


def test_build_unet_estimator_families():
    """cli/presets.build_unet builds all three estimator families and each
    honors the shared estimator contract on the smoke preset shapes."""
    from medfusion_tpu.cli.presets import PRESETS, build_unet

    p = PRESETS["smoke"]
    z = jnp.zeros((2, *p.latent_shape), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.zeros((2,), jnp.int32)
    for family in ("unet", "unet_legacy", "openai", "lucidrains"):
        model = build_unet(p, family)
        params = model.init(jax.random.PRNGKey(0), z, t, cond)["params"]
        y, y_ver = model.apply({"params": params}, z, t, cond)
        assert y.shape == z.shape, family
        assert isinstance(y_ver, list), family
    with pytest.raises(ValueError):
        build_unet(p, "nope")


def test_pipeline_integration_train_step():
    """UNetOpenAI drops into the DiffusionPipeline + train step unchanged."""
    import optax

    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    unet = UNetOpenAI(in_channels=2, model_channels=32, out_channels=2,
                      num_res_blocks=1, attention_resolutions=(),
                      channel_mult=(1, 2), num_classes=2, num_heads=4)
    sched = GaussianDiffusionSchedule.create(
        timesteps=10, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False)

    b = 2
    z = jnp.zeros((b, 8, 8, 2), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), z, t, t)["params"]
    state = TrainState.create(params, optax.adamw(1e-4), use_ema=True)
    step = make_diffusion_train_step(pipe, donate=False)

    batch = {"source": jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, z.shape), jnp.float32),
        "target": jnp.zeros((b,), jnp.int32)}
    state, metrics = step(state, None, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
