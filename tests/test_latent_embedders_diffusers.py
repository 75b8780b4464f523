"""Exact-forward parity of the diffusers-family latent embedders vs the
reference's vendored diffusers VAE stack (external/diffusers/vae.py).

The vendored module imports ``medical_diffusion.models.BasicModel``
(lightning) and ``torchvision`` — both absent here and only needed by the
Lightning *wrappers*; the plain nn.Module classes (Encoder, Decoder,
AutoencoderKL, VQModel) are loaded with those imports stubbed."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

from medfusion_tpu.models.latent_embedders_diffusers import (
    AutoencoderKLDiffusers,
    VQModelDiffusers,
    convert_diffusers_vae_state_dict,
)

REF_DIR = "/root/reference/medical_diffusion/external/diffusers"


def _ref_vae_module():
    if "refdif.vae" in sys.modules:
        return sys.modules["refdif.vae"]
    # stub lightning + torchvision dependencies of the wrappers; BasicModel
    # must swallow the (optimizer, ..., loss_kwargs) super().__init__ args
    class _StubBasicModel(torch.nn.Module):
        def __init__(self, *args, **kwargs):
            super().__init__()

    md = types.ModuleType("medical_diffusion")
    md_models = types.ModuleType("medical_diffusion.models")
    md_models.BasicModel = _StubBasicModel
    md.models = md_models
    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.save_image = lambda *a, **k: None
    tv.utils = tv_utils
    for name, mod in [("medical_diffusion", md),
                      ("medical_diffusion.models", md_models),
                      ("torchvision", tv), ("torchvision.utils", tv_utils)]:
        sys.modules.setdefault(name, mod)
    pkg = types.ModuleType("refdif")
    pkg.__path__ = [REF_DIR]
    sys.modules["refdif"] = pkg
    return importlib.import_module("refdif.vae")


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def _nchw(y):
    return np.moveaxis(np.asarray(y), -1, 1)


def _assert_tree_matches(model, params, init_args, rngs=None):
    init = model.init(rngs or jax.random.PRNGKey(0), *init_args)["params"]
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(params)), (
        f"param trees differ:\n{sorted(jax.tree_util.tree_flatten_with_path(init)[0][i][0] for i in range(len(jax.tree_util.tree_leaves(init))))}")
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")), init, params)


def test_autoencoder_kl_parity():
    m = _ref_vae_module()
    torch.manual_seed(0)
    ref = m.AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(32, 32, 64), layers_per_block=1,
        latent_channels=4, norm_num_groups=32,
    ).eval()

    model = AutoencoderKLDiffusers(
        in_channels=3, out_channels=3, emb_channels=4,
        block_out_channels=(32, 32, 64), layers_per_block=1,
        norm_num_groups=32)
    params = convert_diffusers_vae_state_dict(_np_sd(ref))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    _assert_tree_matches(model, params, (_nhwc(x),), rngs=rngs)

    with torch.no_grad():
        posterior = ref.encode(torch.from_numpy(x))
        z_mode = posterior.mode()
        dec_ref = ref.decode(z_mode).numpy()
        kl_ref = float(posterior.kl())

    # deterministic path: mode == mean, KL from the same moments
    dec, ver, kl = model.apply({"params": params}, _nhwc(x), False, False)
    assert ver == []
    np.testing.assert_allclose(_nchw(dec), dec_ref, atol=3e-5, rtol=0)
    np.testing.assert_allclose(float(kl), kl_ref, rtol=1e-5)

    # encode/decode round trip (mode) matches too
    z = model.apply({"params": params}, _nhwc(x), False, False,
                    method=model.encode)
    np.testing.assert_allclose(_nchw(z), z_mode.numpy(), atol=2e-5, rtol=0)


def test_vq_model_parity():
    m = _ref_vae_module()
    torch.manual_seed(1)
    ref = m.VQModel(
        in_channels=1, out_channels=1,
        down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",),
        block_out_channels=(32, 64), layers_per_block=1,
        latent_channels=4, num_vq_embeddings=128, norm_num_groups=32,
    ).eval()

    model = VQModelDiffusers(
        in_channels=1, out_channels=1, emb_channels=4, num_embeddings=128,
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=32)
    params = convert_diffusers_vae_state_dict(_np_sd(ref))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)
    _assert_tree_matches(model, params, (_nhwc(x),))

    with torch.no_grad():
        dec_ref, emb_loss_ref = ref(torch.from_numpy(x))

    dec, ver, emb_loss = model.apply({"params": params}, _nhwc(x))
    assert ver == []
    np.testing.assert_allclose(_nchw(dec), dec_ref.numpy(), atol=3e-5, rtol=0)
    np.testing.assert_allclose(float(emb_loss), float(emb_loss_ref), rtol=1e-4)


def test_contract_with_ae_train_step_and_pipeline():
    """The diffusers family drives the same AE train step and serves as the
    frozen latent embedder of a DiffusionPipeline."""
    import optax

    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.models.unet import UNet
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
    from medfusion_tpu.train import (
        TrainState,
        make_autoencoder_train_step,
        make_diffusion_train_step,
    )
    from medfusion_tpu.train.autoencoder import AutoencoderTrainer

    ae = AutoencoderKLDiffusers(in_channels=1, out_channels=1, emb_channels=2,
                                block_out_channels=(8, 16),
                                layers_per_block=1, norm_num_groups=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 1)),
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    ae_params = ae.init(rngs, x)["params"]

    state = TrainState.create(ae_params, optax.adam(1e-4))
    trainer = AutoencoderTrainer(autoencoder=ae, flavor="vae", pixel_loss="l2",
                                 embedding_loss_weight=1e-6)
    ae_step = make_autoencoder_train_step(trainer, donate=False)
    state, metrics = ae_step(state, None, {"source": x}, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), deep_supervision=0, use_attention="none",
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    sched = GaussianDiffusionSchedule.create(timesteps=10,
                                             schedule_strategy="scaled_linear",
                                             beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=ae, do_input_centering=False)
    z = jnp.zeros((2, 8, 8, 2), jnp.float32)
    t0 = jnp.zeros((2,), jnp.int32)
    unet_params = unet.init(jax.random.PRNGKey(3), z, t0)["params"]
    dstate = TrainState.create(unet_params, optax.adamw(1e-4))
    dstep = make_diffusion_train_step(pipe, donate=False)
    dstate, dmetrics = dstep(dstate, state.params, {"source": x},
                             jax.random.PRNGKey(4))
    assert np.isfinite(float(dmetrics["loss"]))
