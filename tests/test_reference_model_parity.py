"""Composed-network numerical parity vs the REFERENCE'S OWN torch code.

Unlike :mod:`tests.test_full_model_parity` (which grades against a
builder-written mirror), these tests load the real
`/root/reference/medical_diffusion` model modules — `estimators/unet2.py`,
`embedders/latent_embedders.py`, `utils/conv_blocks.py`,
`utils/attention_blocks.py` — executed unmodified through the MONAI/Lightning
shim (:mod:`tests._monai_shim`), then:

  flax params -> torch_compat converter -> STRICT state_dict load into the
  reference class -> identical forwards (max|Δ| <= 1e-4 rtol fp32).

A strict load proves the converter's key naming matches the reference's
actual module tree; the forward comparison proves layouts and wiring.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from medfusion_tpu.models.latent_embedders import VAE, VQVAE
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.utils import torch_compat as TC
from tests._monai_shim import reference_models
from tests.torch_oracles import nchw, nhwc

KEY = jax.random.PRNGKey(0)
R = reference_models()


def _randomize(params, seed=0):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.2) for l in leaves],
    )


def _as_torch_sd(params, kind):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in TC.to_torch_state_dict(params, kind=kind).items()}


def _ref_unet(**overrides):
    kwargs = dict(
        in_ch=2, out_ch=2, spatial_dims=2, hid_chs=[8, 16, 32],
        kernel_sizes=[3, 3, 3], strides=[1, 2, 2],
        norm_name=("GROUP", {"num_groups": 4, "affine": True}),
        time_embedder=R.time_embedder.TimeEmbbeding,
        time_embedder_kwargs={"emb_dim": 32},
        cond_embedder=R.cond_embedders.LabelEmbedder,
        cond_embedder_kwargs={"emb_dim": 32, "num_classes": 2},
        deep_supervision=1, use_res_block=True, use_attention="none",
    )
    kwargs.update(overrides)
    return R.UNet(**kwargs)


def test_vae_forward_parity_vs_reference_code():
    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8, 16),
              strides=(1, 2, 2), kernel_sizes=(3, 3, 3), deep_supervision=1,
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
    params = _randomize(vae.init({"params": KEY, "sample": KEY}, jnp.asarray(x))["params"])
    pred, pred_ver, _ = vae.apply({"params": params}, jnp.asarray(x), sample=False)

    ref = R.VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=[4, 8, 16],
                strides=[1, 2, 2], kernel_sizes=[3, 3, 3], deep_supervision=1,
                perceiver=None,
                norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    ref.load_state_dict(_as_torch_sd(params, "vae"), strict=True)
    ref.eval()
    with torch.no_grad():
        # reference VAE.forward samples the posterior; drive the identical
        # deterministic path (z = mu) through the reference's own submodules
        # with the forward's exact decoder loop (latent_embedders.py:780-789):
        h = ref.inc(nchw(x))
        for enc in ref.encoders:
            h = enc(h)
        mu = ref.out_enc(h).chunk(2, dim=1)[0]  # mode of the diagonal Gaussian
        h = ref.inc_dec(mu)
        t_ver = []
        for i in range(len(ref.decoders) - 1, -1, -1):
            if i < len(ref.outc_ver):
                t_ver.append(ref.outc_ver[i](h))
            h = ref.decoders[i](h)
        t_pred = ref.outc(h)
        t_ver = t_ver[::-1]
    np.testing.assert_allclose(np.asarray(pred), nhwc(t_pred), rtol=1e-4, atol=1e-5)
    assert len(pred_ver) == len(t_ver) == 1
    np.testing.assert_allclose(np.asarray(pred_ver[0]), nhwc(t_ver[0]), rtol=1e-4, atol=1e-5)


def test_vae_full_forward_parity_vs_reference_code_with_injected_noise():
    """The complete reference VAE.forward (posterior SAMPLING path, incl. its
    KL emb_loss): recover the exact eps the torch reparam drew and push it
    through our reparam formula manually."""
    from medfusion_tpu.models.latent_embedders import diagonal_gaussian

    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8),
              strides=(1, 2), kernel_sizes=(3, 3), deep_supervision=0,
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = np.random.default_rng(8).uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    params = _randomize(vae.init({"params": KEY, "sample": KEY}, jnp.asarray(x))["params"], seed=9)

    ref = R.VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=[4, 8],
                strides=[1, 2], kernel_sizes=[3, 3], deep_supervision=0,
                perceiver=None,
                norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    ref.load_state_dict(_as_torch_sd(params, "vae"), strict=True)
    ref.eval()
    torch.manual_seed(1234)
    with torch.no_grad():
        t_pred, t_ver, t_emb_loss = ref(nchw(x))
    # Recover the exact eps: the reparam's randn is the first (only) RNG draw.
    with torch.no_grad():
        h = ref.inc(nchw(x))
        for enc in ref.encoders:
            h = enc(h)
        mu_t, logvar_t = ref.out_enc(h).chunk(2, dim=1)
    torch.manual_seed(1234)
    eps = nhwc(torch.randn(mu_t.shape))

    moments = vae.apply({"params": params}, jnp.asarray(x), False, method=VAE._moments)
    _, kl = diagonal_gaussian(moments, None, sample=False)  # KL is noise-free
    mu, logvar = np.split(np.asarray(moments), 2, axis=-1)
    logvar = np.clip(logvar, -30.0, 20.0)
    z = jnp.asarray(mu + np.exp(0.5 * logvar) * eps)
    pred = vae.apply({"params": params}, z, method=VAE.decode)
    np.testing.assert_allclose(np.asarray(pred), nhwc(t_pred), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(kl), float(t_emb_loss), rtol=1e-4)


def test_unet2_forward_parity_vs_reference_code():
    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16, 32), kernel_sizes=(3, 3, 3),
                strides=(1, 2, 2), time_emb_dim=32, cond_emb_num_classes=2,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=1, use_attention="none")
    x = np.random.default_rng(2).standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([3, 7], np.int64)
    c = np.asarray([0, 1], np.int64)
    params = _randomize(
        unet.init(KEY, jnp.asarray(x), jnp.asarray(t, dtype=jnp.int32),
                  jnp.asarray(c, dtype=jnp.int32))["params"], seed=3)
    y, y_ver = unet.apply({"params": params}, jnp.asarray(x),
                          jnp.asarray(t, dtype=jnp.int32), jnp.asarray(c, dtype=jnp.int32))

    ref = _ref_unet()
    ref.load_state_dict(_as_torch_sd(params, "unet"), strict=True)
    ref.eval()
    with torch.no_grad():
        t_y, t_ver = ref(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=2e-4, atol=2e-5)
    assert len(y_ver) == len(t_ver) == 1
    np.testing.assert_allclose(np.asarray(y_ver[0]), nhwc(t_ver[0]), rtol=2e-4, atol=2e-5)


def test_unet2_linear_attention_parity_vs_reference_code():
    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16, 32), kernel_sizes=(3, 3, 3),
                strides=(1, 2, 2), time_emb_dim=32, cond_emb_num_classes=2,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="linear")
    x = np.random.default_rng(4).standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([2, 9], np.int64)
    c = np.asarray([1, 0], np.int64)
    params = _randomize(
        unet.init(KEY, jnp.asarray(x), jnp.asarray(t, dtype=jnp.int32),
                  jnp.asarray(c, dtype=jnp.int32))["params"], seed=5)
    y, _ = unet.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(t, dtype=jnp.int32), jnp.asarray(c, dtype=jnp.int32))

    ref = _ref_unet(deep_supervision=0, use_attention="linear")
    ref.load_state_dict(_as_torch_sd(params, "unet"), strict=True)
    ref.eval()
    with torch.no_grad():
        t_y, _ = ref(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=3e-4, atol=3e-5)


def test_unet2_spatial_attention_parity_vs_reference_code():
    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), time_emb_dim=32, cond_emb_num_classes=2,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="spatial")
    x = np.random.default_rng(6).standard_normal((2, 8, 8, 2)).astype(np.float32)
    t = np.asarray([1, 4], np.int64)
    c = np.asarray([0, 1], np.int64)
    params = _randomize(
        unet.init(KEY, jnp.asarray(x), jnp.asarray(t, dtype=jnp.int32),
                  jnp.asarray(c, dtype=jnp.int32))["params"], seed=7)
    y, _ = unet.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(t, dtype=jnp.int32), jnp.asarray(c, dtype=jnp.int32))

    ref = _ref_unet(hid_chs=[8, 16], kernel_sizes=[3, 3], strides=[1, 2],
                    deep_supervision=0, use_attention="spatial")
    ref.load_state_dict(_as_torch_sd(params, "unet"), strict=True)
    ref.eval()
    with torch.no_grad():
        t_y, _ = ref(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=3e-4, atol=3e-5)


def test_unet_legacy_forward_parity_vs_reference_code():
    """The LEGACY estimator family (estimators/unet.py:15-176) against the
    reference's own code — previously only shape/smoke-tested. Covers the
    emb-injected DownBlock/UpBlock path with additive skips and the
    UnetOutBlock deep-supervision heads."""
    from medfusion_tpu.models.unet_legacy import UNetLegacy

    unet = UNetLegacy(in_ch=2, out_ch=2, hid_chs=(8, 16, 32), kernel_sizes=(1, 3, 3),
                      strides=(1, 2, 2), time_emb_dim=32, cond_emb_num_classes=2,
                      norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                      deep_supervision=1, use_attention="none")
    x = np.random.default_rng(12).standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([4, 8], np.int64)
    c = np.asarray([1, 0], np.int64)
    params = _randomize(
        unet.init(KEY, jnp.asarray(x), jnp.asarray(t, dtype=jnp.int32),
                  jnp.asarray(c, dtype=jnp.int32))["params"], seed=13)
    y, y_ver = unet.apply({"params": params}, jnp.asarray(x),
                          jnp.asarray(t, dtype=jnp.int32), jnp.asarray(c, dtype=jnp.int32))

    ref = R.UNetLegacy(
        in_ch=2, out_ch=2, spatial_dims=2, hid_chs=[8, 16, 32],
        kernel_sizes=[1, 3, 3], strides=[1, 2, 2],
        norm_name=("GROUP", {"num_groups": 4, "affine": True}),
        time_embedder=R.time_embedder.TimeEmbbeding,
        time_embedder_kwargs={"emb_dim": 32},
        cond_embedder=R.cond_embedders.LabelEmbedder,
        cond_embedder_kwargs={"emb_dim": 32, "num_classes": 2},
        deep_supervision=1, use_res_block=True, use_attention="none")
    ref.load_state_dict(_as_torch_sd(params, "unet"), strict=True)
    ref.eval()
    with torch.no_grad():
        t_y, t_ver = ref(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=2e-4, atol=2e-5)
    assert len(y_ver) == len(t_ver) == 1
    np.testing.assert_allclose(np.asarray(y_ver[0]), nhwc(t_ver[0]), rtol=2e-4, atol=2e-5)


def test_discriminator_forward_parity_vs_reference_code():
    """The conv-stack GAN Discriminator (latent_embedders.py:76-131) against
    the reference's own class (2D flavor)."""
    from medfusion_tpu.models.latent_embedders import Discriminator

    disc = Discriminator(spatial_dims=2, hid_chs=(8, 16), kernel_sizes=(3, 3),
                         strides=(1, 2),
                         norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    x = np.random.default_rng(14).standard_normal((2, 16, 16, 1)).astype(np.float32)
    params = _randomize(disc.init(KEY, jnp.asarray(x))["params"], seed=15)
    y = disc.apply({"params": params}, jnp.asarray(x))

    ref = R.Discriminator(in_channels=1, spatial_dims=2, hid_chs=[8, 16],
                          kernel_sizes=[3, 3], strides=[1, 2],
                          norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    ref.load_state_dict(_as_torch_sd(params, "vae"), strict=True)
    ref.eval()
    with torch.no_grad():
        t_y = ref(nchw(x))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=2e-4, atol=2e-5)


def test_vqvae_forward_parity_vs_reference_code():
    vq = VQVAE(in_channels=1, out_channels=1, emb_channels=2, num_embeddings=16,
               hid_chs=(4, 8), strides=(1, 2), kernel_sizes=(3, 3),
               deep_supervision=0,
               norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = np.random.default_rng(10).uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    params = _randomize(vq.init({"params": KEY}, jnp.asarray(x))["params"], seed=11)
    pred, pred_ver, emb_loss = vq.apply({"params": params}, jnp.asarray(x))

    ref = R.VQVAE(in_channels=1, out_channels=1, emb_channels=2, num_embeddings=16,
                  hid_chs=[4, 8], strides=[1, 2], kernel_sizes=[3, 3],
                  deep_supervision=0, perceiver=None,
                  norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    ref.load_state_dict(_as_torch_sd(params, "vqvae"), strict=True)
    ref.eval()
    with torch.no_grad():
        t_pred, t_ver, t_emb_loss = ref(nchw(x))
    np.testing.assert_allclose(np.asarray(pred), nhwc(t_pred), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(emb_loss), float(t_emb_loss), rtol=1e-4)
