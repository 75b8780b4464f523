"""Latent embedder semantics: shapes, KL, VQ straight-through, roundtrips."""

import numpy as np
import jax
import jax.numpy as jnp

from medfusion_tpu.models.latent_embedders import (
    VAE,
    VQVAE,
    Discriminator,
    NLayerDiscriminator,
    VectorQuantizer,
    diagonal_gaussian,
)

KEY = jax.random.PRNGKey(0)


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


def test_diagonal_gaussian_kl_matches_closed_form():
    x = rand((4, 2, 2, 8), seed=1)
    z, kl = diagonal_gaussian(x, jax.random.PRNGKey(1))
    mean, logvar = np.split(np.asarray(x), 2, axis=-1)
    logvar = np.clip(logvar, -30, 20)
    expected = 0.5 * np.sum(mean**2 + np.exp(logvar) - 1 - logvar) / 4
    assert z.shape == (4, 2, 2, 4)
    np.testing.assert_allclose(float(kl), expected, rtol=1e-5)
    # deterministic path returns the mean
    z_det, _ = diagonal_gaussian(x, None, sample=False)
    np.testing.assert_allclose(np.asarray(z_det), mean, rtol=1e-6)


def test_vector_quantizer_lookup_and_straight_through():
    vq = VectorQuantizer(num_embeddings=16, emb_channels=4)
    z = rand((2, 3, 3, 4), seed=2)
    params = vq.init(KEY, z)["params"]
    z_q, loss = vq.apply({"params": params}, z)
    # nearest codebook entry by L2, checked against numpy
    cb = np.asarray(params["codebook"])
    flat = np.asarray(z).reshape(-1, 4)
    idx = np.argmin(((flat[:, None, :] - cb[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_allclose(np.asarray(z_q).reshape(-1, 4), cb[idx], rtol=1e-4, atol=1e-6)
    # straight-through: dz_q/dz == identity
    g = jax.grad(lambda zz: jnp.sum(vq.apply({"params": params}, zz)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), rtol=1e-6)
    assert float(loss) >= 0


def test_vae_forward_shapes_and_deep_supervision():
    m = VAE(in_channels=3, out_channels=3, emb_channels=4,
            hid_chs=(8, 16, 32, 64), deep_supervision=1,
            norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    x = rand((2, 32, 32, 3), seed=3)
    variables = m.init({"params": KEY, "sample": KEY}, x)
    pred, pred_ver, kl = m.apply(variables, x, rngs={"sample": jax.random.PRNGKey(7)})
    assert pred.shape == x.shape
    assert len(pred_ver) == 1 and pred_ver[0].shape == (2, 16, 16, 3)
    assert np.isfinite(float(kl))
    # zero-init out conv => initial pred must be exactly zero
    np.testing.assert_allclose(np.asarray(pred), 0.0)

    z = m.apply(variables, x, method=m.encode, rngs={"sample": jax.random.PRNGKey(8)})
    assert z.shape == (2, 4, 4, 4)  # 32 / 2^3 spatial, emb_channels
    dec = m.apply(variables, z, method=m.decode)
    assert dec.shape == x.shape


def test_vqvae_forward_and_encode_decode():
    m = VQVAE(in_channels=1, out_channels=1, emb_channels=4, num_embeddings=32,
              hid_chs=(8, 16, 32), strides=(1, 2, 2), kernel_sizes=(3, 3, 3),
              norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    x = rand((2, 16, 16, 1), seed=4)
    variables = m.init(KEY, x)
    pred, pred_ver, emb_loss = m.apply(variables, x)
    assert pred.shape == x.shape and pred_ver == []
    assert float(emb_loss) >= 0
    z = m.apply(variables, x, method=m.encode)
    assert z.shape == (2, 4, 4, 4)
    dec = m.apply(variables, z, method=m.decode)
    assert dec.shape == x.shape


def test_discriminator_shapes():
    d = Discriminator(spatial_dims=2, hid_chs=(8, 16, 32),
                      kernel_sizes=(3, 3, 3), strides=(1, 2, 2),
                      norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    x = rand((2, 32, 32, 3), seed=5)
    params = d.init(KEY, x)["params"]
    y = d.apply({"params": params}, x)
    assert y.shape == (2, 8, 8, 1)
    # zero-init head => exactly zero at init
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_nlayer_discriminator_shapes():
    d = NLayerDiscriminator(spatial_dims=2, hid_chs=(8, 16, 32),
                            kernel_sizes=(4, 4, 4), strides=(2, 2, 1))
    x = rand((2, 32, 32, 3), seed=6)
    variables = d.init(KEY, x, train=True)
    y = d.apply(variables, x, train=False)
    assert y.shape[0] == 2 and y.shape[-1] == 1


def test_vae_3d_forward():
    m = VAE(in_channels=1, out_channels=1, spatial_dims=3, emb_channels=2,
            hid_chs=(4, 8), strides=(1, 2), kernel_sizes=(3, 3),
            norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = rand((1, 8, 8, 8, 1), seed=7)
    variables = m.init({"params": KEY, "sample": KEY}, x)
    pred, _, kl = m.apply(variables, x, rngs={"sample": KEY})
    assert pred.shape == x.shape
