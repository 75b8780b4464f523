"""Composed-network numerical parity vs torch mirrors with reference-exact
state_dict naming: export flax params -> strict load into the torch mirror ->
identical forwards. This validates (a) the weight converter's key naming,
(b) tensor layouts, and (c) the composed VAE/UNet wiring in one shot."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from medfusion_tpu.models.latent_embedders import VAE
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.utils import torch_compat as TC
from tests import torch_mirror as M
from tests.torch_oracles import nchw, nhwc

KEY = jax.random.PRNGKey(0)


def _randomize(params, seed=0):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.2) for l in leaves],
    )


def test_vae_full_parity_vs_torch_mirror():
    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8, 16),
              strides=(1, 2, 2), kernel_sizes=(3, 3, 3), deep_supervision=1,
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
    params = _randomize(vae.init({"params": KEY, "sample": KEY}, jnp.asarray(x))["params"])

    pred, pred_ver, _ = vae.apply({"params": params}, jnp.asarray(x), sample=False)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in TC.to_torch_state_dict(params, kind="vae").items()}
    mirror = M.VAE(cin=1, emb_ch=2, hid=(4, 8, 16), norm_groups=2, ds=1)
    missing, unexpected = mirror.load_state_dict(sd, strict=True).missing_keys, []
    with torch.no_grad():
        t_pred, t_ver = mirror(nchw(x))
    np.testing.assert_allclose(np.asarray(pred), nhwc(t_pred), rtol=1e-4, atol=1e-5)
    assert len(pred_ver) == len(t_ver) == 1
    np.testing.assert_allclose(np.asarray(pred_ver[0]), nhwc(t_ver[0]), rtol=1e-4, atol=1e-5)


def test_unet2_full_parity_vs_torch_mirror():
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

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in TC.to_torch_state_dict(params, kind="unet").items()}
    mirror = M.UNet2(cin=2, cout=2, hid=(8, 16, 32), norm_groups=4,
                     emb_dim=32, num_classes=2, nrb=2, ds=1)
    mirror.load_state_dict(sd, strict=True)
    with torch.no_grad():
        t_y, t_ver = mirror(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=2e-4, atol=2e-5)
    assert len(y_ver) == len(t_ver) == 1
    np.testing.assert_allclose(np.asarray(y_ver[0]), nhwc(t_ver[0]), rtol=2e-4, atol=2e-5)


def test_unet2_linear_attention_parity_vs_torch_mirror():
    """The attention path: unet2 with attention='linear' runs cross-attention
    against the time+label embedding token at every level."""
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
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in TC.to_torch_state_dict(params, kind="unet").items()}
    mirror = M.UNet2Attn(cin=2, cout=2, hid=(8, 16, 32), norm_groups=4,
                         emb_dim=32, num_classes=2, nrb=2, ds=0)
    mirror.load_state_dict(sd, strict=True)
    with torch.no_grad():
        t_y, _ = mirror(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=3e-4, atol=3e-5)


def test_unet2_spatial_transformer_parity_vs_torch_mirror():
    """Spatial-transformer path: norm -> 1x1 proj -> self+cross attention +
    GEGLU MLP -> 1x1 proj, at every level (attention_blocks.py:233-288)."""
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
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in TC.to_torch_state_dict(params, kind="unet").items()}
    mirror = M.UNet2Spatial(cin=2, cout=2, hid=(8, 16), norm_groups=4,
                            emb_dim=32, num_classes=2, nrb=2, ds=0)
    mirror.load_state_dict(sd, strict=True)
    with torch.no_grad():
        t_y, _ = mirror(nchw(x), torch.from_numpy(t), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(y), nhwc(t_y), rtol=3e-4, atol=3e-5)
