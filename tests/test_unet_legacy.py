"""Legacy UNet variant: forward shapes, deep supervision, conditioning."""

import numpy as np
import jax
import jax.numpy as jnp

from medfusion_tpu.models.unet_legacy import UNetLegacy

KEY = jax.random.PRNGKey(0)


def test_legacy_unet_forward_and_deep_supervision():
    m = UNetLegacy(in_ch=2, out_ch=2, hid_chs=(8, 16, 32), kernel_sizes=(1, 3, 3),
                   strides=(1, 2, 2), time_emb_dim=32, cond_emb_num_classes=2,
                   deep_supervision=True,
                   norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 2)).astype(np.float32))
    t = jnp.asarray([1, 5], jnp.int32)
    c = jnp.asarray([0, 1], jnp.int32)
    variables = m.init(KEY, x, t, c)
    y, y_ver = m.apply(variables, x, t, c)
    assert y.shape == x.shape
    # deep_supervision=True -> depth-1 = 2 heads at decoder resolutions
    assert len(y_ver) == 2
    assert y_ver[0].shape == (2, 8, 8, 2) and y_ver[1].shape == (2, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(y)))
    # cond_mask zeroes the label contribution
    y_masked, _ = m.apply(variables, x, t, c, None, jnp.zeros((2,)))
    y_nocond, _ = m.apply(variables, x, t, None)
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_nocond), atol=1e-6)


def test_legacy_unet_variance_and_self_conditioning():
    m = UNetLegacy(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(1, 3),
                   strides=(1, 2), time_emb_dim=16, estimate_variance=True,
                   use_self_conditioning=True, deep_supervision=0,
                   norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    x = jnp.zeros((1, 8, 8, 1))
    variables = m.init(KEY, x, jnp.zeros((1,), jnp.int32))
    y, y_ver = m.apply(variables, x, jnp.zeros((1,), jnp.int32), None, x)
    assert y.shape == (1, 8, 8, 2)  # 2x out channels for variance
    assert y_ver == []
