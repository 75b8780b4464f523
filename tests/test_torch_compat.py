"""Weight converter: flax <-> reference torch state_dict roundtrip + key naming."""

import numpy as np
import jax
import jax.numpy as jnp

from medfusion_tpu.models.latent_embedders import VAE, VQVAE, Discriminator
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.utils import torch_compat as TC

KEY = jax.random.PRNGKey(0)


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert len(fa) == len(fb), (
        f"leaf count {len(fa)} != {len(fb)}:\n"
        + "\n".join(sorted(str(k) for k, _ in fa)[:10])
    )
    for kp, va in fa:
        vb = fb[kp]
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(kp))


def test_unet_state_dict_roundtrip_and_reference_names():
    unet = UNet(in_ch=2, out_ch=2, hid_chs=(8, 16, 32), kernel_sizes=(3, 3, 3),
                strides=(1, 2, 2), time_emb_dim=32, cond_emb_num_classes=2,
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=1, use_attention="linear")
    z = jnp.zeros((1, 16, 16, 2))
    t = jnp.zeros((1,), jnp.int32)
    params = unet.init(KEY, z, t, t)["params"]
    # randomize so zero-init layers do not mask layout errors
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)) for l in leaves]
    )

    sd = TC.to_torch_state_dict(params, kind="unet")
    # spot-check reference key naming (unet2.py structure)
    expected = [
        "time_embedder.time_emb.1.weight",
        "cond_embedder.embedding.weight",
        "in_conv.conv.weight",
        "in_blocks.0.0.block_seq.0.basic_block.conv.weight",
        "in_blocks.0.0.block_seq.0.basic_block.norm.weight",
        "in_blocks.0.0.local_embedder.1.weight",
        "in_blocks.0.1.attention.to_q.weight",
        "in_blocks.0.1.attention.to_out.0.weight",
        "in_blocks.2.down_op.weight",
        "middle_block.0.block_seq.0.basic_block.conv.weight",
        "out_blocks.3.2.up_op.weight",
        "outc.conv.conv.weight",
        "outc_ver.0.conv.conv.weight",
    ]
    for key in expected:
        assert key in sd, f"missing reference key {key}; have e.g. {sorted(sd)[:8]}"
    # torch conv layout [O, I, kh, kw]
    assert sd["in_conv.conv.weight"].shape == (8, 2, 3, 3)
    assert sd["in_blocks.0.1.attention.to_q.weight"].shape == (16, 16, 1)

    back = TC.convert_state_dict(sd)
    _assert_trees_equal(params, back)


def test_vae_state_dict_roundtrip():
    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8, 16),
              strides=(1, 2, 2), kernel_sizes=(3, 3, 3), deep_supervision=1,
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = jnp.zeros((1, 16, 16, 1))
    params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(1)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)) for l in leaves]
    )
    sd = TC.to_torch_state_dict(params, kind="vae")
    for key in [
        "inc.block_seq.0.basic_block.conv.weight",
        "encoders.0.down_op.down_op.weight",
        "encoders.0.conv_block.block_seq.0.basic_block.conv.weight",
        "out_enc.0.conv.weight",
        "out_enc.1.conv.weight",
        "inc_dec.block_seq.0.basic_block.conv.weight",
        "decoders.0.up_op.up_op.weight",
        "outc.conv.weight",
        "outc_ver.0.conv.weight",
    ]:
        assert key in sd, f"missing {key}; have e.g. {sorted(sd)[:10]}"
    back = TC.convert_state_dict(sd)
    _assert_trees_equal(params, back)


def test_vqvae_and_discriminator_roundtrip():
    vq = VQVAE(in_channels=1, out_channels=1, emb_channels=2, num_embeddings=16,
               hid_chs=(4, 8), strides=(1, 2), kernel_sizes=(3, 3),
               norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = jnp.zeros((1, 8, 8, 1))
    params = vq.init(KEY, x)["params"]
    sd = TC.to_torch_state_dict(params, kind="vqvae")
    assert "quantizer.embedder.weight" in sd
    assert "out_enc.conv.weight" in sd
    back = TC.convert_state_dict(sd)
    _assert_trees_equal(params, back)

    disc = Discriminator(spatial_dims=2, hid_chs=(4, 8), kernel_sizes=(3, 3),
                         strides=(1, 2), norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    dp = disc.init(KEY, x)["params"]
    sd_d = TC.to_torch_state_dict(dp, kind="disc")
    assert "inc.conv.weight" in sd_d and "encoder.0.conv.weight" in sd_d
    back_d = TC.convert_state_dict(sd_d)
    _assert_trees_equal(dp, back_d)


def test_strip_prefix_for_pipeline_checkpoints():
    """Lightning pipeline ckpts prefix the estimator subtree
    (diffusion_pipeline.py: self.noise_estimator)."""
    sd = {
        "noise_estimator.in_conv.conv.weight": np.zeros((4, 2, 3, 3), np.float32),
        "noise_estimator.in_conv.conv.bias": np.zeros((4,), np.float32),
        "latent_embedder.outc.conv.weight": np.zeros((1, 4, 1, 1), np.float32),
    }
    est = TC.convert_state_dict(sd, strip_prefix="noise_estimator.")
    assert est["in_conv"]["conv"]["conv"]["kernel"].shape == (3, 3, 2, 4)
    le = TC.convert_state_dict(sd, strip_prefix="latent_embedder.")
    assert le["outc"]["conv"]["conv"]["kernel"].shape == (1, 1, 4, 1)


def test_3d_state_dict_roundtrip():
    """spatial_dims=3 export: conv kernels regain [O,I,k,k,k], 1x1 spatial-
    transformer projections regain three trailing unit dims, and the
    flax->torch->flax round trip is exact."""
    unet = UNet(in_ch=2, out_ch=2, spatial_dims=3, hid_chs=(8, 16),
                kernel_sizes=(3, 3), strides=(1, 2), time_emb_dim=32,
                cond_emb_num_classes=2, deep_supervision=0,
                use_attention="spatial",
                norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    z = jnp.zeros((1, 8, 8, 8, 2))
    t = jnp.zeros((1,), jnp.int32)
    params = unet.init(KEY, z, t, t)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(3)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)) for l in leaves]
    )

    sd = TC.to_torch_state_dict(params, kind="unet", spatial_dims=3)
    # torch layouts: 3D conv [O, I, k, k, k]; ConvNd 1x1 projections [O, I, 1, 1, 1]
    assert sd["in_conv.conv.weight"].ndim == 5
    assert sd["in_blocks.0.1.attention.proj_in.weight"].shape[-3:] == (1, 1, 1)
    back = TC.convert_state_dict(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
