"""Space-to-depth decode tail (ops.enable_s2d_decode_tail) — exactness and
gating.

The tail reformulates the FINAL autoencoder decoder level in space-to-depth
layout (motivation + measured wins: PARITY.md round 5, UP_LEVEL_AB_r05.json):
every map is the same linear algebra reassociated, so everything here is an
exact-equivalence test against the stock path, plus gate checks that the
switch never touches training-shaped decodes (deep-supervision verticals /
GAN hiddens) or unsupported geometries.
"""

import jax
import jax.numpy as jnp
import pytest

from medfusion_tpu import ops
from medfusion_tpu.models.latent_embedders import VAE, VQVAE
from medfusion_tpu.nn import functional as F

KEY = jax.random.PRNGKey(0)


def _perturb(params, scale=0.05):
    """Zero-init heads make untrained decodes trivially zero — perturb every
    leaf before comparing paths (CLAUDE.md round-5 gotcha)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [v + scale * jax.random.normal(k, v.shape, v.dtype)
         for v, k in zip(leaves, keys)])


def _tiny_vae(**kw):
    cfg = dict(in_channels=3, out_channels=3, emb_channels=4,
               hid_chs=(16, 24, 32), strides=(1, 2, 2), kernel_sizes=(3, 3, 3),
               norm_name=("GROUP", {"num_groups": 8, "affine": True}))
    cfg.update(kw)
    return VAE(**cfg)


# ---------------------------------------------------------------------------
# functional-level exactness
# ---------------------------------------------------------------------------

def test_space_to_depth_roundtrip():
    x = jax.random.normal(KEY, (2, 16, 12, 5))
    assert jnp.all(F.depth_to_space2(F.space_to_depth2(x)) == x)


def test_s2d_conv3x3_matches_full_conv():
    x = jax.random.normal(KEY, (2, 16, 12, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (7,))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = F.depth_to_space2(F.s2d_conv3x3(F.space_to_depth2(x), w, b))
    assert jnp.max(jnp.abs(ref - got)) < 1e-5


def test_s2d_conv3x3_no_bias():
    x = jax.random.normal(KEY, (1, 8, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 4)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = F.depth_to_space2(F.s2d_conv3x3(F.space_to_depth2(x), w, None))
    assert jnp.max(jnp.abs(ref - got)) < 1e-5


def test_s2d_conv1x1_matches_full_conv():
    x = jax.random.normal(KEY, (2, 16, 12, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 5, 3))
    b = jnp.arange(3.0)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = F.depth_to_space2(F.s2d_conv1x1(F.space_to_depth2(x), w, b))
    assert jnp.max(jnp.abs(ref - got)) < 1e-5


def test_s2d_group_norm_matches_flax():
    import flax.linen as nn

    x = jax.random.normal(KEY, (2, 16, 12, 8))
    scale = jax.random.normal(jax.random.PRNGKey(3), (8,))
    bias = jax.random.normal(jax.random.PRNGKey(4), (8,))
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = F.depth_to_space2(
        F.s2d_group_norm(F.space_to_depth2(x), scale, bias, 4))
    assert jnp.max(jnp.abs(ref - got)) < 1e-5


def test_fused_up_s2d_out_matches_interleaved():
    x = jax.random.normal(KEY, (2, 8, 8, 6))
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 6, 4)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(6), (4,))
    full = F.fused_up2x_conv(x, w, b)
    s2d = F.fused_up2x_conv(x, w, b, s2d_out=True)
    assert jnp.max(jnp.abs(full - F.depth_to_space2(s2d))) < 1e-5


# ---------------------------------------------------------------------------
# model-level exactness (switch on vs off, identical params)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_res_block", [True, False])
def test_vae_decode_tail_exact(use_res_block):
    m = _tiny_vae(use_res_block=use_res_block)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    p = _perturb(m.init({"params": KEY, "sample": KEY}, x)["params"])
    z = jax.random.normal(KEY, (2, 8, 8, 4))
    ops.enable_s2d_decode_tail(False)
    ref = m.apply({"params": p}, z, method=m.decode)
    ops.enable_s2d_decode_tail(True)
    got = m.apply({"params": p}, z, method=m.decode)
    assert got.shape == ref.shape
    assert jnp.max(jnp.abs(ref - got)) < 1e-4


def test_vqvae_decode_tail_exact():
    m = VQVAE(in_channels=3, out_channels=3, emb_channels=4,
              hid_chs=(16, 24, 32), strides=(1, 2, 2), kernel_sizes=(3, 3, 3),
              norm_name=("GROUP", {"num_groups": 8, "affine": True}),
              num_embeddings=32)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    p = _perturb(m.init({"params": KEY, "sample": KEY}, x)["params"])
    z = jax.random.normal(KEY, (2, 8, 8, 4))
    ops.enable_s2d_decode_tail(False)
    ref = m.apply({"params": p}, z, method=m.decode)
    ops.enable_s2d_decode_tail(True)
    got = m.apply({"params": p}, z, method=m.decode)
    assert jnp.max(jnp.abs(ref - got)) < 1e-4


def test_decode_tail_bf16():
    m = _tiny_vae()
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    p = _perturb(m.init({"params": KEY, "sample": KEY}, x)["params"])
    p = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), p)
    z = jax.random.normal(KEY, (2, 8, 8, 4), jnp.bfloat16)
    ops.enable_s2d_decode_tail(False)
    ref = m.apply({"params": p}, z, method=m.decode).astype(jnp.float32)
    ops.enable_s2d_decode_tail(True)
    got = m.apply({"params": p}, z, method=m.decode).astype(jnp.float32)
    # bf16 reassociation tolerance; scale by output magnitude
    denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-3)
    assert jnp.max(jnp.abs(ref - got)) / denom < 5e-2


def test_decode_tail_grads_match():
    m = _tiny_vae()
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    p = _perturb(m.init({"params": KEY, "sample": KEY}, x)["params"])
    z = jax.random.normal(KEY, (1, 8, 8, 4))

    def loss(params):
        out = m.apply({"params": params}, z, method=m.decode)
        return jnp.sum(out * out)

    ops.enable_s2d_decode_tail(False)
    g_ref = jax.grad(loss)(p)
    ops.enable_s2d_decode_tail(True)
    g_s2d = jax.grad(loss)(p)
    err = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) /
                           jnp.maximum(jnp.max(jnp.abs(a)), 1e-6)),
        g_ref, g_s2d)
    worst = max(jax.tree_util.tree_leaves(err))
    assert worst < 1e-3, worst


# ---------------------------------------------------------------------------
# gating: training-shaped decodes and unsupported geometries stay stock
# ---------------------------------------------------------------------------

def test_training_call_bit_identical_under_switch():
    """__call__ (deep-supervision verticals) and forward_with_hiddens (GAN
    lambda) must take the stock branch — bit-identical with the switch on."""
    m = _tiny_vae(deep_supervision=1)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    p = _perturb(m.init({"params": KEY, "sample": KEY}, x)["params"])
    ops.enable_s2d_decode_tail(False)
    ref = m.apply({"params": p}, x, rngs={"sample": KEY})
    ops.enable_s2d_decode_tail(True)
    got = m.apply({"params": p}, x, rngs={"sample": KEY})
    assert jnp.all(ref[0] == got[0])
    for a, b in zip(ref[1], got[1]):
        assert jnp.all(a == b)


def test_gate_declines_unsupported():
    """Non-GROUP norm / 3D / non-2x-stride configs silently take the stock
    path under the switch (same output), never error."""
    z = jax.random.normal(KEY, (1, 8, 8, 4))
    # LAYER norm is not GROUP; strides (1,1,2) make the FINAL decoder level
    # (decoders[0], stride = strides[1] = 1) a non-upsampling block
    for kw in ({"norm_name": ("LAYER", {})},
               {"strides": (1, 1, 2), "kernel_sizes": (3, 3, 3)}):
        m = _tiny_vae(**kw)
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        p = _perturb(m.init({"params": KEY, "sample": KEY}, x)["params"])
        ops.enable_s2d_decode_tail(True)
        got = m.apply({"params": p}, z, method=m.decode)
        ops.enable_s2d_decode_tail(False)
        ref = m.apply({"params": p}, z, method=m.decode)
        assert jnp.all(got == ref)


def test_cli_s2d_tail_wiring():
    import argparse

    from medfusion_tpu.cli.kernels import add_kernel_args, resolve_kernel_flags

    ap = argparse.ArgumentParser()
    add_kernel_args(ap)
    # default: on
    args = ap.parse_args([])
    flags = resolve_kernel_flags(args, ap)
    assert flags[-1] is True and ops.s2d_decode_tail_enabled()
    # explicit off
    args = ap.parse_args(["--no-s2d-tail"])
    flags = resolve_kernel_flags(args, ap)
    assert flags[-1] is False and not ops.s2d_decode_tail_enabled()
