"""Numerical parity of NHWC flax blocks vs torch (NCHW) on identical weights."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from medfusion_tpu import nn as mnn
from medfusion_tpu.nn import functional as F
from tests import torch_oracles as O

KEY = jax.random.PRNGKey(0)


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2), (1, 1), (4, 2), (2, 2)])
def test_conv2d_padding_parity(k, s):
    x = rand((2, 9, 9, 5))
    m = mnn.ConvND(2, 7, k, s)
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    pad = F.get_padding(k, s, 1)[0]
    conv = O.to_torch_conv(tnn.Conv2d(5, 7, k, s, padding=pad), params)
    yt = O.nhwc(conv(O.nchw(x)))
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_conv3d_parity():
    x = rand((1, 5, 8, 8, 3))
    m = mnn.ConvND(3, 6, (1, 3, 3), (1, 2, 2))
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    conv = O.to_torch_conv(tnn.Conv3d(3, 6, (1, 3, 3), (1, 2, 2), padding=(0, 1, 1)), params)
    yt = O.nhwc(conv(O.nchw(x)))
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("groups,ch", [(32, 64), (8, 64), (1, 16)])
def test_group_norm_parity(groups, ch):
    x = rand((2, 6, 6, ch), seed=1)
    m = mnn.Norm(("GROUP", {"num_groups": groups, "affine": True}), ch)
    params = m.init(KEY, jnp.asarray(x))["params"]
    # non-trivial affine
    params["norm"]["scale"] = jnp.asarray(rand((ch,), 2))
    params["norm"]["bias"] = jnp.asarray(rand((ch,), 3))
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    gn = O.to_torch_norm(tnn.GroupNorm(groups, ch), params)
    yt = O.nhwc(gn(O.nchw(x)))
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_basic_block_conv_norm_act_order():
    x = rand((2, 8, 8, 16), seed=4)
    m = mnn.BasicBlock(2, 32, 3, 1, ("GROUP", {"num_groups": 8, "affine": True}), ("SWISH", {}))
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    conv = O.to_torch_conv(tnn.Conv2d(16, 32, 3, 1, 1), params["conv"])
    gn = O.to_torch_norm(tnn.GroupNorm(8, 32), params["norm"])
    yt = O.nhwc(TF.silu(gn(conv(O.nchw(x)))))
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_zero_conv_outputs_zero():
    x = rand((2, 8, 8, 4))
    m = mnn.BasicBlock(2, 4, 1, zero_conv=True)
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    assert np.all(y == 0)


def test_unet_res_block_with_emb_parity():
    """UnetResBlock: 2 x (BasicResBlock), last zero-init, emb added after block 0
    only (conv_blocks.py:347-364)."""
    ch_in, ch_out, emb_dim = 16, 32, 24
    x = rand((2, 8, 8, ch_in), seed=5)
    emb = rand((2, emb_dim), seed=6)
    norm = ("GROUP", {"num_groups": 8, "affine": True})
    m = mnn.UnetResBlock(2, ch_out, 3, 1, norm, ("SWISH", {}), emb_channels=emb_dim)
    params = m.init(KEY, jnp.asarray(x), jnp.asarray(emb))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x), jnp.asarray(emb)))

    # torch replica
    def mk_block(p, cin):
        conv = O.to_torch_conv(tnn.Conv2d(cin, ch_out, 3, 1, 1), p["basic_block"]["conv"])
        gn = O.to_torch_norm(tnn.GroupNorm(8, ch_out), p["basic_block"]["norm"])
        res = None
        if cin != ch_out:
            res = O.to_torch_conv(tnn.Conv2d(cin, ch_out, 1, 1, 0), p["conv_res"])
        def f(t):
            out = TF.silu(gn(conv(t)))
            return out + (res(t) if res is not None else t)
        return f
    b0 = mk_block(params["block_0"], ch_in)
    b1 = mk_block(params["block_1"], ch_out)
    lin = O.to_torch_linear(tnn.Linear(emb_dim, ch_out), params["local_embedder"])
    e = lin(TF.silu(torch.from_numpy(emb)))[:, :, None, None]
    xt = O.nchw(x)
    ht = b0(xt) + e
    ht = b1(ht)
    np.testing.assert_allclose(y, O.nhwc(ht), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_sz,out_sz", [(8, 16), (5, 13), (16, 8), (7, 7), (4, 11)])
def test_nearest_exact_parity(in_sz, out_sz):
    x = rand((2, in_sz, in_sz, 3), seed=7)
    y = np.asarray(F.interpolate_nearest_exact(jnp.asarray(x), (out_sz, out_sz)))
    yt = O.nhwc(TF.interpolate(O.nchw(x), size=(out_sz, out_sz), mode="nearest-exact"))
    np.testing.assert_array_equal(y, yt)


@pytest.mark.parametrize("in_sz,out_sz", [(8, 16), (8, 24), (5, 13)])
def test_nearest_parity_incl_repeat_fast_path(in_sz, out_sz):
    """mode='nearest' parity; the integer-ratio cases (2x, 3x) exercise the
    broadcast+reshape fast path of _take_or_repeat (decode-path win), the
    non-integer case the gather fallback."""
    x = rand((2, in_sz, in_sz, 3), seed=11)
    y = np.asarray(F.interpolate_nearest(jnp.asarray(x), (out_sz, out_sz)))
    yt = O.nhwc(TF.interpolate(O.nchw(x), size=(out_sz, out_sz), mode="nearest"))
    np.testing.assert_array_equal(y, yt)


@pytest.mark.parametrize("in_sz,out_sz", [(16, 8), (16, 4), (15, 4), (9, 5)])
def test_area_interpolate_parity(in_sz, out_sz):
    x = rand((2, in_sz, in_sz, 3), seed=8)
    y = np.asarray(F.interpolate_area(jnp.asarray(x), (out_sz, out_sz)))
    yt = O.nhwc(TF.interpolate(O.nchw(x), size=(out_sz, out_sz), mode="area"))
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,s", [(3, 2), (2, 2)])
def test_avg_pool_parity(k, s):
    x = rand((2, 9, 9, 4), seed=9)
    y = np.asarray(F.avg_pool_same(jnp.asarray(x), k, s))
    pad = F.get_padding(k, s, 1)[0]
    yt = O.nhwc(tnn.AvgPool2d(k, s, padding=pad)(O.nchw(x)))
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-6)


def test_basic_up_output_shape_and_parity():
    """BasicUp: nearest-exact to (s-1)*st+k-2p then 3x3 conv (conv_blocks.py:101-125)."""
    x = rand((2, 8, 8, 16), seed=10)
    m = mnn.BasicUp(2, 16, kernel_size=2, stride=2)
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    assert y.shape == (2, 16, 16, 16)
    conv = O.to_torch_conv(tnn.Conv2d(16, 16, 3, 1, 1), params["up_conv"])
    xt = TF.interpolate(O.nchw(x), size=(16, 16), mode="nearest-exact")
    np.testing.assert_allclose(y, O.nhwc(conv(xt)), rtol=1e-4, atol=1e-5)


def test_compute_attention_parity():
    b, heads, d, n = 2, 4, 8, 33
    c = heads * d
    scale = d**-0.25
    q, k, v = (rand((b, n, c), seed=s) for s in (11, 12, 13))
    y = np.asarray(mnn.compute_attention(*(jnp.asarray(a) for a in (q, k, v)), heads, scale))
    yt = O.ref_compute_attention(
        *(torch.from_numpy(np.ascontiguousarray(a.transpose(0, 2, 1))) for a in (q, k, v)),
        heads, scale,
    )
    np.testing.assert_allclose(y, yt.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_linear_transformer_self_attention_parity():
    """Full LinearTransformer vs torch replica (attention_blocks.py:128-195)."""
    b, hw, ch, heads = 2, 8, 32, 8
    dph = ch // heads
    x = rand((b, hw, hw, ch), seed=14)
    m = mnn.LinearTransformer(2, ch, heads, dph, ("GROUP", {"num_groups": 8, "affine": True}))
    params = m.init(KEY, jnp.asarray(x))["params"]
    # randomize zero-init out proj so residual path is non-trivial
    params["to_out"]["linear"]["kernel"] = jnp.asarray(rand((ch, ch), 15) * 0.1)
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    gn = O.to_torch_norm(tnn.GroupNorm(8, ch), params["norm_x"])
    to_q = O.to_torch_linear(tnn.Linear(ch, ch), params["to_q"])
    to_k = O.to_torch_linear(tnn.Linear(ch, ch), params["to_k"])
    to_v = O.to_torch_linear(tnn.Linear(ch, ch), params["to_v"])
    to_out = O.to_torch_linear(tnn.Linear(ch, ch), params["to_out"])
    xt = O.nchw(x)
    x_n = gn(xt).reshape(b, ch, -1)  # [B, C, N]
    tok = x_n.transpose(1, 2)  # [B, N, C]
    q, k, v = (m_(tok).transpose(1, 2) for m_ in (to_q, to_k, to_v))
    out = O.ref_compute_attention(q, k, v, heads, dph**-0.25)
    out = to_out(out.transpose(1, 2)).transpose(1, 2).reshape(b, ch, hw, hw)
    out = xt + out
    np.testing.assert_allclose(y, O.nhwc(out), rtol=1e-4, atol=1e-5)


def test_cross_attention_2d_embedding_single_token():
    b, hw, ch, e = 2, 4, 32, 16
    x = rand((b, hw, hw, ch), seed=16)
    emb = rand((b, e), seed=17)
    m = mnn.LinearTransformer(2, ch, 8, 4, ("GROUP", {"num_groups": 8, "affine": True}), emb_dim=e)
    params = m.init(KEY, jnp.asarray(x), jnp.asarray(emb))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x), jnp.asarray(emb)))
    assert y.shape == x.shape and np.isfinite(y).all()
    # with one kv token, softmax is 1 -> out = v broadcast; sanity: attention of
    # any q equals projected v
    assert np.allclose(y.std(axis=(1, 2)), y.std(axis=(1, 2)))


def test_cross_attention_single_token_shortcut_exact():
    """The single-KV-token fast path (softmax over one key == 1, so
    out = broadcast(v)) must match the explicit double-scale softmax
    attention computed from the SAME params — the shortcut is algebra,
    not approximation."""
    from medfusion_tpu.ops.flash_attention import naive_attention

    b, hw, ch, e, heads, dph = 2, 4, 32, 16, 8, 4
    x = rand((b, hw, hw, ch), seed=26)
    emb = rand((b, e), seed=27)
    m = mnn.LinearTransformer(2, ch, heads, dph,
                              ("GROUP", {"num_groups": 8, "affine": True}),
                              emb_dim=e)
    params = m.init(KEY, jnp.asarray(x), jnp.asarray(emb))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x), jnp.asarray(emb)))

    # explicit path from the same params
    def dense(p, t):
        return t @ p["linear"]["kernel"] + p["linear"]["bias"]

    gn = mnn.Norm(("GROUP", {"num_groups": 8, "affine": True}), ch)
    x_n = gn.apply({"params": params["norm_x"]}, jnp.asarray(x))
    x_tok = x_n.reshape(b, hw * hw, ch)
    emb_tok = jnp.asarray(emb)[:, None, :]
    q = dense(params["to_q"], x_tok)
    k = dense(params["to_k"], emb_tok)
    v = dense(params["to_v"], emb_tok)
    from einops import rearrange
    qh = rearrange(q, "b n (h d) -> b h n d", h=heads)
    kh = rearrange(k, "b n (h d) -> b h n d", h=heads)
    vh = rearrange(v, "b n (h d) -> b h n d", h=heads)
    att = rearrange(naive_attention(qh, kh, vh, dph ** -0.25),
                    "b h n d -> b n (h d)")
    out = dense(params["to_out"], att).reshape(b, hw, hw, ch)
    want = np.asarray(jnp.asarray(x) + out)  # residual (shapes match)
    np.testing.assert_allclose(y, want, atol=1e-5, rtol=1e-5)


def test_geglu_parity():
    b, n, ch = 2, 9, 16
    x = rand((b, n, n, ch), seed=18)
    m = mnn.GEGLU(ch * 4)
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    ln = tnn.LayerNorm(ch)
    O.to_torch_norm(ln, {"norm": {"scale": params["norm"]["scale"], "bias": params["norm"]["bias"]}})
    lin = O.to_torch_linear(tnn.Linear(ch, ch * 8), params["proj"])
    t = torch.from_numpy(x)
    h = lin(ln(t))
    a, gate = h.chunk(2, dim=-1)
    yt = (a * TF.gelu(gate)).detach().numpy()
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_spatial_transformer_runs_and_residual():
    x = rand((2, 8, 8, 32), seed=19)
    m = mnn.SpatialTransformer(2, 32, 8, 4, ("GROUP", {"num_groups": 8, "affine": True}), depth=2)
    params = m.init(KEY, jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    assert y.shape == x.shape and np.isfinite(y).all()


def test_pixel_shuffle_roundtrip():
    from medfusion_tpu.nn.blocks import pixel_shuffle, pixel_unshuffle
    x = rand((2, 8, 8, 4), seed=20)
    y = pixel_unshuffle(jnp.asarray(x))
    assert y.shape == (2, 4, 4, 16)
    z = np.asarray(pixel_shuffle(y))
    np.testing.assert_array_equal(z, x)
    # parity with torch PixelUnshuffle
    yt = O.nhwc(tnn.PixelUnshuffle(2)(O.nchw(x)))
    # channel ordering differs between torch (C,r1,r2) and einops (c r1 r2)? verify:
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-6, atol=1e-7)


@pytest.fixture
def fused_up_conv_switch():
    import medfusion_tpu.ops as ops

    ops.enable_fused_up_conv(True)
    try:
        yield
    finally:
        ops.enable_fused_up_conv(False)


def test_fused_up2x_conv_function_exact():
    """F.fused_up2x_conv == conv3x3(nearest-2x) to f32 rounding, odd sizes."""
    x = jnp.asarray(rand((2, 5, 7, 6), seed=30))
    w = jnp.asarray(rand((3, 3, 6, 4), seed=31))
    b = jnp.asarray(rand((4,), seed=32))
    up = F.interpolate_nearest_exact(x, (10, 14))
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    y = F.fused_up2x_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_up2x_conv_grads_exact():
    x = jnp.asarray(rand((1, 4, 4, 3), seed=33))
    w = jnp.asarray(rand((3, 3, 3, 5), seed=34))
    b = jnp.asarray(rand((5,), seed=35))

    def loss(fn):
        return lambda x, w, b: jnp.sum(jnp.sin(fn(x, w, b)))

    def ref(x, w, b):
        up = F.interpolate_nearest_exact(x, (8, 8))
        return jax.lax.conv_general_dilated(
            up, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    ga = jax.grad(loss(ref), argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss(F.fused_up2x_conv), argnums=(0, 1, 2))(x, w, b)
    for a, f in zip(ga, gf):
        np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_up2x_conv_stacked_variant_exact():
    """The 'stacked' variant (one 4C-output 2x2 conv + phase slicing) is the
    same per-channel dot products as the 'phase4' default — outputs and
    grads match phase4 bit-for-bit-level tight and the unfused reference to
    f32 rounding (A/B candidate, tools/decode_profile.py --up-ab)."""
    x = jnp.asarray(rand((2, 5, 7, 6), seed=40))
    w = jnp.asarray(rand((3, 3, 6, 4), seed=41))
    b = jnp.asarray(rand((4,), seed=42))
    up = F.interpolate_nearest_exact(x, (10, 14))
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    y_phase4 = F.fused_up2x_conv(x, w, b)
    assert F.FUSED_UP_VARIANT == "phase4"  # shipped default until re-measured
    F.FUSED_UP_VARIANT = "stacked"
    try:
        y_stacked = F.fused_up2x_conv(x, w, b)
        g_stacked = jax.grad(lambda *a: jnp.sum(jnp.sin(
            F.fused_up2x_conv(*a))), argnums=(0, 1, 2))(x, w, b)
    finally:
        F.FUSED_UP_VARIANT = "phase4"
    g_phase4 = jax.grad(lambda *a: jnp.sum(jnp.sin(
        F.fused_up2x_conv(*a))), argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(y_stacked), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_stacked), np.asarray(y_phase4),
                               rtol=1e-6, atol=1e-7)
    for a, f in zip(g_phase4, g_stacked):
        # f32 rounding only (different conv-vjp accumulation orders)
        np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_basic_up_fused_param_tree_and_output(fused_up_conv_switch):
    """Switch ON: identical param tree, identical init draws, same output to
    f32 rounding — checkpoints interchange freely between modes."""
    import medfusion_tpu.ops as ops

    x = jnp.asarray(rand((2, 8, 8, 16), seed=36))
    m = mnn.BasicUp(2, 16, kernel_size=2, stride=2)
    p_fused = m.init(KEY, x)["params"]
    y_fused = m.apply({"params": p_fused}, x)

    ops.enable_fused_up_conv(False)
    p_plain = m.init(KEY, x)["params"]
    y_plain = m.apply({"params": p_plain}, x)
    # same tree, same shapes, same init VALUES (same scope path -> same RNG)
    assert jax.tree_util.tree_structure(p_fused) == jax.tree_util.tree_structure(p_plain)
    for a, b in zip(jax.tree_util.tree_leaves(p_fused),
                    jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-6)


def test_basic_up_fused_ineligible_fallback(fused_up_conv_switch):
    """3D and non-2x ratios must fall back to the unfused path (and agree
    with themselves when the switch flips — i.e. the gate never fires)."""
    import medfusion_tpu.ops as ops

    # 3D
    x3 = jnp.asarray(rand((1, 4, 4, 4, 8), seed=37))
    m3 = mnn.BasicUp(3, 8, kernel_size=2, stride=2)
    p3 = m3.init(KEY, x3)["params"]
    y_on = m3.apply({"params": p3}, x3)
    ops.enable_fused_up_conv(False)
    y_off = m3.apply({"params": p3}, x3)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))
    ops.enable_fused_up_conv(True)

    # 3x ratio (stride 3): up_output_shape -> 3x, not 2x -> gate must not fire
    x = jnp.asarray(rand((1, 4, 4, 8), seed=38))
    m = mnn.BasicUp(2, 8, kernel_size=3, stride=3)
    p = m.init(KEY, x)["params"]
    y_on = m.apply({"params": p}, x)
    ops.enable_fused_up_conv(False)
    y_off = m.apply({"params": p}, x)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))
    ops.enable_fused_up_conv(True)


def _randomize(params, seed):
    """Replace every leaf with random values — the models' output heads are
    ZERO-initialized (zero_conv=True), so a random-INIT on/off comparison is
    vacuously 0.0; randomized weights make the fused path reach the output."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.normal(0, 0.2, l.shape).astype(np.float32)) for l in leaves])


def test_vae_decode_fused_up_conv_equivalence(fused_up_conv_switch):
    """Full VAE decode with the switch on == off to f32 rounding (the decode
    path has 3 BasicUps; PARITY round-5 decode roofline)."""
    import medfusion_tpu.ops as ops
    from medfusion_tpu.models.latent_embedders import VAE

    vae = VAE(in_channels=3, out_channels=3, emb_channels=4,
              hid_chs=(32, 64), kernel_sizes=(3, 3), strides=(1, 2),
              deep_supervision=0)
    k = jax.random.PRNGKey(0)
    vp = vae.init({"params": k, "sample": k}, jnp.zeros((1, 16, 16, 3)))["params"]
    vp = _randomize(vp, seed=41)
    z = jnp.asarray(rand((2, 8, 8, 4), seed=39))
    y_on = vae.apply({"params": vp}, z, method=vae.decode)
    # the gate must actually fire: fused decode has +3 convs per BasicUp
    # (fresh lambdas per trace — jit caches key on function identity)
    n_on = str(jax.make_jaxpr(
        lambda z: vae.apply({"params": vp}, z, method=vae.decode))(z)
    ).count("conv_general_dilated")
    ops.enable_fused_up_conv(False)
    y_off = vae.apply({"params": vp}, z, method=vae.decode)
    n_off = str(jax.make_jaxpr(
        lambda z: vae.apply({"params": vp}, z, method=vae.decode))(z)
    ).count("conv_general_dilated")
    assert n_on == n_off + 3, (n_on, n_off)
    assert float(jnp.max(jnp.abs(y_on - y_off))) > 0  # not vacuous
    # scale-aware: randomized (unnormalized) weights amplify the one
    # weight-add reassociation per tap pair through downstream layers
    tol = 1e-3 * float(jnp.max(jnp.abs(y_off))) + 1e-5
    assert float(jnp.max(jnp.abs(y_on - y_off))) <= tol
    ops.enable_fused_up_conv(True)


def test_unet_forward_fused_up_conv_equivalence(fused_up_conv_switch):
    import medfusion_tpu.ops as ops
    from medfusion_tpu.models.unet import UNet

    m = UNet(in_ch=4, out_ch=4, hid_chs=(32, 32, 64), kernel_sizes=(3, 3, 3),
             strides=(1, 2, 2), time_emb_dim=32, cond_emb_num_classes=2,
             deep_supervision=0, use_attention="none",
             norm_name=("GROUP", {"num_groups": 8, "affine": True}))
    x = jnp.asarray(rand((2, 16, 16, 4), seed=40))
    t = jnp.zeros((2,), jnp.int32)
    p = _randomize(m.init(KEY, x, t, t)["params"], seed=42)
    y_on = m.apply({"params": p}, x, t, t)[0]
    ops.enable_fused_up_conv(False)
    y_off = m.apply({"params": p}, x, t, t)[0]
    assert float(jnp.max(jnp.abs(y_on - y_off))) > 0  # not vacuous
    tol = 1e-3 * float(jnp.max(jnp.abs(y_off))) + 1e-5
    assert float(jnp.max(jnp.abs(y_on - y_off))) <= tol
    ops.enable_fused_up_conv(True)
