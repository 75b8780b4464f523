"""Exact-forward parity of the remaining diffusers block families vs the
reference's vendored code (external/diffusers/unet_blocks.py + resnet.py):
upfirdn2d / FIR resampling, the attention down/up (+encoder/decoder)
blocks, the four FIR-skip blocks, the extended ResnetBlock2D options, and
the get_down_block/get_up_block factories."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from medfusion_tpu.models.diffusers_blocks import (
    AttnDownBlock,
    AttnDownEncoderBlock,
    AttnSkipDownBlock,
    AttnSkipUpBlock,
    AttnUpBlock,
    AttnUpDecoderBlock,
    FirDownsample,
    FirUpsample,
    SkipDownBlock,
    SkipUpBlock,
    convert_diffusers_block_state_dict,
    fir_downsample_2d,
    fir_upsample_2d,
    get_down_block,
    get_up_block,
    upfirdn2d,
)
from medfusion_tpu.models.latent_embedders_diffusers import DResnetBlock

REF_DIR = "/root/reference/medical_diffusion/external/diffusers"


def _ref_mod(name):
    full = f"refdif.{name}"
    if full in sys.modules:
        return sys.modules[full]
    if "refdif" not in sys.modules:
        pkg = types.ModuleType("refdif")
        pkg.__path__ = [REF_DIR]
        sys.modules["refdif"] = pkg
    return importlib.import_module(full)


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(x):
    return jnp.asarray(np.moveaxis(np.asarray(x), 1, -1))


def _nchw(y):
    return np.moveaxis(np.asarray(y), -1, 1)


def _maxdiff(torch_out, jax_out_nhwc):
    return float(np.max(np.abs(torch_out.detach().numpy()
                               - _nchw(jax_out_nhwc))))


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (1, 1)), (2, 2, (3, 2)),
                                         (1, 1, (0, 0))])
def test_upfirdn2d_parity(up, down, pad):
    resnet = _ref_mod("resnet")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 9, 11)).astype(np.float32)  # NCHW
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k /= k.sum()
    ref = resnet.upfirdn2d_native(torch.from_numpy(x), torch.from_numpy(k),
                                  up=up, down=down, pad=pad).numpy()
    got = _nchw(upfirdn2d(_nhwc(x), jnp.asarray(k), up=up, down=down,
                          pad=pad))
    assert ref.shape == got.shape
    assert np.max(np.abs(ref - got)) < 1e-5


def test_fir_resample_function_parity():
    resnet = _ref_mod("resnet")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 8, 8)).astype(np.float32)
    ref_up = resnet.upsample_2d(torch.from_numpy(x),
                                kernel=(1, 3, 3, 1)).numpy()
    ref_dn = resnet.downsample_2d(torch.from_numpy(x),
                                  kernel=(1, 3, 3, 1)).numpy()
    got_up = _nchw(fir_upsample_2d(_nhwc(x)))
    got_dn = _nchw(fir_downsample_2d(_nhwc(x)))
    assert np.max(np.abs(ref_up - got_up)) < 1e-5
    assert np.max(np.abs(ref_dn - got_dn)) < 1e-5


@pytest.mark.parametrize("use_conv", [False, True])
def test_fir_module_parity(use_conv):
    resnet = _ref_mod("resnet")
    torch.manual_seed(0)
    ref_up = resnet.FirUpsample2D(8, out_channels=8, use_conv=use_conv)
    ref_dn = resnet.FirDownsample2D(8, out_channels=8, use_conv=use_conv)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 10, 10)).astype(np.float32)
    with torch.no_grad():
        want_up = ref_up(torch.from_numpy(x)).numpy()
        want_dn = ref_dn(torch.from_numpy(x)).numpy()
    up = FirUpsample(8, out_channels=8, use_conv=use_conv)
    dn = FirDownsample(8, out_channels=8, use_conv=use_conv)
    p_up = {"params": convert_diffusers_block_state_dict(_np_sd(ref_up))}
    p_dn = {"params": convert_diffusers_block_state_dict(_np_sd(ref_dn))}
    got_up = _nchw(up.apply(p_up, _nhwc(x)))
    got_dn = _nchw(dn.apply(p_dn, _nhwc(x)))
    assert np.max(np.abs(want_up - got_up)) < 2e-5
    assert np.max(np.abs(want_dn - got_dn)) < 2e-5


@pytest.mark.parametrize("updown,kernel,nonlin", [
    ("up_fir", "fir", "swish"), ("down_fir", "fir", "swish"),
    ("up", None, "mish"), ("down", None, "swish"),
    ("up_sde", "sde_vp", "swish"), ("down_sde", "sde_vp", "mish"),
])
def test_resnet_block_updown_parity(updown, kernel, nonlin):
    resnet = _ref_mod("resnet")
    torch.manual_seed(3)
    up = updown.startswith("up")
    ref = resnet.ResnetBlock2D(
        in_channels=16, out_channels=16, temb_channels=8, groups=4,
        eps=1e-6, non_linearity=nonlin, output_scale_factor=np.sqrt(2.0),
        use_in_shortcut=True, up=up, down=not up, kernel=kernel)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 8, 8)).astype(np.float32)
    t = rng.standard_normal((2, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    blk = DResnetBlock(16, 16, groups=4, temb_channels=8, eps=1e-6,
                       output_scale_factor=float(np.sqrt(2.0)),
                       use_in_shortcut=True, updown=updown,
                       non_linearity=nonlin)
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got = blk.apply(params, _nhwc(x), jnp.asarray(t))
    assert np.max(np.abs(want - _nchw(got))) < 2e-5


def test_attn_down_block_parity():
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(5)
    ref = ub.AttnDownBlock2D(in_channels=32, out_channels=32,
                             temb_channels=16, num_layers=2,
                             attn_num_head_channels=8)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    t = rng.standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        want, want_states = ref(torch.from_numpy(x), torch.from_numpy(t))
    blk = AttnDownBlock(32, 32, 16, num_layers=2, attn_num_head_channels=8)
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got, got_states = blk.apply(params, _nhwc(x), jnp.asarray(t))
    assert len(want_states) == len(got_states)
    assert _maxdiff(want, got) < 2e-5
    for w, g in zip(want_states, got_states):
        assert float(np.max(np.abs(w.detach().numpy() - _nchw(g)))) < 2e-5


def test_attn_up_block_parity():
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(7)
    ref = ub.AttnUpBlock2D(in_channels=32, prev_output_channel=32,
                           out_channels=32, temb_channels=16, num_layers=2,
                           attn_num_head_channels=8)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    t = rng.standard_normal((2, 16)).astype(np.float32)
    res = [rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
           for _ in range(2)]
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   tuple(torch.from_numpy(r) for r in res),
                   torch.from_numpy(t))
    blk = AttnUpBlock(32, 32, 32, 16, num_layers=2, attn_num_head_channels=8)
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got = blk.apply(params, _nhwc(x), [_nhwc(r) for r in res],
                    jnp.asarray(t))
    assert _maxdiff(want, got) < 2e-5


def test_attn_encoder_decoder_block_parity():
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(9)
    ref_dn = ub.AttnDownEncoderBlock2D(in_channels=32, out_channels=32,
                                       num_layers=2, attn_num_head_channels=8)
    ref_up = ub.AttnUpDecoderBlock2D(in_channels=32, out_channels=32,
                                     num_layers=2, attn_num_head_channels=8)
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want_dn = ref_dn(torch.from_numpy(x)).numpy()
        want_up = ref_up(torch.from_numpy(x)).numpy()
    dn = AttnDownEncoderBlock(32, 32, num_layers=2, attn_num_head_channels=8)
    up = AttnUpDecoderBlock(32, 32, num_layers=2, attn_num_head_channels=8)
    got_dn = dn.apply(
        {"params": convert_diffusers_block_state_dict(_np_sd(ref_dn))},
        _nhwc(x))
    got_up = up.apply(
        {"params": convert_diffusers_block_state_dict(_np_sd(ref_up))},
        _nhwc(x))
    assert np.max(np.abs(want_dn - _nchw(got_dn))) < 2e-5
    assert np.max(np.abs(want_up - _nchw(got_up))) < 2e-5


@pytest.mark.parametrize("attn", [False, True])
def test_skip_down_block_parity(attn):
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(11)
    if attn:
        ref = ub.AttnSkipDownBlock2D(in_channels=32, out_channels=32,
                                     temb_channels=16, num_layers=2,
                                     attn_num_head_channels=8)
        blk = AttnSkipDownBlock(32, 32, 16, num_layers=2,
                                attn_num_head_channels=8)
    else:
        ref = ub.SkipDownBlock2D(in_channels=32, out_channels=32,
                                 temb_channels=16, num_layers=2)
        blk = SkipDownBlock(32, 32, 16, num_layers=2)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    t = rng.standard_normal((2, 16)).astype(np.float32)
    skip = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want, want_states, want_skip = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(skip))
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got, got_states, got_skip = blk.apply(params, _nhwc(x), jnp.asarray(t),
                                          _nhwc(skip))
    assert len(want_states) == len(got_states)
    assert _maxdiff(want, got) < 2e-5
    assert _maxdiff(want_skip, got_skip) < 2e-5


@pytest.mark.parametrize("attn", [False, True])
def test_skip_up_block_parity(attn):
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(13)
    if attn:
        ref = ub.AttnSkipUpBlock2D(in_channels=32, prev_output_channel=32,
                                   out_channels=32, temb_channels=16,
                                   num_layers=2, attn_num_head_channels=8)
        blk = AttnSkipUpBlock(32, 32, 32, 16, num_layers=2,
                              attn_num_head_channels=8)
    else:
        ref = ub.SkipUpBlock2D(in_channels=32, prev_output_channel=32,
                               out_channels=32, temb_channels=16,
                               num_layers=2)
        blk = SkipUpBlock(32, 32, 32, 16, num_layers=2)
    rng = np.random.default_rng(14)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    t = rng.standard_normal((2, 16)).astype(np.float32)
    res = [rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
           for _ in range(2)]
    # the RGB skip pyramid enters at HALF the block resolution and is
    # FIR-upsampled before the skip_conv merge (unet_blocks.py:1543-1553)
    skip = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want, want_skip = ref(torch.from_numpy(x),
                              tuple(torch.from_numpy(r) for r in res),
                              torch.from_numpy(t), torch.from_numpy(skip))
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got, got_skip = blk.apply(params, _nhwc(x), [_nhwc(r) for r in res],
                              jnp.asarray(t), _nhwc(skip))
    assert _maxdiff(want, got) < 2e-5
    assert _maxdiff(want_skip, got_skip) < 2e-5


def test_factories_cover_all_types():
    down_types = ["DownBlock2D", "CrossAttnDownBlock2D", "AttnDownBlock2D",
                  "SkipDownBlock2D", "AttnSkipDownBlock2D",
                  "DownEncoderBlock2D", "AttnDownEncoderBlock2D"]
    up_types = ["UpBlock2D", "CrossAttnUpBlock2D", "AttnUpBlock2D",
                "SkipUpBlock2D", "AttnSkipUpBlock2D", "UpDecoderBlock2D",
                "AttnUpDecoderBlock2D"]
    for t in down_types:
        blk = get_down_block(t, 2, 32, 32, 16, True,
                             attn_num_head_channels=8,
                             cross_attention_dim=16)
        assert blk is not None, t
    for t in up_types:
        blk = get_up_block(t, 2, 32, 32, 32, 16, True,
                           attn_num_head_channels=8,
                           cross_attention_dim=16)
        assert blk is not None, t
    with pytest.raises(ValueError):
        get_down_block("NopeBlock2D", 1, 8, 8, 8, True)
    with pytest.raises(ValueError):
        get_up_block("CrossAttnUpBlock2D", 1, 8, 8, 8, 8, True,
                     cross_attention_dim=None)
    # UNetRes prefix stripping (unet_blocks.py:38, 130)
    assert get_down_block("UNetResDownBlock2D", 1, 8, 8, 8, True) is not None


def test_factory_down_block_runs():
    blk = get_down_block("AttnDownBlock2D", 2, 32, 32, 16, True,
                         attn_num_head_channels=8)
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, t)
    y, states = blk.apply(params, x, t)
    assert y.shape == (2, 4, 4, 32)
    assert len(states) == 3


@pytest.mark.parametrize("add_downsample,pad", [(False, 1), (True, 1),
                                                (True, 0)])
def test_down_encoder_block_factory_parity(add_downsample, pad):
    """get_down_block must honor add_downsample and downsample_padding for
    DownEncoderBlock2D (unet_blocks.py:80-85) — both the no-resample final
    block and the symmetric-padding flavor."""
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(20)
    ref = ub.DownEncoderBlock2D(in_channels=32, out_channels=32, num_layers=2,
                                resnet_groups=8, add_downsample=add_downsample,
                                downsample_padding=pad)
    rng = np.random.default_rng(21)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    blk = get_down_block("DownEncoderBlock2D", 2, 32, 32, None,
                         add_downsample, resnet_groups=8,
                         downsample_padding=pad)
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got = blk.apply(params, _nhwc(x))
    assert want.shape == _nchw(got).shape
    np.testing.assert_allclose(_nchw(got), want, atol=2e-5)


@pytest.mark.parametrize("add_upsample", [False, True])
def test_up_decoder_block_factory_parity(add_upsample):
    """get_up_block must honor add_upsample for UpDecoderBlock2D
    (unet_blocks.py:172-177)."""
    ub = _ref_mod("unet_blocks")
    torch.manual_seed(22)
    ref = ub.UpDecoderBlock2D(in_channels=32, out_channels=32, num_layers=2,
                              resnet_groups=8, add_upsample=add_upsample)
    rng = np.random.default_rng(23)
    x = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    blk = get_up_block("UpDecoderBlock2D", 2, 32, 32, 32, None, add_upsample,
                       resnet_groups=8)
    params = {"params": convert_diffusers_block_state_dict(_np_sd(ref))}
    got = blk.apply(params, _nhwc(x))
    assert want.shape == _nchw(got).shape
    np.testing.assert_allclose(_nchw(got), want, atol=2e-5)
