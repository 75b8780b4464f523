"""Load the reference's OWN model code as a parity oracle.

The reference model modules (`conv_blocks.py:9-12`, `attention_blocks.py:5-7`,
`unet2.py:4`, `time_embedder.py:5`, `latent_embedders.py:7-17`) import MONAI,
pytorch_lightning, lpips, pytorch_msssim and torchvision — none installed in
this image. The surface actually touched is tiny: a handful of MONAI layer
factories plus no-op Lightning plumbing. This module implements exactly those
symbols with plain ``torch.nn`` (forward-identical by construction: the MONAI
factories themselves resolve to the same torch primitives) and loads the real
files under their canonical ``medical_diffusion.*`` names via ``sys.modules``
injection — the same pattern :mod:`tests.reference_oracle` uses for the
schedulers.

The result: :func:`reference_models` returns a namespace whose ``UNet`` /
``VAE`` / ``VQVAE`` / attention classes ARE the reference's
(`estimators/unet2.py:15-269`, `embedders/latent_embedders.py:191-404,620-855`,
`utils/attention_blocks.py`, `utils/conv_blocks.py`) executing unmodified.
Tests instantiate them with ``perceiver=None`` (supported by the reference
ctor, latent_embedders.py:235) so the lpips stub is never constructed.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

REF = Path("/root/reference/medical_diffusion")

# --------------------------------------------------------------------------
# MONAI surface (formulas verbatim from MONAI's public API semantics)
# --------------------------------------------------------------------------


def _collapse(vals):
    vals = tuple(int(v) for v in vals)
    return vals if len(vals) > 1 else vals[0]


def get_padding(kernel_size, stride):
    """monai.networks.blocks.dynunet_block.get_padding: (k - s + 1) / 2."""
    k = np.atleast_1d(kernel_size)
    s = np.atleast_1d(stride)
    p = (k - s + 1) / 2
    if np.min(p) < 0:
        raise AssertionError("padding value should not be negative")
    return _collapse(p)


def get_output_padding(kernel_size, stride, padding):
    """monai get_output_padding: 2p + s - k."""
    k = np.atleast_1d(kernel_size)
    s = np.atleast_1d(stride)
    p = np.atleast_1d(padding)
    out = 2 * p + s - k
    if np.min(out) < 0:
        raise AssertionError("out_padding value should not be negative")
    return _collapse(out)


def ensure_tuple_rep(val, rep):
    """monai.utils.misc.ensure_tuple_rep."""
    if isinstance(val, (list, tuple)):
        if len(val) == rep:
            return tuple(val)
        raise ValueError(f"sequence must have length {rep}, got {len(val)}")
    return (val,) * rep


class _Factory:
    """MONAI layer factory: ``Fact[name, dims]`` -> torch layer class."""

    def __init__(self, table):
        self._table = {k.lower(): v for k, v in table.items()}

    def __getitem__(self, key):
        name, dims = key
        return self._table[str(name).lower()][dims - 1]


Conv = _Factory({
    "conv": (nn.Conv1d, nn.Conv2d, nn.Conv3d),
    "convtrans": (nn.ConvTranspose1d, nn.ConvTranspose2d, nn.ConvTranspose3d),
})
Conv.CONV = "conv"
Conv.CONVTRANS = "convtrans"

Pool = _Factory({
    "max": (nn.MaxPool1d, nn.MaxPool2d, nn.MaxPool3d),
    "avg": (nn.AvgPool1d, nn.AvgPool2d, nn.AvgPool3d),
    "adaptivemax": (nn.AdaptiveMaxPool1d, nn.AdaptiveMaxPool2d, nn.AdaptiveMaxPool3d),
    "adaptiveavg": (nn.AdaptiveAvgPool1d, nn.AdaptiveAvgPool2d, nn.AdaptiveAvgPool3d),
})
Pool.MAX = "max"
Pool.AVG = "avg"


def _split_name(name):
    if isinstance(name, (tuple, list)):
        return str(name[0]).lower(), dict(name[1]) if len(name) > 1 else {}
    return str(name).lower(), {}


def get_act_layer(name):
    """monai get_act_layer for the names this repo uses. MONAI's ``Swish`` is
    x*sigmoid(x) == torch SiLU (forward-identical)."""
    key, kwargs = _split_name(name)
    table = {
        "swish": nn.SiLU,
        "silu": nn.SiLU,
        "memswish": nn.SiLU,
        "relu": nn.ReLU,
        "leakyrelu": nn.LeakyReLU,
        "gelu": nn.GELU,
        "mish": nn.Mish,
        "prelu": nn.PReLU,
        "sigmoid": nn.Sigmoid,
        "tanh": nn.Tanh,
    }
    return table[key](**kwargs)


def get_norm_layer(name, spatial_dims=1, channels=1):
    key, kwargs = _split_name(name)
    if key == "group":
        kwargs.setdefault("num_channels", channels)
        return nn.GroupNorm(**kwargs)
    if key == "batch":
        bn = (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)[spatial_dims - 1]
        return bn(num_features=channels, **kwargs)
    if key == "instance":
        inorm = (nn.InstanceNorm1d, nn.InstanceNorm2d, nn.InstanceNorm3d)[spatial_dims - 1]
        return inorm(num_features=channels, **kwargs)
    if key == "layer":
        return nn.LayerNorm(normalized_shape=channels, **kwargs)
    raise ValueError(f"unsupported norm {name}")


def get_dropout_layer(name, dropout_dim=1):
    if isinstance(name, (int, float)):
        return nn.Dropout(p=float(name))
    key, kwargs = _split_name(name)
    if key == "dropout":
        return nn.Dropout(**kwargs)
    raise ValueError(f"unsupported dropout {name}")


class _Convolution(nn.Sequential):
    """MONAI Convolution container: the conv lives under the child name
    'conv', giving UnetOutBlock its characteristic ``*.conv.conv.weight``
    state-dict keys (the converter and the flax modules both honor this)."""

    def __init__(self, conv):
        super().__init__()
        self.add_module("conv", conv)


class UnetOutBlock(nn.Module):
    """monai.networks.blocks.UnetOutBlock: 1x1 conv with bias, no norm/act."""

    def __init__(self, spatial_dims, in_channels, out_channels, dropout=None):
        super().__init__()
        conv = Conv["conv", spatial_dims](
            in_channels, out_channels, kernel_size=1, stride=1, bias=True)
        self.conv = _Convolution(conv)

    def forward(self, x):
        return self.conv(x)


class TransformerBlock(nn.Module):
    """Imported by attention_blocks.py:5 but never instantiated there."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("shim: reference never constructs this")


# --------------------------------------------------------------------------
# pytorch_lightning / lpips / pytorch_msssim / torchvision no-op surface
# --------------------------------------------------------------------------


class _LightningModule(nn.Module):
    """Just enough of pl.LightningModule for model ctor + forward."""

    def save_hyperparameters(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    @property
    def logger(self):
        return None

    @property
    def global_step(self):
        return 0


class _LpipsLPIPS(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise RuntimeError(
            "lpips weights are unobtainable in this image; construct the "
            "reference VAE with perceiver=None (latent_embedders.py:235)")


def _ssim_stub(*a, **k):
    raise RuntimeError("pytorch_msssim stub: not used on the forward path")


def _build_fake_modules():
    mods = {}

    def mk(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        mods[name] = m
        return m

    mk("monai")
    mk("monai.networks")
    mk("monai.networks.blocks", TransformerBlock=TransformerBlock,
       UnetOutBlock=UnetOutBlock)
    mk("monai.networks.blocks.dynunet_block", get_padding=get_padding,
       get_output_padding=get_output_padding)
    mk("monai.networks.layers", Pool=Pool, Conv=Conv)
    mk("monai.networks.layers.utils", get_act_layer=get_act_layer,
       get_norm_layer=get_norm_layer, get_dropout_layer=get_dropout_layer)
    mk("monai.networks.layers.factories", Conv=Conv, Pool=Pool)
    mk("monai.utils")
    mk("monai.utils.misc", ensure_tuple_rep=ensure_tuple_rep)

    pl = mk("pytorch_lightning", LightningModule=_LightningModule)
    mk("pytorch_lightning.utilities")
    mk("pytorch_lightning.utilities.cloud_io", load=torch.load)
    import contextlib
    mk("pytorch_lightning.utilities.migration",
       pl_legacy_patch=contextlib.nullcontext)
    pl.utilities = mods["pytorch_lightning.utilities"]

    mk("lpips", LPIPS=_LpipsLPIPS)
    mk("pytorch_msssim", SSIM=_ssim_stub, ssim=_ssim_stub)
    mk("torchvision")
    mk("torchvision.utils", save_image=lambda *a, **k: None)
    return mods


# --------------------------------------------------------------------------
# Loader
# --------------------------------------------------------------------------

_cache: dict = {}


def _load_as(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_models():
    """Load the real reference model modules; returns a namespace with
    UNet (unet2), VAE, VQVAE, attention/conv/embedder modules."""
    if "models" in _cache:
        return _cache["models"]

    fake = _build_fake_modules()
    # Synthetic package nodes for the intra-package imports.
    for pkg in ("medical_diffusion", "medical_diffusion.models",
                "medical_diffusion.models.utils",
                "medical_diffusion.models.embedders",
                "medical_diffusion.models.estimators",
                "medical_diffusion.loss"):
        fake[pkg] = types.ModuleType(pkg)

    saved = {k: sys.modules.get(k) for k in fake}
    sys.modules.update(fake)
    try:
        gan_losses = _load_as(REF / "loss/gan_losses.py",
                              "medical_diffusion.loss.gan_losses")
        perceivers = _load_as(REF / "loss/perceivers.py",
                              "medical_diffusion.loss.perceivers")
        model_base = _load_as(REF / "models/model_base.py",
                              "medical_diffusion.models.model_base")
        attention = _load_as(REF / "models/utils/attention_blocks.py",
                             "medical_diffusion.models.utils.attention_blocks")
        conv = _load_as(REF / "models/utils/conv_blocks.py",
                        "medical_diffusion.models.utils.conv_blocks")
        time_emb = _load_as(REF / "models/embedders/time_embedder.py",
                            "medical_diffusion.models.embedders.time_embedder")
        cond_emb = _load_as(REF / "models/embedders/cond_embedders.py",
                            "medical_diffusion.models.embedders.cond_embedders")
        # unet2.py:6 does `from medical_diffusion.models.embedders import TimeEmbbeding`
        emb_pkg = sys.modules["medical_diffusion.models.embedders"]
        emb_pkg.TimeEmbbeding = time_emb.TimeEmbbeding
        emb_pkg.LabelEmbedder = cond_emb.LabelEmbedder
        unet2 = _load_as(REF / "models/estimators/unet2.py",
                         "medical_diffusion.models.estimators.unet2")
        unet_legacy = _load_as(REF / "models/estimators/unet.py",
                               "medical_diffusion.models.estimators.unet")
        latent = _load_as(REF / "models/embedders/latent_embedders.py",
                          "medical_diffusion.models.embedders.latent_embedders")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    ns = types.SimpleNamespace(
        UNet=unet2.UNet,
        UNetLegacy=unet_legacy.UNet,
        VAE=latent.VAE,
        VQVAE=latent.VQVAE,
        VAEGAN=latent.VAEGAN,
        VQGAN=latent.VQGAN,
        Discriminator=latent.Discriminator,
        DiagonalGaussianDistribution=latent.DiagonalGaussianDistribution,
        attention_blocks=attention,
        conv_blocks=conv,
        time_embedder=time_emb,
        cond_embedders=cond_emb,
        latent_embedders=latent,
        unet2=unet2,
        gan_losses=gan_losses,
        perceivers=perceivers,
        model_base=model_base,
    )
    _cache["models"] = ns
    return ns
