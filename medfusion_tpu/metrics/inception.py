"""InceptionV3 FID feature extractor — flax, channels-last.

The reference's FID/IPR featurizer is torch-fidelity's
``FeatureExtractorInceptionV3`` (``torchmetrics_pr_recall.py:20-37``,
``evaluate_images.py:18``): the TF-Inception graph with the pytorch-fid
compatibility patches — branch-pool average pooling with
``count_include_pad=False`` in the A/C/E blocks and a MAX pool branch in the
last E block (bug-compatibility with the original TF weights).

Input protocol (NoTrainInceptionV3): uint8 [0,255] NHWC -> float; bilinear
resize to 299x299; normalize (x - 128) / 128; output: 2048-d pool3 features.
Note: ``jax.image.resize`` bilinear is TF2-style; torch-fidelity re-implements
TF1's ``resize_bilinear``. At 256->299 the difference is sub-pixel; validated
FID comparisons should use one featurizer consistently (as must any FID).

Weights: ``convert_torch_inception`` consumes a torch-fidelity/pytorch-fid
state_dict exported to numpy; without it the network is randomly initialized
(the metric machinery still runs; absolute FID values then aren't comparable
to reference numbers — documented limitation of the zero-egress environment).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    """Conv (no bias) + frozen BatchNorm(eps=1e-3) + relu. BN statistics are
    plain params (inference-only network)."""

    out_channels: int
    kernel_size: Sequence[int] = (3, 3)
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        pad = [(self.padding, self.padding)] * 2 if isinstance(self.padding, int) else self.padding
        x = nn.Conv(self.out_channels, k, strides=self.stride, padding=pad,
                    use_bias=False, name="conv")(x)
        c = self.out_channels
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_3x3_no_pad_count(x):
    """torch avg_pool2d(3, stride=1, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    window = (1, 3, 3, 1)
    strides = (1, 1, 1, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pad)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pad)
    return s / n


def _max_pool(x, k, s):
    return nn.max_pool(x, (k, k), (s, s))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (E_1) or 'max' (E_2, pytorch-fid bug-compat)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_3x3_no_pad_count(x)
        else:
            bp = nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """2048-d FID features from uint8 NHWC images."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]), "bilinear")
        x = (x - 128.0) / 128.0

        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


def convert_torch_inception(state_dict: Dict[str, np.ndarray]) -> Dict:
    """pytorch-fid/torch-fidelity InceptionV3 state_dict (numpy) -> flax params.

    torch module paths like ``Mixed_5b.branch1x1.conv.weight`` map to
    ``Mixed_5b/branch1x1/{conv/kernel, bn_*}``."""
    params: Dict = {}

    def put(path, val):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    for key, val in state_dict.items():
        arr = np.asarray(val)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put("/".join(parts[:-2]) + "/conv/kernel", np.transpose(arr, (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            leaf = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(parts[-1])
            if leaf is not None:
                put("/".join(parts[:-2]) + "/" + leaf, arr)
    return params
