"""LPIPS perceptual loss — VGG16 backbone in flax, channels-last.

Parity with the reference's perceptual loss
(``/root/reference/medical_diffusion/loss/perceivers.py:6-26``), which wraps
``lpips.LPIPS(net='vgg', lpips=False)``:

* inputs in [-1, 1] are shifted/scaled by fixed ImageNet statistics
  (the lpips package ScalingLayer constants),
* VGG16 features are taken after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3,
* each feature map is unit-normalized along channels, squared differences are
  summed over channels (``lpips=False`` -> NO learned linear heads) and
  spatially averaged, then summed over the 5 stages -> per-image [B, 1, 1, 1].
* 3D inputs [B, D, H, W, C]: per-depth-slice 2D LPIPS averaged
  (perceivers.py:21-24), vmapped over depth instead of a host loop.

Weights: the environment has no torchvision/lpips download path, so the
backbone initializes randomly unless a converted weight file is supplied —
``load_vgg16_npz`` consumes an .npz exported from a torchvision VGG16
state_dict (see ``convert_torch_vgg16``). Quality numbers comparable with the
reference require the pretrained weights; the loss is otherwise still a valid
(random-projection) perceptual metric and the full code path is exercised.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (fixed buffers in the lpips package).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# VGG16 conv plan: (out_channels, n_convs) per stage; maxpool between stages.
_VGG_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """VGG16 feature extractor returning the 5 relu stage outputs."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        feats = []
        idx = 0  # torchvision features index, kept in names for the converter
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{idx}")(x)
                idx += 2  # conv + relu in the torchvision Sequential
                x = nn.relu(x)
            feats.append(x)
            if stage < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
                idx += 1
        return feats


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg', lpips=False) equivalent. Input NHWC in [-1, 1]
    (or [0, 1] with ``normalize=True``); 1-channel inputs are broadcast to RGB.
    Returns [B, 1, 1, 1] (2D) / [B, 1, 1, 1, 1] (3D)."""

    normalize: bool = False

    @nn.compact
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if pred.ndim == 5:  # 3D: fold depth into batch, average per-depth losses
            b, d = pred.shape[0], pred.shape[1]
            p2 = pred.reshape((b * d,) + pred.shape[2:])
            t2 = target.reshape((b * d,) + target.shape[2:])
            val = self._lpips_2d(p2, t2).reshape(b, d, 1, 1, 1)
            return jnp.mean(val, axis=1, keepdims=True)  # [B,1,1,1,1]

        return self._lpips_2d(pred, target)

    def _lpips_2d(self, pred, target):
        if self.normalize:
            pred = 2 * pred - 1
            target = 2 * target - 1
        if pred.shape[-1] == 1:
            pred = jnp.repeat(pred, 3, axis=-1)
            target = jnp.repeat(target, 3, axis=-1)
        shift = jnp.asarray(_SHIFT, pred.dtype)
        scale = jnp.asarray(_SCALE, pred.dtype)
        net = VGG16Features(name="vgg")
        f_pred = net((pred - shift) / scale)
        f_tgt = net((target - shift) / scale)
        total = 0.0
        for fp, ft in zip(f_pred, f_tgt):
            diff = (_unit_normalize(fp) - _unit_normalize(ft)) ** 2
            total = total + jnp.mean(jnp.sum(diff, axis=-1), axis=(1, 2))
        return total.reshape(-1, 1, 1, 1)


def convert_torch_vgg16(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """torchvision VGG16 ``features.*`` state_dict (numpy-valued) -> flax params
    for :class:`VGG16Features`. Kernel layout [O, I, kh, kw] -> [kh, kw, I, O]."""
    params = {}
    for key, val in state_dict.items():
        if not key.startswith("features."):
            continue
        _, idx, kind = key.split(".")
        name = f"conv_{idx}"
        arr = np.asarray(val)
        entry = params.setdefault(name, {})
        if kind == "weight":
            entry["kernel"] = np.transpose(arr, (2, 3, 1, 0))
        elif kind == "bias":
            entry["bias"] = arr
    return params


def load_vgg16_npz(path: str) -> Dict:
    """Load converted VGG16 weights from an .npz of flattened 'conv_i/kernel' keys."""
    raw = np.load(path)
    params: Dict = {}
    for key in raw.files:
        mod, leaf = key.split("/")
        params.setdefault(mod, {})[leaf] = raw[key]
    return params
