"""Image transforms, numpy/PIL, channels-last.

Parity with the reference default pipeline
(``/root/reference/medical_diffusion/data/datasets/dataset_simple_2d.py:33-45``):
Resize -> RandomHorizontalFlip -> RandomVerticalFlip -> CenterCrop -> ToTensor
-> Normalize(0.5, 0.5) == [0,1] -> [-1,1]; plus the auxiliary 2D augmentations
(``augmentations_2d.py:5-27``: 16-bit to array, min-max normalize, random
background fill). RNG is an explicit ``np.random.Generator``."""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image


def resize(img: Image.Image, size: Union[int, Tuple[int, int]]) -> Image.Image:
    """torchvision T.Resize semantics: int -> shorter side, keep aspect."""
    if isinstance(size, int):
        w, h = img.size
        if w < h:
            size = (int(round(h * size / w)), size)  # (H, W)
        else:
            size = (size, int(round(w * size / h)))
    h, w = size
    return img.resize((w, h), Image.BILINEAR)


def center_crop(arr: np.ndarray, size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """[H, W, C]; pads with zeros when the crop exceeds the image (torchvision)."""
    th, tw = (size, size) if isinstance(size, int) else size
    h, w = arr.shape[:2]
    if th > h or tw > w:
        out = np.zeros((max(th, h), max(tw, w), arr.shape[2]), arr.dtype)
        y0, x0 = (out.shape[0] - h) // 2, (out.shape[1] - w) // 2
        out[y0:y0 + h, x0:x0 + w] = arr
        arr, (h, w) = out, out.shape[:2]
    y0, x0 = (h - th) // 2, (w - tw) // 2
    return arr[y0:y0 + th, x0:x0 + tw]


def to_array(img: Union[Image.Image, np.ndarray]) -> np.ndarray:
    """PIL -> float32 [H, W, C] in [0, 1] (T.ToTensor, but channels-last)."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32)


def to_array_16bit(img) -> np.ndarray:
    """augmentations_2d.ToTensor16bit: int32 array + channel dim (no scaling)."""
    arr = np.array(img, np.int32, copy=True)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def normalize_minmax(arr: np.ndarray) -> np.ndarray:
    """augmentations_2d.Normalize: min-max rescale to [0, 1], float32."""
    arr = arr.astype(np.float32)
    lo, hi = arr.min(), arr.max()
    return (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)


def random_background(arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """augmentations_2d.RandomBackground: zero pixels -> uniform noise."""
    out = arr.copy()
    mask = out == 0
    out[mask] = rng.random(int(mask.sum()), dtype=np.float32)
    return out


class Compose2D:
    """The reference default transform as one callable(img, rng) -> [H,W,C]
    float32 in [-1, 1]."""

    def __init__(
        self,
        image_resize: Optional[Union[int, Tuple[int, int]]] = None,
        augment_horizontal_flip: bool = False,
        augment_vertical_flip: bool = False,
        image_crop: Optional[Union[int, Tuple[int, int]]] = None,
        extra: Sequence[Callable] = (),
    ):
        self.image_resize = image_resize
        self.augment_horizontal_flip = augment_horizontal_flip
        self.augment_vertical_flip = augment_vertical_flip
        self.image_crop = image_crop
        self.extra = tuple(extra)

    def __call__(self, img: Image.Image, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        if self.image_resize is not None:
            img = resize(img, self.image_resize)
        arr = to_array(img)
        if self.augment_horizontal_flip and rng.random() < 0.5:
            arr = arr[:, ::-1]
        if self.augment_vertical_flip and rng.random() < 0.5:
            arr = arr[::-1]
        if self.image_crop is not None:
            arr = center_crop(arr, self.image_crop)
        arr = (arr - 0.5) / 0.5
        for fn in self.extra:
            arr = fn(arr)
        return np.ascontiguousarray(arr, np.float32)
