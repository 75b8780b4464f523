"""3D volume dataset.

Capability parity with the reference ``SimpleDataset3D``
(``/root/reference/medical_diffusion/data/datasets/dataset_simple_3d.py:12-58``),
which loads NIfTI via torchio (not installed in this image): crawler + loader +
resize/flip/crop-or-pad + z-norm-or-rescale to [-1, 1], output [D, H, W, C]
channels-last (the reference emits [C, D, H, W]).

Supported containers: ``.npy``/``.npz`` volumes ([D, H, W] or [D, H, W, C])
and single-file NIfTI-1 ``.nii``/``.nii.gz`` (via the in-repo affine-free
reader :mod:`medfusion_tpu.data.nifti`; pass ``crawler_ext="nii.gz"``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from medfusion_tpu.nn import functional as F
import jax.numpy as jnp


def crop_or_pad(vol: np.ndarray, target: Sequence[Optional[int]]) -> np.ndarray:
    """Center crop-or-pad each spatial dim; None keeps the input size
    (reference CropOrPad_None, augmentations_3d.py:7-21)."""
    out = vol
    for axis, t in enumerate(target):
        if t is None or out.shape[axis] == t:
            continue
        s = out.shape[axis]
        if s > t:
            start = (s - t) // 2
            out = np.take(out, range(start, start + t), axis=axis)
        else:
            pad = [(0, 0)] * out.ndim
            pad[axis] = ((t - s) // 2, t - s - (t - s) // 2)
            out = np.pad(out, pad)
    return out


class SimpleDataset3D:
    def __init__(
        self,
        path_root,
        item_pointers: Sequence = (),
        crawler_ext: str = "npy",
        transform=None,
        image_resize: Optional[Tuple[int, int, int]] = None,
        flip: bool = False,
        image_crop: Optional[Tuple[Optional[int], ...]] = None,
        use_znorm: bool = True,
        seed: int = 0,
    ):
        self.path_root = Path(path_root)
        self.rng = np.random.default_rng(seed)
        self.item_pointers = (
            list(item_pointers)
            if len(item_pointers)
            else sorted(p.relative_to(self.path_root) for p in self.path_root.rglob(f"*.{crawler_ext}"))
        )
        self.transform = transform
        self.image_resize = image_resize
        self.flip = flip
        self.image_crop = image_crop
        self.use_znorm = use_znorm

    def __len__(self):
        return len(self.item_pointers)

    def load_item(self, path_item) -> np.ndarray:
        name = Path(path_item).name.lower()
        if name.endswith(".nii") or name.endswith(".nii.gz"):
            from medfusion_tpu.data.nifti import read_nifti

            return np.asarray(read_nifti(path_item), np.float32)
        arr = np.load(path_item)
        if hasattr(arr, "files"):  # npz
            arr = arr[arr.files[0]]
        return np.asarray(arr, np.float32)

    def __getitem__(self, index):
        rel = Path(self.item_pointers[index])
        vol = self.load_item(self.path_root / rel)
        if vol.ndim == 3:
            vol = vol[..., None]  # [D, H, W, 1]
        if self.transform is not None:
            return {"uid": rel.stem, "source": self.transform(vol, self.rng)}
        if self.image_resize is not None:
            vol = np.asarray(
                F.interpolate_nearest_exact(jnp.asarray(vol[None]), self.image_resize)[0]
            )
        if self.flip:
            for axis in range(3):
                if self.rng.random() < 0.5:
                    vol = np.flip(vol, axis=axis)
        if self.image_crop is not None:
            vol = crop_or_pad(vol, self.image_crop)
        if self.use_znorm:
            vol = (vol - vol.mean()) / (vol.std() + 1e-8)
        else:
            lo, hi = vol.min(), vol.max()
            vol = 2 * (vol - lo) / (hi - lo + 1e-8) - 1
        return {"uid": rel.stem, "source": np.ascontiguousarray(vol, np.float32)}
