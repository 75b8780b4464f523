"""Metrics/observability: TensorBoard + JSONL scalar writer, image grid dumps.

Replaces the reference's Lightning ``self.log`` -> TensorBoard flow and its
in-train-step image saves (``diffusion_pipeline.py:199-226``,
``latent_embedders.py:840-853``) with an explicit writer driven from the host
train loop — keeping the jitted step python-free (SURVEY.md §7 hard parts).
Metric names match the reference (``train/loss``, ``train/L1``, ...) for
comparability.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float], prefix: str = "train") -> None:
        row = {"step": int(step), "time": time.time()}
        for name, val in scalars.items():
            key = f"{prefix}/{name}"
            val = float(np.asarray(val))
            row[key] = val
            if self._tb is not None:
                self._tb.add_scalar(key, val, int(step))
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to uint8 (torchvision save_image(normalize=True))."""
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo)
    return (img * 255).clip(0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path, nrow: Optional[int] = None,
                    normalize: bool = True, padding: int = 2) -> None:
    """[N, H, W, C] -> one PNG grid (torchvision save_image equivalent)."""
    from PIL import Image

    n, h, w, c = images.shape
    nrow = nrow or int(np.ceil(np.sqrt(n)))
    ncol = int(np.ceil(n / nrow))
    grid = np.zeros((ncol * (h + padding) + padding, nrow * (w + padding) + padding, c),
                    np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        y, x = r * (h + padding) + padding, col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    arr = to_uint8(grid) if normalize else (grid * 255).clip(0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)
