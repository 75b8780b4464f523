"""SSIM / MS-SSIM, channels-last, 2D and 3D.

Semantics parity with the ``pytorch_msssim`` package the reference uses
(``latent_embedders.py:797-800`` calls ``ssim(..., data_range=1,
size_average=False, nonnegative_ssim=True)``): gaussian window (size 11,
sigma 1.5), separable depthwise convolution with VALID padding, K=(0.01, 0.03),
per-channel maps averaged over spatial dims then channels.

TPU notes: the separable blur is expressed as per-axis depthwise convs —
static shapes, fuses well under XLA; everything is differentiable for use as a
training loss.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(win_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur_axis(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise VALID 1-D gaussian blur along a spatial axis of [B,*sp,C]."""
    nsp = x.ndim - 2
    c = x.shape[-1]
    ksize = kernel.shape[0]
    kshape = [ksize if d == axis - 1 else 1 for d in range(nsp)] + [1, c]
    w = jnp.broadcast_to(kernel.reshape(kshape[:nsp] + [1, 1]), kshape)
    spec = "DHW"[3 - nsp :]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kshape, (f"N{spec}C", f"{spec}IO", f"N{spec}C")
    )
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,) * nsp, "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )


def _gaussian_filter(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    for axis in range(1, x.ndim - 1):
        x = _blur_axis(x, kernel, axis)
    return x


def _ssim_per_channel(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float,
    win_size: int,
    win_sigma: float,
    k: Tuple[float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ssim_per_channel, cs_per_channel), both [B, C]."""
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # pytorch_msssim asserts win_size < min spatial dim; instead shrink the
    # window for small inputs (deep-supervision pyramid levels) so the VALID
    # conv never produces an empty reduction. Identical at realistic sizes.
    min_sp = min(x.shape[1:-1])
    if win_size > min_sp:
        win_size = min_sp if min_sp % 2 == 1 else min_sp - 1
    kernel = jnp.asarray(_gaussian_kernel1d(win_size, win_sigma))

    mu_x = _gaussian_filter(x, kernel)
    mu_y = _gaussian_filter(y, kernel)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = _gaussian_filter(x * x, kernel) - mu_xx
    sigma_yy = _gaussian_filter(y * y, kernel) - mu_yy
    sigma_xy = _gaussian_filter(x * y, kernel) - mu_xy

    cs_map = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    sp_axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(ssim_map, axis=sp_axes), jnp.mean(cs_map, axis=sp_axes)


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k: Tuple[float, float] = (0.01, 0.03),
    nonnegative_ssim: bool = False,
) -> jnp.ndarray:
    """SSIM over channels-last images. Returns scalar (size_average) or [B]."""
    s, _ = _ssim_per_channel(x, y, data_range, win_size, win_sigma, k)
    if nonnegative_ssim:
        s = jax.nn.relu(s)
    s = jnp.mean(s, axis=1)
    return jnp.mean(s) if size_average else s


_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k: Tuple[float, float] = (0.01, 0.03),
    weights: Sequence[float] = _MS_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM (5 scales, avg-pool 2 between scales)."""
    weights_arr = jnp.asarray(weights, x.dtype)
    levels = len(weights)
    nsp = x.ndim - 2
    mcs = []
    s = jnp.zeros(())
    for i in range(levels):
        s, cs = _ssim_per_channel(x, y, data_range, win_size, win_sigma, k)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            window = (1,) + (2,) * nsp + (1,)
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window, "VALID") / 2**nsp
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, window, window, "VALID") / 2**nsp
    s = jax.nn.relu(s)
    stack = jnp.stack(mcs + [s], axis=0)  # [levels, B, C]
    out = jnp.prod(stack ** weights_arr[:, None, None], axis=0)
    out = jnp.mean(out, axis=1)
    return jnp.mean(out) if size_average else out
