"""Fréchet Inception Distance.

Parity with torchmetrics' ``FID()`` as used by the reference eval script
(``/root/reference/scripts/evaluate_images.py:18,71,121``): InceptionV3-2048
features (see :mod:`medfusion_tpu.metrics.inception`), gaussian fit per set,
d^2 = ||mu1 - mu2||^2 + tr(S1 + S2 - 2 (S1 S2)^{1/2}).

The matrix square root uses the symmetric-eigh formulation
tr((S1 S2)^{1/2}) = tr((S1^{1/2} S2 S1^{1/2})^{1/2}) — numerically stable,
jit-compatible (no scipy.linalg.sqrtm host call).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sqrtm_psd(a: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    w, v = jnp.linalg.eigh(a)
    w = jnp.sqrt(jnp.clip(w, eps))
    return (v * w) @ v.T


@jax.jit
def frechet_distance(mu1, sigma1, mu2, sigma2) -> jnp.ndarray:
    s1_half = _sqrtm_psd(sigma1)
    covmean_tr = jnp.trace(_sqrtm_psd(s1_half @ sigma2 @ s1_half))
    diff = mu1 - mu2
    return diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * covmean_tr


def gaussian_stats(features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mu, sigma) with the unbiased covariance (torchmetrics/np.cov default)."""
    mu = jnp.mean(features, axis=0)
    centered = features - mu
    n = features.shape[0]
    sigma = centered.T @ centered / (n - 1)
    return mu, sigma


class FrechetInceptionDistance:
    """Stateful accumulator: update(features, real) / compute().

    Features come from :class:`medfusion_tpu.metrics.inception.InceptionV3`
    (or any embedding). Computation runs in float64 on host for the eigh
    (2048x2048) like the torch stack does."""

    def __init__(self):
        self._real: List[np.ndarray] = []
        self._fake: List[np.ndarray] = []

    def update(self, features, real: bool) -> None:
        (self._real if real else self._fake).append(np.asarray(features, np.float64))

    def compute(self) -> float:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        mu1, s1 = np.mean(real, 0), np.atleast_2d(np.cov(real, rowvar=False))
        mu2, s2 = np.mean(fake, 0), np.atleast_2d(np.cov(fake, rowvar=False))

        # float64 host path (jax default dtype is f32; the 2048^2 eigh wants f64)
        def sqrtm(a):
            w, v = np.linalg.eigh(a)
            w = np.sqrt(np.clip(w, 1e-12, None))
            return (v * w) @ v.T

        s1h = sqrtm(s1)
        covmean_tr = np.trace(sqrtm(s1h @ s2 @ s1h))
        diff = mu1 - mu2
        return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * covmean_tr)

    def reset(self) -> None:
        self._real, self._fake = [], []
