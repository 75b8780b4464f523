"""Metrics: Improved P/R vs brute-force oracle, FID analytic cases, InceptionV3."""

import numpy as np
import jax
import jax.numpy as jnp

from medfusion_tpu.metrics import (
    FrechetInceptionDistance,
    ImprovedPrecisionRecall,
    InceptionV3,
    convert_torch_inception,
    frechet_distance,
    precision_recall,
)


def _brute_force_pr(real, fake, knn=3):
    """Reference algorithm (torchmetrics_pr_recall.py:125-168) in plain numpy."""

    def dists(a, b):
        return np.sqrt(np.clip(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1), 0, None))

    def radii(x):
        d = dists(x, x)
        return np.sort(d, axis=1)[:, knn]  # k+1 smallest incl. self(0) -> index knn

    def member(ref, ref_r, pred):
        d = dists(ref, pred)
        return float(np.mean(np.any(d < ref_r[:, None], axis=0)))

    return member(real, radii(real), fake), member(fake, radii(fake), real)


def test_precision_recall_matches_bruteforce():
    rng = np.random.default_rng(0)
    real = rng.standard_normal((40, 8)).astype(np.float32)
    fake = (rng.standard_normal((30, 8)) * 1.3 + 0.3).astype(np.float32)
    p, r = precision_recall(jnp.asarray(real), jnp.asarray(fake))
    p_ref, r_ref = _brute_force_pr(real, fake)
    np.testing.assert_allclose(float(p), p_ref, atol=1e-6)
    np.testing.assert_allclose(float(r), r_ref, atol=1e-6)


def test_precision_recall_extremes():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20, 4)).astype(np.float32)
    p, r = precision_recall(jnp.asarray(x), jnp.asarray(x))
    assert float(p) == 1.0 and float(r) == 1.0
    far = x + 1000.0
    p, r = precision_recall(jnp.asarray(x), jnp.asarray(far))
    assert float(p) == 0.0 and float(r) == 0.0


def test_precision_recall_chunked_matches_unchunked():
    """Row-chunked path (reference splits_* chunking, torchmetrics_pr_recall.py
    :151-168) is exactly the unchunked result, incl. a chunk that does not
    divide N."""
    rng = np.random.default_rng(7)
    real = rng.standard_normal((53, 8)).astype(np.float32)
    fake = (rng.standard_normal((41, 8)) * 1.2 + 0.2).astype(np.float32)
    p0, r0 = precision_recall(jnp.asarray(real), jnp.asarray(fake))
    for chunk in (7, 16, 53):
        p, r = precision_recall(jnp.asarray(real), jnp.asarray(fake), row_chunk=chunk)
        np.testing.assert_allclose(float(p), float(p0), atol=1e-6)
        np.testing.assert_allclose(float(r), float(r0), atol=1e-6)


def test_precision_recall_10k_scale_chunked():
    """BASELINE config-5 scale (10k x 10k manifolds) runs without
    materializing the full distance matrix (tiny feature dim keeps CPU time
    bounded; memory is what the chunking bounds)."""
    rng = np.random.default_rng(8)
    real = rng.standard_normal((10_000, 4)).astype(np.float32)
    fake = (rng.standard_normal((10_000, 4)) + 0.1).astype(np.float32)
    ipr = ImprovedPrecisionRecall(row_chunk=1024)
    ipr.update(real, real=True)
    ipr.update(fake, real=False)
    p, r = ipr.compute()
    # Same-ish distributions: both metrics should be high but not degenerate.
    assert 0.5 < p <= 1.0 and 0.5 < r <= 1.0


def test_accumulator_api():
    rng = np.random.default_rng(2)
    ipr = ImprovedPrecisionRecall()
    for _ in range(3):
        ipr.update(rng.standard_normal((10, 6)), real=True)
        ipr.update(rng.standard_normal((10, 6)), real=False)
    p, r = ipr.compute()
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0


def test_frechet_distance_analytic():
    # identical gaussians -> 0
    mu = jnp.asarray(np.random.default_rng(3).standard_normal(5).astype(np.float32))
    a = np.random.default_rng(4).standard_normal((5, 5)).astype(np.float32)
    sigma = jnp.asarray(a @ a.T + 5 * np.eye(5, dtype=np.float32))
    np.testing.assert_allclose(float(frechet_distance(mu, sigma, mu, sigma)), 0.0, atol=1e-2)
    # diagonal case: d^2 = sum((mu1-mu2)^2) + sum(s1 + s2 - 2 sqrt(s1 s2))
    s1 = np.asarray([1.0, 2.0, 3.0])
    s2 = np.asarray([2.0, 2.0, 1.0])
    mu1 = np.asarray([0.0, 1.0, -1.0])
    mu2 = np.asarray([1.0, 1.0, 1.0])
    expected = ((mu1 - mu2) ** 2).sum() + (s1 + s2 - 2 * np.sqrt(s1 * s2)).sum()
    got = float(frechet_distance(jnp.asarray(mu1, jnp.float32), jnp.asarray(np.diag(s1), jnp.float32),
                                 jnp.asarray(mu2, jnp.float32), jnp.asarray(np.diag(s2), jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_fid_accumulator_same_distribution_near_zero():
    rng = np.random.default_rng(5)
    fid = FrechetInceptionDistance()
    base = rng.standard_normal((400, 16))
    fid.update(base[:200], real=True)
    fid.update(base[200:], real=False)
    assert fid.compute() < 1.5  # finite-sample noise only
    fid.reset()
    fid.update(base[:200], real=True)
    fid.update(base[200:] + 10.0, real=False)
    assert fid.compute() > 90.0  # ~ ||10||^2 * dim


def test_inception_v3_forward_and_converter():
    net = InceptionV3()
    x = jnp.asarray(np.random.default_rng(6).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    feats = net.apply({"params": params}, x)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))
    # converter: synthetic torch keys for one BasicConv2d
    sd = {
        "Conv2d_1a_3x3.conv.weight": np.ones((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.full((32,), 2.0, np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros((), np.int64),
    }
    conv = convert_torch_inception(sd)
    assert conv["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert float(conv["Conv2d_1a_3x3"]["bn_scale"][0]) == 2.0
    # converted subtree is loadable into the real param tree
    merged = dict(params)
    merged["Conv2d_1a_3x3"] = {**params["Conv2d_1a_3x3"], **conv["Conv2d_1a_3x3"]}
    feats2 = net.apply({"params": merged}, x)
    assert feats2.shape == (2, 2048)
