"""Classifier-guided sampling (Dhariwal & Nichol, arXiv:2105.05233 Alg. 2)
— the use for the vendored-but-unused ``EncoderUNetModel`` classifier half
(reference external/stable_diffusion/unet_openai.py:747-961).

Checks: (1) the eps shift matches the formula against a hand-computed
classifier score; (2) guidance steers samples toward the target class mode
of an analytic classifier; (3) the real EncoderUNetOpenAI classifier drives
a jitted multi-step guided denoise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medfusion_tpu.core import schedules as S
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.pipelines.diffusion import (
    DiffusionPipeline,
    make_classifier_grad,
)

T = 50


class _ZeroEstimator:
    """eps-estimator predicting zeros: (y, []) with y = 0."""

    def apply(self, variables, x_t, t, condition=None, self_cond=None,
              cond_mask=None):
        return jnp.zeros_like(x_t), []


def _pipe(clip=False):
    sched = GaussianDiffusionSchedule.create(
        timesteps=T, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    return DiffusionPipeline(scheduler=sched, noise_estimator=_ZeroEstimator(),
                             latent_embedder=None, estimator_objective="x_T",
                             clip_x0=clip, do_input_centering=False)


def test_eps_shift_matches_formula():
    """x_T returned by estimate() == eps - s*sqrt(1-abar_t)*grad, with grad
    from a quadratic log p(y|x) whose score is known in closed form."""
    pipe = _pipe()
    sched = pipe.scheduler
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
    t = jnp.asarray([3, 40], jnp.int32)
    c = 0.7  # logits = [-(x-c)^2/2 summed, 0] -> analytic grad below

    def classifier(x_t, tt):
        l0 = -0.5 * jnp.sum((x_t - c) ** 2, axis=(1, 2, 3))
        return jnp.stack([l0, jnp.zeros_like(l0)], axis=-1)

    label = jnp.asarray([0, 0], jnp.int32)
    grad_fn = make_classifier_grad(classifier, label)

    # analytic: d/dx log softmax(logits)[0] = (1 - p0) * d l0/dx = (1-p0)*(c-x)
    logits = classifier(x, t)
    p0 = jax.nn.softmax(logits, axis=-1)[:, 0].reshape(-1, 1, 1, 1)
    want_grad = (1.0 - p0) * (c - x)
    np.testing.assert_allclose(np.asarray(grad_fn(x, t)),
                               np.asarray(want_grad), atol=1e-5)

    scale = 2.5
    _, _, x_T, _ = pipe.estimate({"noise_estimator": {}}, x, t,
                                 classifier_grad=grad_fn,
                                 classifier_scale=scale)
    shift = S.extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    want_eps = jnp.zeros_like(x) - scale * shift * want_grad
    np.testing.assert_allclose(np.asarray(x_T), np.asarray(want_eps),
                               atol=1e-5)


def test_guidance_steers_samples_toward_class_mode():
    """Full guided denoise: with logits = -||x - mu_y||^2/2 the guided
    samples land closer to mu_y than unguided ones, and flipping the label
    flips the direction."""
    pipe = _pipe()
    mus = jnp.asarray([-1.5, 1.5])

    def classifier(x_t, tt):
        d = [-0.5 * jnp.sum((x_t - m) ** 2, axis=(1, 2, 3)) for m in mus]
        return jnp.stack(d, axis=-1)

    x_init = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 1))

    def run(label_val, scale):
        label = jnp.full((8,), label_val, jnp.int32)
        out = pipe.denoise(
            {"noise_estimator": {}}, x_init, jax.random.PRNGKey(1),
            steps=25, use_ddim=True, eta=0.0, decode=False,
            classifier_grad=make_classifier_grad(classifier, label),
            classifier_scale=scale)
        return float(jnp.mean(out))

    base = run(0, 0.0)
    lo = run(0, 4.0)
    hi = run(1, 4.0)
    assert lo < base < hi, (lo, base, hi)
    assert hi - lo > 0.3  # guidance moved the population, not noise


def test_encoder_unet_openai_drives_guided_sampling():
    """The rebuilt classifier half plugs in as the guidance model inside a
    jitted multi-step denoise."""
    from medfusion_tpu.models.unet_openai import EncoderUNetOpenAI

    clf = EncoderUNetOpenAI(image_size=8, in_channels=2, model_channels=32,
                            out_channels=3, num_res_blocks=1,
                            channel_mult=(1, 2), pool="adaptive")
    x0 = jnp.zeros((2, 8, 8, 2))
    t0 = jnp.zeros((2,), jnp.int32)
    clf_params = clf.init(jax.random.PRNGKey(0), x0, t0)["params"]
    label = jnp.asarray([0, 2], jnp.int32)
    grad_fn = make_classifier_grad(
        lambda x, t: clf.apply({"params": clf_params}, x, t), label)

    pipe = _pipe(clip=True)
    out = jax.jit(lambda x, r: pipe.denoise(
        {"noise_estimator": {}}, x, r, steps=5, use_ddim=True, eta=0.0,
        decode=False, classifier_grad=grad_fn, classifier_scale=1.0))(
            jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 2)),
            jax.random.PRNGKey(3))
    assert out.shape == (2, 8, 8, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_classifier_guidance_requires_eps_objective():
    pipe = DiffusionPipeline(
        scheduler=GaussianDiffusionSchedule.create(
            timesteps=T, schedule_strategy="scaled_linear",
            beta_start=0.002, beta_end=0.02),
        noise_estimator=_ZeroEstimator(), latent_embedder=None,
        estimator_objective="x_0", do_input_centering=False)
    # ValueError (not assert): survives python -O (user-facing validation)
    with pytest.raises(ValueError, match="eps"):
        pipe.estimate({"noise_estimator": {}}, jnp.zeros((1, 4, 4, 1)),
                      jnp.zeros((1,), jnp.int32),
                      classifier_grad=lambda x, t: x,
                      classifier_scale=1.0)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_guided_sampling_matches_single_device():
    """make_sharded_sampler(classifier_apply=...) over the 8-device mesh
    equals the unsharded guided denoise (condition doubles as the guidance
    label per slot)."""
    from medfusion_tpu.parallel import make_mesh, make_sharded_sampler

    pipe = _pipe()
    mus = jnp.asarray([-1.0, 1.0])

    def classifier(x_t, tt):
        d = [-0.5 * jnp.sum((x_t - m) ** 2, axis=(1, 2, 3)) for m in mus]
        return jnp.stack(d, axis=-1)

    mesh = make_mesh(n_model=1)
    n = 2 * mesh.shape["data"]
    cond = jnp.asarray([i % 2 for i in range(n)], jnp.int32)
    sampler = make_sharded_sampler(
        pipe, mesh, (4, 4, 1), steps=10, use_ddim=True, eta=0.0,
        decode=False, classifier_apply=classifier, classifier_scale=3.0)
    rng = jax.random.PRNGKey(7)
    got = np.asarray(sampler({"noise_estimator": {}}, rng, n, condition=cond))

    # reproduce unsharded: same rng split + init noise as _sample
    k_init, k_loop = jax.random.split(rng)
    x_T = jax.random.normal(k_init, (n, 4, 4, 1))
    from medfusion_tpu.pipelines.diffusion import make_classifier_grad

    want = np.asarray(pipe.denoise(
        {"noise_estimator": {}}, x_T, k_loop, condition=cond, steps=10,
        use_ddim=True, eta=0.0, decode=False,
        classifier_grad=make_classifier_grad(classifier, cond),
        classifier_scale=3.0))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # guidance actually pulled the two label populations apart
    assert float(np.mean(want[1::2])) > float(np.mean(want[0::2]))


def test_sharded_sampler_rejects_classifier_with_fast_paths():
    from medfusion_tpu.parallel import make_mesh, make_sharded_sampler

    pipe = _pipe()
    mesh = make_mesh(n_model=1)
    with pytest.raises(ValueError):
        make_sharded_sampler(pipe, mesh, (4, 4, 1), encoder_key_every=3,
                             classifier_apply=lambda x, t: x)


def test_dpmpp_guided_sampling_steers_by_label():
    """Classifier guidance through DPM-Solver++(2M): the guided eps defines
    the guided score the solver integrates — flipping the label flips the
    population mean, exactly as with the DDIM path."""
    pipe = _pipe()
    mus = jnp.asarray([-1.5, 1.5])

    def classifier(x_t, tt):
        d = [-0.5 * jnp.sum((x_t - m) ** 2, axis=(1, 2, 3)) for m in mus]
        return jnp.stack(d, axis=-1)

    x_init = jax.random.normal(jax.random.PRNGKey(10), (8, 4, 4, 1))

    def run(label_val, scale):
        label = jnp.full((8,), label_val, jnp.int32)
        out = pipe.denoise_dpmpp(
            {"noise_estimator": {}}, x_init, steps=20, decode=False,
            classifier_grad=make_classifier_grad(classifier, label),
            classifier_scale=scale)
        return float(jnp.mean(out))

    base = run(0, 0.0)
    lo = run(0, 4.0)
    hi = run(1, 4.0)
    assert lo < base < hi, (lo, base, hi)
