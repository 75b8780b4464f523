"""Classifier guidance callback builder (Dhariwal & Nichol,
arXiv:2105.05233 Alg. 2) — the reference vendors the classifier but never
uses it; here it is a working feature."""

import jax
import jax.numpy as jnp


def make_classifier_grad(classifier_apply, label):
    """Build the ``classifier_grad(x_t, t)`` callback for classifier-guided
    sampling (Dhariwal & Nichol, *Diffusion Models Beat GANs on Image
    Synthesis*, arXiv:2105.05233 Alg. 2).

    ``classifier_apply(x_t, t) -> [B, K]`` logits of a noisy-image classifier
    (e.g. :class:`medfusion_tpu.models.unet_openai.EncoderUNetOpenAI` — the
    vendored classifier half the reference ships but never uses,
    unet_openai.py:747-961). ``label``: [B] int targets. Returns
    ``grad(x_t, t) = d/dx_t sum_b log softmax(logits)[b, label_b]`` — the
    per-sample score of p(y|x_t) (the sum decouples across the batch).
    """

    def grad_fn(x_t, t):
        def logp(x):
            logits = classifier_apply(x, t)
            lp = jax.nn.log_softmax(logits, axis=-1)
            lab = jnp.asarray(label)[:, None]
            return jnp.sum(jnp.take_along_axis(lp, lab, axis=-1))

        return jax.grad(logp)(x_t)


    return grad_fn
