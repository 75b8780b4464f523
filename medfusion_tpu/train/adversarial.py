"""Adversarial autoencoder training (VAEGAN / VQGAN).

Parity with the reference Lightning two-optimizer flow
(``/root/reference/medical_diffusion/models/embedders/latent_embedders.py``
VAEGAN :860-1065, VQGAN :408-616), re-architected as ONE jitted step that runs
both players (Lightning alternates optimizer_idx 0/1 on the same batch; the
step counter advances by 2 per batch to match ``start_gan_train_step``'s
"step increases with each optimizer" semantics, :885).

* Generator loss (:943-961): per pyramid level, rec_loss + gan_loss_weight *
  lambda * (-sum D_level(pred_level)) once step > start_gan_train_step and
  level < 2, plus embedding_loss_weight * emb_loss.
* Adaptive lambda (:1059-1065, eq. 7 of arXiv:2012.09841):
  ||d rec/d w|| / (||d gan/d w|| + 1e-4) clipped to [0, 1e4], stop-gradient,
  where w is the 1x1 zero-init out-conv kernel of that level's decoder head.
  The reference uses a second ``torch.autograd.grad`` w.r.t. one parameter;
  here a single ``jax.vjp`` of (rec, gan) as a function of the kernel (the
  head is a pure 1x1 conv, so the closure recomputes only head + losses)
  yields both gradients with one shared forward.
* Discriminator loss (:963-973): hinge (default) on D(target), D(stop_grad
  pred)) per level, active once step > start_gan_train_step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from medfusion_tpu.losses.gan import hinge_d_loss
from medfusion_tpu.nn.functional import interpolate_area
from medfusion_tpu.train.autoencoder import AutoencoderTrainer
from medfusion_tpu.train.state import TrainState


@struct.dataclass
class GANTrainState:
    """Two-player state; ``step`` counts optimizer steps (2 per batch).

    ``disc_stats`` carries non-trained discriminator variables (BatchNorm
    running statistics of :class:`NLayerDiscriminator`; empty for the
    GroupNorm :class:`Discriminator`)."""

    step: jnp.ndarray
    gen: TrainState
    disc: TrainState
    disc_stats: Any = struct.field(default_factory=dict)

    @classmethod
    def create(cls, gen_params, disc_variables, tx_gen: optax.GradientTransformation,
               tx_disc: optax.GradientTransformation) -> "GANTrainState":
        """``disc_variables``: per-level flax variable dicts from
        :func:`init_discriminators` ({"disc_i": {"params": ..,
        ["batch_stats": ..]}}); bare param trees are accepted too."""
        disc_params, disc_stats = {}, {}
        for k, v in disc_variables.items():
            if isinstance(v, dict) and "params" in v:
                disc_params[k] = v["params"]
                if "batch_stats" in v:
                    disc_stats[k] = v["batch_stats"]
            else:
                disc_params[k] = v
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen=TrainState.create(gen_params, tx_gen),
            disc=TrainState.create(disc_params, tx_disc),
            disc_stats=disc_stats,
        )


def _conv_head(h: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Apply the decoder out-head conv (channels-last). 1x1 heads (in-house
    ``outc``) use a tensordot; spatial heads (the diffusers family's 3x3
    ``decoder.conv_out``) use a same-padded conv."""
    nsp = h.ndim - 2
    if all(k == 1 for k in kernel.shape[:nsp]):
        w = kernel.reshape(kernel.shape[-2], kernel.shape[-1])  # [I, O]
        return jnp.tensordot(h, w, axes=([h.ndim - 1], [0])) + bias
    pads = tuple(((k - 1) // 2, k // 2) for k in kernel.shape[:nsp])
    dn = ("NHWC", "HWIO", "NHWC") if nsp == 2 else ("NDHWC", "DHWIO", "NDHWC")
    return jax.lax.conv_general_dilated(
        h, kernel, window_strides=(1,) * nsp, padding=pads,
        dimension_numbers=dn) + bias


@dataclasses.dataclass(frozen=True)
class AdversarialTrainer:
    """Static config; composes an :class:`AutoencoderTrainer` for rec_loss."""

    ae_trainer: AutoencoderTrainer
    discriminator: Any  # Discriminator flax module (same config per level)
    n_discriminators: int = 1
    gan_loss: Callable = hinge_d_loss
    gan_loss_weight: float = 1.0
    start_gan_train_step: int = 50000
    # discriminator gate; None = start_gan_train_step (in-house flow). The
    # vendored diffusers VQGAN pre-trains D from start//2 (vae.py:733-739).
    start_disc_train_step: Optional[int] = None
    lambda_eps: float = 1e-4

    # ------------------------------------------------------------------

    def _head_leaves(self, ae_params, depth: int):
        """(kernel, bias) of the depth-th decoder out head.

        In-house family: depth 0 -> ``outc``, depth i>0 -> ``outc_ver[i-1]``
        (1x1 zero-init BasicBlocks). Diffusers family: depth 0 ->
        ``decoder.conv_out`` (3x3; the vendored VQGAN's lambda anchor,
        vae.py:698-706) — it has no deep-supervision heads."""
        if "outc" in ae_params:
            name = "outc" if depth == 0 else f"outc_ver_{depth - 1}"
            leaf = ae_params[name]["conv"]["conv"]
        elif "decoder" in ae_params and "conv_out" in ae_params["decoder"]:
            if depth != 0:
                raise ValueError(
                    "the diffusers latent-embedder family has a single out "
                    "head (decoder.conv_out); use n_discriminators=1")
            leaf = ae_params["decoder"]["conv_out"]
        else:
            raise KeyError("cannot locate the decoder out head in ae_params")
        return leaf["kernel"], leaf.get("bias", 0.0)

    def _disc_apply(self, disc_params, disc_stats, depth: int, x,
                    train: bool = True, rng=None):
        """Apply the depth-th discriminator. ``train=True`` matches the
        reference (Lightning keeps the module in train mode, so BatchNorm
        normalizes by batch statistics). ``rng`` feeds the dropout stream for
        discriminators configured with dropout. Returns ``(logits, new_stats)``
        where ``new_stats`` is the level's updated batch_stats dict (None when
        the discriminator has no BatchNorm)."""
        name = f"disc_{depth}"
        variables = {"params": disc_params[name]}
        stats = (disc_stats or {}).get(name)
        if stats:
            variables["batch_stats"] = stats
        rngs = None if rng is None else {"dropout": rng}
        if not train:
            return self.discriminator.apply(variables, x, train=False), stats
        logits, updates = self.discriminator.apply(
            variables, x, train=True, mutable=["batch_stats"], rngs=rngs
        )
        return logits, updates.get("batch_stats", stats)

    def vae_img_loss(
        self, ae_params, disc_params, disc_stats, perceiver_params, pred, h, target,
        step, depth: int, rng=None
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Any]:
        """Reference ``vae_img_loss`` (latent_embedders.py:943-961).

        Returns ``(loss, metrics, level_stats)``; ``level_stats`` is this
        level's BatchNorm running-stat update from the generator-step D(pred)
        forward (the reference's train-mode call at :949 also advances the
        buffers), or None when depth >= 2 / no BatchNorm."""
        at = self.ae_trainer
        # rec_loss with no verticals — matches `self.vqvae.rec_loss(pred, [], target)`
        # (:946) in either flavor (vae: sum/B, vqvae: mean).
        rec = at.rec_loss(perceiver_params, pred, [], target)
        metrics: Dict[str, jnp.ndarray] = {}
        if depth >= 2:
            return rec, metrics, None

        kernel, bias = self._head_leaves(ae_params, depth)
        h_const = jax.lax.stop_gradient(h)

        def f(w):
            p = _conv_head(h_const, w, bias)
            rec_w = at.rec_loss(perceiver_params, p, [], target)
            logits, s_new = self._disc_apply(disc_params, disc_stats, depth, p, rng=rng)
            return (rec_w, -jnp.sum(logits)), s_new

        ((_, gan_loss), vjp, level_stats) = jax.vjp(f, kernel, has_aux=True)
        (g_rec,) = vjp((jnp.ones(()), jnp.zeros(())))
        (g_gan,) = vjp((jnp.zeros(()), jnp.ones(())))
        lam = jnp.linalg.norm(g_rec.ravel()) / (jnp.linalg.norm(g_gan.ravel()) + self.lambda_eps)
        lam = jax.lax.stop_gradient(jnp.clip(lam, 0.0, 1e4))

        active = (step > self.start_gan_train_step).astype(pred.dtype)
        gan_term = self.gan_loss_weight * lam * gan_loss * active
        metrics[f"gan_loss_{depth}"] = gan_term
        metrics[f"lambda_{depth}"] = lam
        return rec + gan_term, metrics, level_stats

    def generator_loss(self, ae_params, disc_params, disc_stats, perceiver_params,
                       batch, rng, step):
        x = batch["source"]
        ae = self.ae_trainer.autoencoder
        pred, pred_vertical, emb_loss, h_top, h_vers = ae.apply(
            {"params": ae_params}, x, train=True,
            method=ae.forward_with_hiddens,
            rngs={"sample": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        disc_sg = jax.lax.stop_gradient(disc_params)
        stats_sg = jax.lax.stop_gradient(disc_stats)
        new_stats = dict(disc_stats or {})
        k_disc = jax.random.fold_in(rng, 2)

        def record(depth, level_stats):
            # Stats advance only while the GAN is active (the reference never
            # calls D before start_gan_train_step, :948).
            if level_stats is None:
                return
            name = f"disc_{depth}"
            new_stats[name] = jax.tree_util.tree_map(
                lambda n, o: jnp.where(step > self.start_gan_train_step, n, o),
                jax.lax.stop_gradient(level_stats), new_stats[name],
            )

        img_loss, metrics, s0 = self.vae_img_loss(
            ae_params, disc_sg, stats_sg, perceiver_params, pred, h_top, x, step, 0,
            rng=jax.random.fold_in(k_disc, 0),
        )
        record(0, s0)
        for i, (pred_i, h_i) in enumerate(zip(pred_vertical, h_vers)):
            target_i = interpolate_area(x, pred_i.shape[1:-1])
            li, mi, si = self.vae_img_loss(
                ae_params, disc_sg, stats_sg, perceiver_params, pred_i, h_i, target_i,
                step, i + 1, rng=jax.random.fold_in(k_disc, i + 1),
            )
            record(i + 1, si)
            img_loss = img_loss + li
            metrics.update(mi)
        loss = img_loss + self.ae_trainer.embedding_loss_weight * emb_loss
        metrics.update(
            img_loss=img_loss, emb_loss=emb_loss, loss_0=loss,
            L1=jnp.mean(jnp.abs(pred - x)), L2=jnp.mean((pred - x) ** 2),
        )
        return loss, (metrics, pred, pred_vertical, new_stats)

    def discriminator_loss(self, disc_params, disc_stats, batch, pred, pred_vertical,
                           step, rng=None):
        """Reference ``gan_img_loss`` summed over levels (:963-973, 1005-1013).

        Returns ``(loss, (metrics, new_stats))``. BatchNorm running statistics
        (NLayerDiscriminator) are threaded real-then-fake per level (matching
        torch's sequential calls; the input ``disc_stats`` should already carry
        the generator step's D(pred) update) and frozen while the GAN is
        inactive — the reference never calls D before ``start_gan_train_step``."""
        x = batch["source"]
        disc_start = (self.start_gan_train_step
                      if self.start_disc_train_step is None
                      else self.start_disc_train_step)
        active = (step > disc_start).astype(x.dtype)
        stats = dict(disc_stats or {})
        k = rng if rng is not None else jax.random.PRNGKey(0)

        def one(depth, p, t):
            logits_real, s = self._disc_apply(
                disc_params, stats, depth, t, rng=jax.random.fold_in(k, 2 * depth)
            )
            if s is not None:
                stats[f"disc_{depth}"] = s
            logits_fake, s = self._disc_apply(
                disc_params, stats, depth, jax.lax.stop_gradient(p),
                rng=jax.random.fold_in(k, 2 * depth + 1),
            )
            if s is not None:
                stats[f"disc_{depth}"] = s
            return self.gan_loss(logits_real, logits_fake) * active

        loss = one(0, pred, x)
        metrics = {"loss_1_0": loss}
        for i, pred_i in enumerate(pred_vertical):
            if i + 1 >= self.n_discriminators:
                break
            target_i = interpolate_area(x, pred_i.shape[1:-1])
            li = one(i + 1, pred_i, target_i)
            metrics[f"loss_1_{i + 1}"] = li
            loss = loss + li
        metrics["loss_1"] = loss
        # Freeze stats until activation (reference gating, :963-967).
        new_stats = jax.tree_util.tree_map(
            lambda new, old: jnp.where(step > disc_start, new, old),
            stats, dict(disc_stats or {}),
        )
        return loss, (metrics, new_stats)


def make_adversarial_train_step(trainer: AdversarialTrainer, donate: bool = False) -> Callable:
    """Returns ``step_fn(state, perceiver_params, batch, rng) -> (state, metrics)``
    running generator then discriminator update on the same batch."""

    def step_fn(state: GANTrainState, perceiver_params, batch, rng):
        (g_loss, (g_metrics, pred, pred_ver, gen_stats)), g_grads = jax.value_and_grad(
            trainer.generator_loss, has_aux=True
        )(state.gen.params, state.disc.params, state.disc_stats, perceiver_params,
          batch, rng, state.step)
        new_gen = state.gen.apply_gradients(g_grads)

        # disc step sees the generator step's stat updates first (torch call
        # order: gen-step D(pred), then disc-step D(real), D(fake)).
        (d_loss, (d_metrics, new_stats)), d_grads = jax.value_and_grad(
            trainer.discriminator_loss, has_aux=True
        )(state.disc.params, gen_stats, batch, jax.lax.stop_gradient(pred),
          jax.lax.stop_gradient(pred_ver), state.step + 1,
          jax.random.fold_in(rng, 3))
        new_disc = state.disc.apply_gradients(d_grads)

        metrics = {**g_metrics, **d_metrics, "loss": g_loss}
        new_state = state.replace(step=state.step + 2, gen=new_gen, disc=new_disc,
                                  disc_stats=new_stats)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if donate else jax.jit(step_fn)


def init_discriminators(
    discriminator, rng, sample_shapes: Sequence[Tuple[int, ...]]
) -> Dict:
    """Init one flax variable dict per pyramid level (reference: nn.ModuleList
    of identical Discriminators, latent_embedders.py:924-925). Each entry is
    ``{"params": ..}`` plus ``"batch_stats"`` for BatchNorm discriminators
    (NLayerDiscriminator); pass the result to :meth:`GANTrainState.create`."""
    variables = {}
    for i, shape in enumerate(sample_shapes):
        v = discriminator.init(
            jax.random.fold_in(rng, i), jnp.zeros(shape, jnp.float32)
        )
        variables[f"disc_{i}"] = {k: v[k] for k in ("params", "batch_stats") if k in v}
    return variables
