"""Noisy-latent classifier subsystem: learning on separable data, and the
train_classifier -> sample --classifier-ckpt CLI round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.unet_openai import EncoderUNetOpenAI
from medfusion_tpu.train import ClassifierTrainer, TrainState, make_classifier_train_step


def test_classifier_learns_separable_classes():
    """Two pixel-space classes at means +/-0.6: CE drops and accuracy beats
    chance by a wide margin after a short training run (T kept small so the
    class signal survives q_sample at every t)."""
    sched = GaussianDiffusionSchedule.create(
        timesteps=10, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    clf = EncoderUNetOpenAI(image_size=8, in_channels=1, model_channels=32,
                            out_channels=2, num_res_blocks=1,
                            attention_resolutions=(), channel_mult=(1, 2),
                            pool="adaptive")
    trainer = ClassifierTrainer(classifier=clf, scheduler=sched,
                                latent_embedder=None)
    key = jax.random.PRNGKey(0)
    params = clf.init(key, jnp.zeros((1, 8, 8, 1)),
                      jnp.zeros((1,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adam(2e-3))
    step_fn = make_classifier_train_step(trainer)

    rng = np.random.default_rng(1)
    losses, accs = [], []
    for i in range(60):
        labels = rng.integers(0, 2, size=(32,))
        x = (rng.standard_normal((32, 8, 8, 1)) * 0.1
             + (labels * 1.2 - 0.6)[:, None, None, None]).astype(np.float32)
        batch = {"source": jnp.asarray(x), "target": jnp.asarray(labels)}
        state, m = step_fn(state, None, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
        accs.append(float(m["acc"]))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
        losses[:10], losses[-10:])
    assert np.mean(accs[-10:]) > 0.9, accs[-10:]


def test_train_classifier_cli_guided_sample_roundtrip(tmp_path):
    """train_classifier writes a checkpoint; sample --classifier-ckpt loads
    it and runs classifier-guided DDIM end to end."""
    from medfusion_tpu.cli import sample, train_classifier

    out = tmp_path / "clf"
    train_classifier.main([
        "--preset", "smoke", "--max-steps", "2", "--ckpt-every", "2",
        "--model-channels", "32", "--out", str(out)])
    assert (out / "checkpoints").exists()

    sample_out = tmp_path / "samples"
    sample.main([
        "--preset", "smoke", "--n", "2", "--steps", "4", "--guidance", "2",
        "--classifier-ckpt", str(out / "checkpoints"),
        "--classifier-model-channels", "32",
        "--classifier-scale", "1.5", "--out", str(sample_out)])
    assert (sample_out / "sample_cond_0.png").exists()
    assert (sample_out / "sample_cond_1.png").exists()


def test_build_classifier_attention_pool_initializes():
    """--pool attention must produce a usable model (num_head_channels is
    auto-set; the bare EncoderUNetOpenAI default -1 would assert)."""
    from medfusion_tpu.cli.presets import PRESETS
    from medfusion_tpu.cli.train_classifier import build_classifier

    p = PRESETS["smoke"]
    clf = build_classifier(p, model_channels=32, pool="attention")
    h, w, c = p.latent_shape
    params = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, c)),
                      jnp.zeros((1,), jnp.int32))["params"]
    logits = clf.apply({"params": params}, jnp.zeros((2, h, w, c)),
                       jnp.zeros((2,), jnp.int32))
    assert logits.shape == (2, p.num_classes)


def test_sample_dataset_cli_guided_bulk_path(tmp_path):
    """End-to-end guided BULK generation: train_classifier checkpoint ->
    sample_dataset --classifier-ckpt (mesh-sharded chunks, label doubles as
    the guidance target) -> per-label fake_*.png files. Also the first
    direct CLI coverage of sample_dataset itself."""
    from medfusion_tpu.cli import sample_dataset, train_classifier

    clf_out = tmp_path / "clf"
    train_classifier.main([
        "--preset", "smoke", "--max-steps", "2", "--ckpt-every", "2",
        "--model-channels", "32", "--out", str(clf_out)])

    out = tmp_path / "fake"
    sample_dataset.main([
        "--preset", "smoke", "--n-samples", "8", "--chunk", "8",
        "--steps-list", "4", "--out", str(out),
        "--classifier-ckpt", str(clf_out / "checkpoints"),
        "--classifier-model-channels", "32", "--classifier-scale", "1.0"])
    for label in (0, 1):
        files = list((out / "steps_4" / f"label_{label}").glob("fake_*.png"))
        assert len(files) == 8, (label, files)
