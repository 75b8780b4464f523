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


def test_filter_weights_partial_loading():
    target = {"a": {"kernel": jnp.zeros((3, 4))}, "b": {"kernel": jnp.zeros((2, 2))}}
    source = {"a": {"kernel": jnp.ones((3, 4))}, "b": {"kernel": jnp.ones((5, 5))}}
    out = C.filter_weights(source, target)
    np.testing.assert_array_equal(np.asarray(out["a"]["kernel"]), 1.0)  # shape match
    np.testing.assert_array_equal(np.asarray(out["b"]["kernel"]), 0.0)  # shape mismatch
    out2 = C.filter_weights(source, target, path_regex=r"^b/")
    np.testing.assert_array_equal(np.asarray(out2["a"]["kernel"]), 0.0)  # filtered out


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
