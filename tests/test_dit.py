"""DiT estimator family (arXiv:2212.09748; beyond the reference, which ships
only convolutional UNets — see medfusion_tpu/models/dit.py).

Covers: forward contract (shapes, zero-init head, aux list), the
null-embedding CFG path (cond_mask==0 == condition=None), learn_sigma /
self-conditioning options, pipeline train+sample integration, gradient
equivalence with the Pallas flash-attention path at kernel-eligible token
counts, and tensor-parallel forward equivalence on the 8-device test mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from medfusion_tpu import ops
from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.dit import DiT, sincos_2d_pos_embed
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState, make_diffusion_train_step

KEY = jax.random.PRNGKey(0)


def _jitter(params, scale=0.05, seed=7):
    leaves, td = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        td, [l + scale * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, ks)])


def test_dit_forward_contract_and_cfg_null():
    m = DiT(in_ch=4, patch_size=2, hidden_size=64, depth=2, num_heads=4,
            cond_emb_num_classes=3)
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    cond = jnp.array([0, 2], jnp.int32)
    params = m.init(KEY, x, t, cond)["params"]
    y, aux = m.apply({"params": params}, x, t, cond)
    assert y.shape == x.shape and aux == []
    # zero-init final layer: a fresh DiT predicts exactly 0 (the UNet
    # families' zero-init out-head convention)
    assert float(jnp.abs(y).max()) == 0.0
    p2 = _jitter(params)
    y1, _ = m.apply({"params": p2}, x, t, cond, None, jnp.ones((2,)))
    y0, _ = m.apply({"params": p2}, x, t, cond, None, jnp.zeros((2,)))
    yn, _ = m.apply({"params": p2}, x, t, None)
    # cond_mask==0 routes through the SAME learned null row as condition=None
    np.testing.assert_allclose(np.asarray(y0), np.asarray(yn), atol=1e-6)
    assert float(jnp.abs(y1 - y0).max()) > 1e-6
    # per-sample mask mixes rows independently
    ym, _ = m.apply({"params": p2}, x, t, cond, None, jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(ym[0]), np.asarray(y1[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ym[1]), np.asarray(y0[1]), atol=1e-6)


def test_dit_learn_sigma_self_cond_and_validation():
    x = jax.random.normal(KEY, (2, 8, 8, 2))
    t = jnp.zeros((2,), jnp.int32)
    m = DiT(in_ch=2, patch_size=2, hidden_size=32, depth=1, num_heads=4,
            learn_sigma=True)
    y, _ = m.apply({"params": m.init(KEY, x, t)["params"]}, x, t)
    assert y.shape == (2, 8, 8, 4)  # 2*C for the estimate_variance split
    msc = DiT(in_ch=2, patch_size=2, hidden_size=32, depth=1, num_heads=4,
              use_self_conditioning=True)
    psc = msc.init(KEY, x, t)["params"]
    y_none, _ = msc.apply({"params": psc}, x, t, None, None)
    y_sc, _ = msc.apply({"params": _jitter(psc)}, x, t, None, x)
    assert y_none.shape == (2, 8, 8, 2) and np.isfinite(np.asarray(y_sc)).all()
    bad = DiT(in_ch=2, patch_size=3, hidden_size=32, depth=1, num_heads=4)
    with pytest.raises(ValueError, match="not divisible by patch"):
        bad.init(KEY, x, t)
    with pytest.raises(ValueError, match="embed_dim % 4"):
        sincos_2d_pos_embed(30, 4, 4)


def test_dit_pipeline_train_and_sample():
    """DiT as the pipeline's noise estimator: the generic train step and the
    lax.scan DDIM sampler run unmodified (the estimator interface is the
    only coupling)."""
    m = DiT(in_ch=2, patch_size=2, hidden_size=32, depth=2, num_heads=4,
            cond_emb_num_classes=2)
    sched = GaussianDiffusionSchedule.create(timesteps=10,
                                             schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=m,
                             latent_embedder=None, do_input_centering=False,
                             classifier_free_guidance_dropout=0.5)
    x = jax.random.normal(KEY, (4, 8, 8, 2))
    cond = jnp.array([0, 1, 0, 1], jnp.int32)
    params = m.init(KEY, x, jnp.zeros((4,), jnp.int32), cond)["params"]
    step = make_diffusion_train_step(pipe, donate=False)
    state = TrainState.create(params, optax.adamw(1e-3))
    losses = []
    for i in range(3):
        state, metrics = step(state, None, {"source": x, "target": cond},
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    out = pipe.sample({"noise_estimator": state.params}, jax.random.PRNGKey(9),
                      2, (8, 8, 2), condition=jnp.array([0, 1], jnp.int32),
                      steps=4, use_ddim=True, guidance_scale=2.0,
                      un_cond=jnp.array([0, 0], jnp.int32), decode=False)
    assert out.shape == (2, 8, 8, 2) and np.isfinite(np.asarray(out)).all()


def test_dit_flash_attention_forward_and_grad_match():
    """At kernel-eligible token counts (64x64/p2 = 1024 tokens) the Pallas
    flash path must match XLA attention in forward AND gradient — DiT puts
    attention on the training graph at every block, so this is the
    train-path contract for the family."""
    m = DiT(in_ch=1, patch_size=2, hidden_size=16, depth=1, num_heads=4)
    x = jax.random.normal(KEY, (1, 64, 64, 1))
    t = jnp.zeros((1,), jnp.int32)
    params = _jitter(m.init(KEY, x, t)["params"], scale=0.02)

    def loss(p, x):
        y, _ = m.apply({"params": p}, x, t)
        return jnp.sum(y * y)

    assert not ops.flash_attention_enabled()
    l_ref, g_ref = jax.value_and_grad(loss)(params, x)
    try:
        ops.enable_flash_attention(True)
        l_fa, g_fa = jax.value_and_grad(loss)(params, x)
    finally:
        ops.enable_flash_attention(False)
    np.testing.assert_allclose(float(l_fa), float(l_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fa)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dit_tensor_parallel_forward_matches():
    """The rule-based model_partition_spec shards DiT's Dense kernels with
    no family-specific rules; the GSPMD forward matches single-device."""
    from medfusion_tpu.parallel import (
        batch_sharding, make_mesh, model_partition_spec)

    m = DiT(in_ch=2, patch_size=2, hidden_size=64, depth=2, num_heads=4)
    x = jax.random.normal(KEY, (4, 8, 8, 2))
    t = jnp.zeros((4,), jnp.int32)
    params = _jitter(m.init(KEY, x, t)["params"], scale=0.02)
    mesh = make_mesh(n_data=4, n_model=2)
    specs = model_partition_spec(params, mesh, min_shard_dim=16)
    sharded = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)) if len(s) and s[-1] == "model"]
    assert sharded, "no DiT kernel got a model-parallel spec"
    params_tp = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)
    x_dp = jax.device_put(x, batch_sharding(mesh, x.ndim))
    t_dp = jax.device_put(t, batch_sharding(mesh))
    y, _ = jax.jit(lambda p, x, t: m.apply({"params": p}, x, t))(
        params_tp, x_dp, t_dp)
    y_ref, _ = m.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_cli_train_sample_dit(tmp_path):
    """--estimator dit through the real train CLI + sampling CLI."""
    from medfusion_tpu.cli import sample, train_diffusion

    out = tmp_path / "dit"
    train_diffusion.main([
        "--preset", "smoke", "--estimator", "dit", "--max-steps", "2",
        "--ckpt-every", "2", "--out", str(out),
    ])
    s_out = tmp_path / "samples"
    sample.main([
        "--preset", "smoke", "--estimator", "dit",
        "--ckpt", str(out / "checkpoints"), "--n", "2", "--steps", "2",
        "--out", str(s_out),
    ])
    assert list(s_out.glob("*.png"))
