"""Pipeline parallelism: GPipe microbatch streaming over the 'model' mesh
axis equals the sequential stage composition — forward AND gradients —
and composes with data parallelism on the 'data' axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medfusion_tpu.parallel import (
    make_mesh,
    pipeline_apply,
    shard_stage_params,
    stack_stage_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make_stages(n_stages, dim, seed=0):
    rng = np.random.default_rng(seed)
    stages = [
        {"w": jnp.asarray(rng.standard_normal((dim, dim)) / np.sqrt(dim),
                          jnp.float32),
         "b": jnp.asarray(rng.standard_normal((dim,)) * 0.1, jnp.float32)}
        for _ in range(n_stages)
    ]
    return stages


def _sequential(stages, x):
    for p in stages:
        x = _stage_fn(p, x)
    return x


def test_pipeline_forward_matches_sequential():
    mesh = make_mesh(n_data=2, n_model=4)
    stages = _make_stages(4, 16)
    stacked = shard_stage_params(stack_stage_params(stages), mesh)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 16)),
                    jnp.float32)
    want = _sequential(stages, x)
    got = pipeline_apply(_stage_fn, stacked, x, mesh=mesh, axis="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_more_microbatches_than_stages():
    mesh = make_mesh(n_data=1, n_model=8)
    stages = _make_stages(8, 8, seed=2)
    stacked = shard_stage_params(stack_stage_params(stages), mesh)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((32, 8)),
                    jnp.float32)
    want = _sequential(stages, x)
    got = pipeline_apply(_stage_fn, stacked, x, mesh=mesh, axis="model",
                         n_microbatches=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh(n_data=2, n_model=4)
    stages = _make_stages(4, 8, seed=4)
    stacked = stack_stage_params(stages)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((8, 8)),
                    jnp.float32)

    def loss_pp(p):
        y = pipeline_apply(_stage_fn, p, x, mesh=mesh, axis="model")
        return jnp.mean(y ** 2)

    def loss_seq(p):
        h = x
        for i in range(4):
            h = _stage_fn(jax.tree_util.tree_map(lambda v: v[i], p), h)
        return jnp.mean(h ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_pipeline_composes_with_dp():
    mesh = make_mesh(n_data=2, n_model=4)
    stages = _make_stages(4, 16, seed=6)
    stacked = shard_stage_params(stack_stage_params(stages), mesh)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((16, 16)),
                    jnp.float32)
    want = _sequential(stages, x)
    got = pipeline_apply(_stage_fn, stacked, x, mesh=mesh, axis="model",
                         n_microbatches=4, data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_rejects_bad_microbatching():
    mesh = make_mesh(n_data=2, n_model=4)
    stages = _make_stages(4, 8, seed=8)
    stacked = stack_stage_params(stages)
    x = jnp.zeros((6, 8), jnp.float32)
    with pytest.raises(ValueError):
        pipeline_apply(_stage_fn, stacked, x, mesh=mesh, axis="model")


def test_pipeline_normalizing_stage_no_nan_poisoning():
    """Regression: fill/drain ticks run stage_fn on bootstrap activations; a
    zeros bootstrap turned RMS-normalizing stages (mean(x^2)=0 denominator,
    sqrt'(0)=inf in the vjp) into NaN factories that poisoned the output
    through the old multiply-masking. Forward AND parameter gradients must
    match the sequential composition NaN-free."""
    mesh = make_mesh(n_data=2, n_model=4)

    def rms_stage(p, x):
        # per-sample RMS norm (microbatch-invariant), deliberately NO eps:
        # on the old zeros bootstrap mean(h^2)=0 => 0/0 and sqrt'(0)=inf
        h = x @ p["w"]
        return h / jnp.sqrt(jnp.mean(h ** 2, axis=-1, keepdims=True))

    rng = np.random.default_rng(3)
    stages = [{"w": jnp.asarray(rng.standard_normal((16, 16)) / 4.0,
                                jnp.float32)} for _ in range(4)]
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    stacked = shard_stage_params(stack_stage_params(stages), mesh)

    y = pipeline_apply(rms_stage, stacked, x, mesh=mesh, axis="model",
                       data_axis="data")
    y_ref = x
    for p in stages:
        y_ref = rms_stage(p, y_ref)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-6)

    def loss_pp(stacked):
        return jnp.sum(pipeline_apply(rms_stage, stacked, x, mesh=mesh,
                                      axis="model", data_axis="data") ** 2)

    def loss_seq(stages):
        h = x
        for p in stages:
            h = rms_stage(p, h)
        return jnp.sum(h ** 2)

    g_pp = jax.grad(loss_pp)(stack_stage_params(stages))
    g_seq = stack_stage_params(
        [g for g in jax.grad(loss_seq)(stages)])
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_zero_sharded_stages_match_sequential():
    """pp x fsdp (round-3 verdict ask #8): stage params ZeRO-3-sharded over
    'data' at rest, all-gathered just-in-time — forward AND grads equal the
    sequential composition, and the resident sharding really is 2-D."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=4, n_model=2)
    stages = _make_stages(2, 16, seed=7)
    stacked = shard_stage_params(stack_stage_params(stages), mesh,
                                 zero_axis="data")
    # resident layout: stage dim on 'model', first param dim on 'data'
    assert stacked["w"].sharding.spec == P("model", "data")
    x = jnp.asarray(np.random.default_rng(8).standard_normal((8, 16)),
                    jnp.float32)
    want = _sequential(stages, x)
    got = pipeline_apply(_stage_fn, stacked, x, mesh=mesh, axis="model",
                         data_axis="data", zero_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss_pp(p_stacked, x):
        y = pipeline_apply(_stage_fn, p_stacked, x, mesh=mesh, axis="model",
                           data_axis="data", zero_axis="data")
        return jnp.sum(y ** 2)

    def loss_seq(stages, x):
        return jnp.sum(_sequential(stages, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked, x)
    g_seq = jax.grad(loss_seq)(stages, x)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(g_pp["w"][i]),
                                   np.asarray(g_seq[i]["w"]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_pp["b"][i]),
                                   np.asarray(g_seq[i]["b"]),
                                   atol=1e-4, rtol=1e-4)


def test_pipeline_zero_sharding_handles_scalar_stage_params():
    """A per-stage SCALAR leaf stacks to rank 1 — it has no post-stage dim
    to ZeRO-shard, so pp x fsdp must replicate it over the zero axis instead
    of failing to apply a 2-D PartitionSpec (review fix, round 4)."""
    from jax.sharding import PartitionSpec as P

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"]) * p["gain"]

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(11)
    stages = [
        {"w": jnp.asarray(rng.standard_normal((16, 16)) / 4.0, jnp.float32),
         "gain": jnp.float32(0.5 + i)}
        for i in range(2)
    ]
    stacked = shard_stage_params(stack_stage_params(stages), mesh,
                                 zero_axis="data")
    assert stacked["w"].sharding.spec == P("model", "data")
    assert stacked["gain"].sharding.spec == P("model")
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    want = x
    for p in stages:
        want = stage_fn(p, want)

    def loss_pp(p_stacked):
        y = pipeline_apply(stage_fn, p_stacked, x, mesh=mesh, axis="model",
                           data_axis="data", zero_axis="data")
        return y

    got = loss_pp(stacked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    g = jax.grad(lambda p: jnp.sum(loss_pp(p) ** 2))(stacked)
    g_seq = jax.grad(lambda ss: jnp.sum(
        stage_fn(ss[1], stage_fn(ss[0], x)) ** 2))(stages)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(g["gain"][i]),
                                   np.asarray(g_seq[i]["gain"]),
                                   atol=1e-4, rtol=1e-4)
        # the ZeRO-sharded matrix leaf in the SAME mixed tree pins the
        # gather/reduce-scatter vjp when scalar and matrix leaves coexist
        np.testing.assert_allclose(np.asarray(g["w"][i]),
                                   np.asarray(g_seq[i]["w"]),
                                   atol=1e-4, rtol=1e-4)
