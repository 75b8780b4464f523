"""Mesh parallelism on the 8-virtual-CPU-device test mesh: data-parallel
training equivalence, tensor-parallel partition rules, sharded bulk sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.parallel import (
    batch_sharding,
    fsdp_partition_spec,
    make_mesh,
    make_sharded_sampler,
    model_partition_spec,
    replicated,
    shard_batch,
    shard_params,
)
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState, make_diffusion_train_step

KEY = jax.random.PRNGKey(0)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _setup(batch):
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="none")
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (batch, 8, 8, 1)).astype(np.float32))
    params = unet.init(KEY, x, jnp.zeros((batch,), jnp.int32))["params"]
    return pipe, params, x


def test_data_parallel_step_matches_single_device():
    pipe, params, x = _setup(8)
    step = make_diffusion_train_step(pipe, donate=False)
    rng = jax.random.PRNGKey(1)
    batch = {"source": x}

    state_single = TrainState.create(params, optax.adamw(1e-3))
    state_single, m_single = step(state_single, None, batch, rng)

    mesh = make_mesh(n_data=8, n_model=1)
    params_sharded = shard_params(params, mesh)
    state_dp = TrainState.create(params_sharded, optax.adamw(1e-3))
    batch_dp = shard_batch(batch, mesh)
    state_dp, m_dp = step(state_dp, None, batch_dp, rng)

    # identical math: grads psum'd across the mesh == single-device grads
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(state_single.params)
    b = jax.tree_util.tree_leaves(state_dp.params)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_partition_and_forward():
    pipe, params, x = _setup(4)
    mesh = make_mesh(n_data=4, n_model=2)
    specs = model_partition_spec(params, mesh, min_shard_dim=16)
    # at least one wide kernel sharded over 'model'
    sharded_leaves = [s for s in jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))
                      if s == P(*([None] * 3), "model") or (len(s) and s[-1] == "model")]
    assert sharded_leaves, "no leaf got a model-parallel spec"
    params_tp = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)
    x_dp = jax.device_put(x, batch_sharding(mesh, x.ndim))
    t = jax.device_put(jnp.zeros((4,), jnp.int32), batch_sharding(mesh))
    y, _ = jax.jit(lambda p, x, t: pipe.noise_estimator.apply({"params": p}, x, t))(
        params_tp, x_dp, t)
    # matches the unsharded forward
    y_ref, _ = pipe.noise_estimator.apply({"params": params}, x, jnp.zeros((4,), jnp.int32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)


def test_fsdp_step_matches_single_device():
    """ZeRO-3-style param sharding: weights stored 'data'-sharded, GSPMD
    all-gathers on use / reduce-scatters grads — same math as one device."""
    pipe, params, x = _setup(8)
    step = make_diffusion_train_step(pipe, donate=False)
    rng = jax.random.PRNGKey(1)
    batch = {"source": x}

    state_single = TrainState.create(params, optax.adamw(1e-3))
    state_single, m_single = step(state_single, None, batch, rng)

    mesh = make_mesh(n_data=8, n_model=1)
    specs = fsdp_partition_spec(params, mesh, min_size=16)
    flat_specs = jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))
    assert any("data" in s for s in flat_specs), "no leaf got an fsdp spec"
    params_fsdp = shard_params(params, mesh, fsdp=True, fsdp_min_size=16)
    state_fsdp = TrainState.create(params_fsdp, optax.adamw(1e-3))
    batch_dp = shard_batch(batch, mesh)
    state_fsdp, m_fsdp = step(state_fsdp, None, batch_dp, rng)

    np.testing.assert_allclose(float(m_fsdp["loss"]), float(m_single["loss"]), rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(state_single.params),
                      jax.tree_util.tree_leaves(state_fsdp.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)


def test_fsdp_composes_with_tensor_parallel():
    """fsdp('data') + tp('model') on a 4x2 mesh -> 2-D param shardings; the
    step still matches the unsharded one."""
    pipe, params, x = _setup(4)
    step = make_diffusion_train_step(pipe, donate=False)
    rng = jax.random.PRNGKey(2)
    batch = {"source": x}

    state_single = TrainState.create(params, optax.adamw(1e-3))
    state_single, _ = step(state_single, None, batch, rng)

    mesh = make_mesh(n_data=4, n_model=2)
    tp = model_partition_spec(params, mesh, min_shard_dim=16)
    specs = fsdp_partition_spec(params, mesh, min_size=16, tp_specs=tp)
    flat = jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))
    assert any(("data" in s and "model" in s) for s in flat), \
        "no leaf got a combined fsdp+tp 2-D spec"
    params_2d = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)
    state_2d = TrainState.create(params_2d, optax.adamw(1e-3))
    state_2d, _ = step(state_2d, None, shard_batch(batch, mesh), rng)

    for la, lb in zip(jax.tree_util.tree_leaves(state_single.params),
                      jax.tree_util.tree_leaves(state_2d.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)


def test_sharded_bulk_sampler():
    pipe, params, _ = _setup(8)
    mesh = make_mesh(n_data=8, n_model=1)
    sampler = make_sharded_sampler(pipe, mesh, (8, 8, 1), steps=4, use_ddim=True,
                                   guidance_scale=1.0, decode=False)
    p = {"noise_estimator": jax.device_put(params, replicated(mesh))}
    out = sampler(p, jax.random.PRNGKey(2), 16)
    assert out.shape == (16, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    # sharded over the data axis
    assert len(out.sharding.device_set) == 8


def test_sharded_bulk_sampler_dpmpp_matches_unsharded():
    """DPM-Solver++ through the batch-sharded bulk path: sharded output ==
    the unsharded pipeline result (deterministic sampler, exact check)."""
    pipe, params, _ = _setup(8)
    mesh = make_mesh(n_data=8, n_model=1)
    sampler = make_sharded_sampler(pipe, mesh, (8, 8, 1), steps=5,
                                   guidance_scale=1.0, decode=False,
                                   sampler="dpmpp")
    p = {"noise_estimator": jax.device_put(params, replicated(mesh))}
    out = sampler(p, jax.random.PRNGKey(3), 16)
    assert out.shape == (16, 8, 8, 1)
    assert len(out.sharding.device_set) == 8

    k_init, _ = jax.random.split(jax.random.PRNGKey(3))
    x_T = jax.random.normal(k_init, (16, 8, 8, 1))
    ref = pipe.denoise_dpmpp({"noise_estimator": params}, x_T, steps=5, decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sharded_bulk_sampler_edm_matches_unsharded():
    """EDM (Karras Heun) through the batch-sharded bulk path: sharded output
    == the unsharded pipeline result (churn off -> deterministic, exact)."""
    pipe, params, _ = _setup(8)
    mesh = make_mesh(n_data=8, n_model=1)
    sampler = make_sharded_sampler(pipe, mesh, (8, 8, 1), steps=5,
                                   guidance_scale=1.0, decode=False,
                                   sampler="edm")
    p = {"noise_estimator": jax.device_put(params, replicated(mesh))}
    out = sampler(p, jax.random.PRNGKey(4), 16)
    assert out.shape == (16, 8, 8, 1)
    assert len(out.sharding.device_set) == 8

    k_init, _ = jax.random.split(jax.random.PRNGKey(4))
    x_T = jax.random.normal(k_init, (16, 8, 8, 1))
    ref = pipe.denoise_edm({"noise_estimator": params}, x_T, steps=5, decode=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_ring_attention_matches_full_attention():
    """Sequence-parallel ring attention (tokens sharded over 8 devices,
    K/V rotated via ppermute with online-softmax merging) is EXACT full
    attention."""
    from einops import rearrange

    from medfusion_tpu.nn.attention import compute_attention
    from medfusion_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh(n_data=8, n_model=1)
    b, heads, n, d = 2, 4, 64, 16
    rng = np.random.default_rng(0)
    q, k, v = [jnp.asarray(rng.normal(size=(b, heads, n, d)), jnp.float32)
               for _ in range(3)]
    scale = d ** -0.25

    out = ring_attention(q, k, v, mesh, scale=scale, axis="data")
    assert out.shape == (b, heads, n, d)
    assert len(out.sharding.device_set) == 8  # stays token-sharded

    # reference: the library's own single-device attention math
    ref = compute_attention(
        rearrange(q, "b h n d -> b n (h d)"),
        rearrange(k, "b h n d -> b n (h d)"),
        rearrange(v, "b h n d -> b n (h d)"),
        num_heads=heads, scale=scale)
    ref = rearrange(ref, "b n (h d) -> b h n d", h=heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
