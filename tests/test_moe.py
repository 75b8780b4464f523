"""Expert-parallel MoE MLP (medfusion_tpu/parallel/moe.py; beyond the
reference — completes the dp/tp/fsdp/sp/pp/ep parallelism matrix).

Oracle: dense one-hot-einsum routing must equal per-token "pick top-k
experts, renormalize gates, run each expert's MLP" computed in numpy.
Capacity semantics, aux-loss plumbing, expert-parallel mesh equivalence, and
the DiT integration are pinned separately.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from medfusion_tpu.parallel.moe import MoEMLP, moe_aux_loss, moe_partition_spec

KEY = jax.random.PRNGKey(0)


def _gelu(v):
    return 0.5 * v * (1 + np.tanh(np.sqrt(2 / np.pi) * (v + 0.044715 * v ** 3)))


def _oracle(x, params, k):
    """Per-token top-k routing in numpy (no capacity pressure)."""
    xs = np.asarray(x)
    W = np.asarray(params["router"]["kernel"])
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    out = np.zeros_like(xs)
    for b in range(xs.shape[0]):
        for n in range(xs.shape[1]):
            tok = xs[b, n]
            logits = tok @ W
            pr = np.exp(logits - logits.max())
            pr /= pr.sum()
            top = np.argsort(-pr)[:k]
            # k=1 is Switch routing: RAW router prob scales the output
            # (that is where the router's task gradient comes from); k>=2
            # renormalizes over the selected set (GShard)
            g = pr[top] if k == 1 else pr[top] / pr[top].sum()
            for gi, e in zip(g, top):
                h = _gelu(tok @ w1[e] + b1[e])
                out[b, n] += gi * (h @ w2[e] + b2[e])
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_moe_matches_per_token_oracle(k):
    m = MoEMLP(hidden_size=8, mlp_dim=16, num_experts=4, num_selected=k,
               capacity_factor=8.0)  # capacity ample: no dropping
    x = jax.random.normal(KEY, (2, 6, 8))
    params = m.init(KEY, x)["params"]
    y = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), _oracle(x, params, k),
                               rtol=1e-4, atol=1e-5)


def test_moe_capacity_drops_overflow_tokens():
    """Rig the router so every token picks expert 0; with capacity 2 only
    the first 2 tokens per batch row get routed, the rest emit exactly 0
    (static-shape overflow dropping)."""
    m = MoEMLP(hidden_size=4, mlp_dim=8, num_experts=2, num_selected=1,
               capacity_factor=0.5)  # cap = ceil(0.5 * 1 * 8 / 2) = 2
    x = jax.random.normal(KEY, (1, 8, 4))
    params = jax.tree_util.tree_map(lambda a: a, m.init(KEY, x)["params"])
    # zero router -> all logits tie -> argmax sends EVERY token to expert 0
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    y = np.asarray(m.apply({"params": params}, x))
    assert np.abs(y[0, :2]).max() > 0  # first two tokens routed
    np.testing.assert_allclose(y[0, 2:], 0.0, atol=1e-7)  # overflow dropped


def test_moe_aux_loss_sown_and_extracted():
    m = MoEMLP(hidden_size=8, mlp_dim=8, num_experts=4)
    x = jax.random.normal(KEY, (2, 4, 8))
    vars_ = m.init(KEY, x)
    _, st = m.apply(vars_, x, mutable=["intermediates"])
    aux = moe_aux_loss(st["intermediates"])
    assert aux.shape == () and np.isfinite(float(aux)) and float(aux) > 0
    # differentiable end-to-end (router gets a gradient through aux)
    def loss(p):
        _, s = m.apply({"params": p}, x, mutable=["intermediates"])
        return moe_aux_loss(s["intermediates"])
    g = jax.grad(loss)(vars_["params"])
    assert float(jnp.abs(g["router"]["kernel"]).max()) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_moe_expert_parallel_matches_single_device():
    """Experts sharded over the 'model' axis: GSPMD's all-to-all forward
    AND gradient match the unsharded computation."""
    from medfusion_tpu.parallel import make_mesh

    m = MoEMLP(hidden_size=16, mlp_dim=32, num_experts=8, num_selected=2,
               capacity_factor=4.0)
    x = jax.random.normal(KEY, (4, 8, 16))
    params = m.init(KEY, x)["params"]
    mesh = make_mesh(n_data=4, n_model=2)
    specs = moe_partition_spec(params, mesh)
    leaves = jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))
    assert any(len(s) and s[0] == "model" for s in leaves), "no expert dim sharded"
    # the router must stay replicated even when its [hidden, E] kernel's
    # input dim happens to divide the axis size
    assert specs["router"]["kernel"] == P()
    params_ep = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)

    def loss(p, x):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(params, x)
    l_ep, g_ep = jax.jit(jax.value_and_grad(loss))(params_ep, x)
    np.testing.assert_allclose(float(l_ep), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dit_moe_blocks():
    """DiT(moe_experts=...): every moe_every-th block's MLP is routed; the
    estimator contract is unchanged and expert weights receive gradients."""
    from medfusion_tpu.models.dit import DiT

    m = DiT(in_ch=2, patch_size=2, hidden_size=32, depth=2, num_heads=4,
            moe_experts=4, moe_every=2)
    x = jax.random.normal(KEY, (2, 8, 8, 2))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(KEY, x, t)["params"]
    assert "moe_mlp" in params["blocks_1"] and "moe_mlp" not in params["blocks_0"]
    y, aux = m.apply({"params": params}, x, t)
    assert y.shape == x.shape and aux == []

    # zero-init head + gates make a fresh DiT output (and its grad of a
    # quadratic loss) exactly 0 — jitter so gradients actually flow
    leaves, td = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, ks)])

    def loss(p):
        out, _ = m.apply({"params": p}, x, t)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["blocks_1"]["moe_mlp"]["w1"]).max()) > 0


def test_switch_router_gets_task_gradient():
    """k=1 (Switch) scales by the RAW router prob: the router kernel must
    receive a task-loss gradient (the old renormalize-to-1.0 cut it off)."""
    m = MoEMLP(hidden_size=8, mlp_dim=16, num_experts=4, num_selected=1,
               capacity_factor=8.0)
    x = jax.random.normal(KEY, (2, 6, 8))
    params = m.init(KEY, x)["params"]

    def task_loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)  # no aux here

    g = jax.grad(task_loss)(params)
    assert float(jnp.abs(g["router"]["kernel"]).max()) > 1e-6


def test_train_step_consumes_moe_aux():
    """The standard diffusion AND flow train steps must fold the sown MoE
    aux losses into the loss (metrics['moe_aux'] > 0) and give the router a
    balancing gradient — a silent no-op sow would collapse routing."""
    import optax

    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.models.dit import DiT
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
    from medfusion_tpu.pipelines.flow import FlowMatchingPipeline
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    dit = DiT(in_ch=1, patch_size=2, hidden_size=32, depth=2, num_heads=4,
              moe_experts=4, moe_every=2)
    x = jax.random.normal(KEY, (2, 8, 8, 1))
    params = dit.init(KEY, x, jnp.zeros((2,), jnp.int32))["params"]
    sched = GaussianDiffusionSchedule.create(timesteps=10)
    for pipe in (
        DiffusionPipeline(scheduler=sched, noise_estimator=dit,
                          do_input_centering=False, clip_x0=False),
        FlowMatchingPipeline(noise_estimator=dit, do_input_centering=False),
    ):
        state = TrainState.create(params, optax.adam(1e-3))
        step = make_diffusion_train_step(pipe, donate=False)
        state, metrics = step(state, None, {"source": x}, KEY)
        assert float(metrics["moe_aux"]) > 0, type(pipe).__name__
        assert np.isfinite(float(metrics["loss"]))
        # router receives the balancing gradient through the train step
        loss_fn = lambda p: pipe.train_loss(
            {"noise_estimator": p}, {"source": x}, KEY)[0]
        g = jax.grad(loss_fn)(params)
        assert float(jnp.abs(
            g["blocks_1"]["moe_mlp"]["router"]["kernel"]).max()) > 0
