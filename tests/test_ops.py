"""Pallas kernels: numerical equivalence vs the pure-XLA paths (interpret mode
on CPU; the same kernels compile for TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medfusion_tpu import ops
from medfusion_tpu.ops.flash_attention import flash_attention
from medfusion_tpu.ops.group_norm import fused_group_norm_silu, group_norm_silu_reference


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


def test_fused_group_norm_silu_matches_reference():
    x = rand((2, 8, 8, 256), seed=0)
    scale = rand((256,), 1) * 0.1 + 1.0
    bias = rand((256,), 2) * 0.1
    ref = group_norm_silu_reference(x, scale, bias, num_groups=32)
    out = fused_group_norm_silu(x, scale, bias, num_groups=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # no-silu epilogue
    ref2 = group_norm_silu_reference(x, scale, bias, 32, apply_silu=False)
    out2 = fused_group_norm_silu(x, scale, bias, 32, apply_silu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_fused_group_norm_fallback_on_odd_channels():
    x = rand((1, 4, 4, 24), seed=3)  # 24 % 128 != 0 -> XLA fallback path
    scale, bias = jnp.ones((24,)), jnp.zeros((24,))
    out = fused_group_norm_silu(x, scale, bias, num_groups=8)
    ref = group_norm_silu_reference(x, scale, bias, num_groups=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_flash_attention_matches_naive():
    b, h, n, d = 2, 4, 256, 128
    q, k, v = rand((b, h, n, d), 4), rand((b, h, n, d), 5), rand((b, h, n, d), 6)
    scale = d**-0.25
    naive = jnp.einsum(
        "bhnm,bhmd->bhnd",
        jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale), axis=-1),
        v,
    )
    out = flash_attention(q, k, v, scale, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), rtol=2e-5, atol=2e-5)


def test_flash_attention_fallback_odd_shapes():
    # N not divisible by blocks -> einsum fallback, still correct
    b, h, n, d = 1, 2, 17, 32
    q, k, v = rand((b, h, n, d), 7), rand((b, h, n, d), 8), rand((b, h, n, d), 9)
    scale = d**-0.25
    out = flash_attention(q, k, v, scale, block_q=16, block_k=16)
    naive = jnp.einsum(
        "bhnm,bhmd->bhnd",
        jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale), axis=-1),
        v,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), rtol=2e-5, atol=2e-5)


def test_block_integration_fused_matches_unfused():
    """BasicBlock with the fused switch on == off (same params)."""
    from medfusion_tpu.nn.blocks import BasicBlock

    x = rand((2, 8, 8, 16), seed=10)
    blk = BasicBlock(2, 128, 3, 1, ("GROUP", {"num_groups": 32, "affine": True}), ("SWISH", {}))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    base = blk.apply({"params": params}, x)
    ops.enable_fused_group_norm(True)
    try:
        # interpret-mode only runs inside the kernel wrapper; on CPU the size
        # gate routes to the XLA path, which must be numerically identical.
        fused = blk.apply({"params": params}, x)
    finally:
        ops.enable_fused_group_norm(False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), rtol=1e-5, atol=1e-6)


def test_flash_attention_grad_matches_naive():
    """The Pallas kernel's custom VJP (flash backward kernels) must match the
    XLA-autodiff gradients of the naive softmax path — the reference's
    attention trains (attention_blocks.py:35-43), so the accelerated path
    must be differentiable and exact."""
    b, h, n, d = 1, 2, 256, 32
    q, k, v = rand((b, h, n, d), 11), rand((b, h, n, d), 12), rand((b, h, n, d), 13)
    w = rand((b, h, n, d), 14)  # cotangent seed
    scale = d**-0.25

    def naive_loss(q, k, v):
        sm = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale), axis=-1)
        return jnp.sum(jnp.einsum("bhnm,bhmd->bhnd", sm, v) * w)

    def flash_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, block_q=128, block_k=128,
                                       interpret=True) * w)

    gq_n, gk_n, gv_n = jax.grad(naive_loss, argnums=(0, 1, 2))(q, k, v)
    gq_f, gk_f, gv_f = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_n), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_n), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_n), rtol=2e-5, atol=2e-5)


def test_flash_attention_grad_rectangular_kv():
    """Cross-attention shapes (M != N) through the backward kernels."""
    b, h, n, m, d = 1, 1, 128, 256, 32
    q = rand((b, h, n, d), 15)
    k, v = rand((b, h, m, d), 16), rand((b, h, m, d), 17)
    scale = d**-0.25

    def naive_loss(q, k, v):
        sm = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale), axis=-1)
        return jnp.sum(jnp.einsum("bhnm,bhmd->bhnd", sm, v) ** 2)

    def flash_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, block_q=64, block_k=128,
                                       interpret=True) ** 2)

    for gn, gf in zip(jax.grad(naive_loss, argnums=(0, 1, 2))(q, k, v),
                      jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), rtol=2e-5, atol=2e-5)


def test_fused_group_norm_grad_matches_reference():
    x = rand((2, 4, 4, 256), seed=20)
    scale = rand((256,), 21) * 0.1 + 1.0
    bias = rand((256,), 22) * 0.1

    def ref_loss(x, s, b):
        return jnp.sum(group_norm_silu_reference(x, s, b, num_groups=32) ** 2)

    def fused_loss(x, s, b):
        return jnp.sum(fused_group_norm_silu(x, s, b, num_groups=32, interpret=True) ** 2)

    for gn, gf in zip(jax.grad(ref_loss, argnums=(0, 1, 2))(x, scale, bias),
                      jax.grad(fused_loss, argnums=(0, 1, 2))(x, scale, bias)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), rtol=2e-5, atol=2e-5)


def test_train_step_with_flash_attention_enabled():
    """Regression for the round-2 defect: enable_flash_attention(True) +
    make_diffusion_train_step on a >=1024-token attention UNet used to crash
    mid-compile ("Linearization failed ... reverse-mode autodiff"). The
    32x32 level-1 attention here has KV=1024 tokens, so the ops wrapper
    genuinely dispatches to the Pallas kernel inside jax.grad."""
    import optax

    from medfusion_tpu import ops
    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.models.unet import UNet
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
    from medfusion_tpu.train import TrainState, make_diffusion_train_step

    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="linear", num_res_blocks=1)
    sched = GaussianDiffusionSchedule.create(timesteps=10, schedule_strategy="linear")
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             latent_embedder=None, do_input_centering=False)
    x = rand((2, 32, 32, 1), seed=30)
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))["params"]
    state = TrainState.create(params, optax.adamw(1e-3))
    step = make_diffusion_train_step(pipe, donate=False)
    ops.enable_flash_attention(True)
    try:
        state, metrics = step(state, None, {"source": x}, jax.random.PRNGKey(1))
    finally:
        ops.enable_flash_attention(False)
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(state.step) == 1


def test_flash_attention_switch_survives_repeated_calls():
    """Regression: the lazy submodule import used to shadow the ops package's
    same-named wrapper function, so the SECOND compute_attention call in any
    trace crashed with "'module' object is not callable"."""
    import jax
    import jax.numpy as jnp

    import medfusion_tpu.ops as ops
    from medfusion_tpu.nn.attention import compute_attention

    ops.enable_flash_attention(True)
    try:
        q = jnp.ones((1, 128, 128))

        def f(q):
            a = compute_attention(q, q, q, 2, 0.3)
            return jnp.sum(compute_attention(a, q, q, 2, 0.3))

        assert bool(jnp.isfinite(jax.jit(f)(q)))
        assert callable(ops.flash_attention)
    finally:
        ops.enable_flash_attention(False)


def test_ops_wrapper_dispatches_by_kv_length(monkeypatch):
    """The package wrapper's speed heuristic: KV < MIN_KV_TOKENS -> naive
    XLA path (kernel NOT invoked); >= threshold -> kernel. The kernel module
    itself has no such short-circuit (its equivalence test must genuinely
    exercise the flash recurrence)."""
    import jax.numpy as jnp

    import medfusion_tpu.ops as ops

    calls = []

    def fake_impl(q, k, v, scale):
        calls.append(k.shape[2])
        return q

    monkeypatch.setattr(ops, "_FA_IMPL", fake_impl)
    small = jnp.ones((1, 2, 64, 64))
    big = jnp.ones((1, 2, 256, 64))
    ops.flash_attention(small, small, small, 0.3)
    assert calls == []  # short sequence: naive path, kernel untouched
    ops.flash_attention(big, big, big, 0.3)
    assert calls == [256]


# ---------------------------------------------------------------------------
# fused GEGLU transformer MLP (ops/geglu.py, round 4)
# ---------------------------------------------------------------------------


def _geglu_inputs(m=512, c=128, f_mult=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    f = c * f_mult
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2,
                                dtype)
    return (mk(m, c), mk(c), mk(c), mk(c, 2 * f), mk(2 * f), mk(f, c), mk(c))


def test_fused_geglu_matches_reference_interpret():
    """Streaming-accumulation kernel (interpret mode on CPU) == plain-XLA
    reference formula; f32 path is the exact module math."""
    from medfusion_tpu.ops.geglu import fused_geglu_mlp, geglu_mlp_reference

    args = _geglu_inputs()
    want = geglu_mlp_reference(*args)
    got = fused_geglu_mlp(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_geglu_matches_module_path():
    """ops switch ON vs OFF through the real BasicTransformerBlock: same
    params, same output (f32)."""
    import medfusion_tpu.ops as ops
    from medfusion_tpu.nn.attention import BasicTransformerBlock

    m = BasicTransformerBlock(2, 128, 4, 32,
                              ("GROUP", {"num_groups": 8, "affine": True}))
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 16, 16, 128)).astype(np.float32) * 0.3)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    base = m.apply({"params": params}, x)
    try:
        ops.enable_fused_geglu(True)
        fused = m.apply({"params": params}, x)
    finally:
        ops.enable_fused_geglu(False)
    # param tree must be IDENTICAL under the switch (converter contract)
    params2 = m.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=2e-5, rtol=2e-5)


def test_fused_geglu_grads_match_reference():
    from medfusion_tpu.ops.geglu import fused_geglu_mlp, geglu_mlp_reference

    args = _geglu_inputs(m=256, c=128, seed=5)

    def loss_fused(*a):
        return jnp.sum(fused_geglu_mlp(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(geglu_mlp_reference(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_fused_geglu_fallback_on_odd_shapes():
    """Non-dividing shapes take the reference path, same answer."""
    from medfusion_tpu.ops.geglu import fused_geglu_mlp, geglu_mlp_reference

    args = _geglu_inputs(m=100, c=96, seed=7)  # c % 128 != 0
    np.testing.assert_allclose(np.asarray(fused_geglu_mlp(*args)),
                               np.asarray(geglu_mlp_reference(*args)),
                               atol=1e-6)


def test_fused_geglu_bf16_close():
    from medfusion_tpu.ops.geglu import fused_geglu_mlp, geglu_mlp_reference

    args = _geglu_inputs(m=256, c=128, dtype=jnp.bfloat16, seed=9)
    want = geglu_mlp_reference(*args).astype(jnp.float32)
    got = fused_geglu_mlp(*args).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# token-layout multi-head flash kernel (round 4)
# ---------------------------------------------------------------------------


def _tok_inputs(b=2, n=256, m=None, heads=4, d=32, dtype=jnp.float32, seed=11):
    rng = np.random.default_rng(seed)
    m = n if m is None else m
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5,
                                dtype)
    return mk(b, n, heads * d), mk(b, m, heads * d), mk(b, m, heads * d)


def _tok_reference(q, k, v, heads, scale):
    from medfusion_tpu.ops.flash_attention import naive_attention

    b, n, hd = q.shape
    d = hd // heads
    sh = lambda x: x.reshape(x.shape[0], x.shape[1], heads, d).transpose(0, 2, 1, 3)
    out = naive_attention(sh(q), sh(k), sh(v), scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


@pytest.mark.parametrize("n,m,heads,d", [(256, 256, 4, 32), (256, 128, 4, 32),
                                         (512, 256, 8, 16), (256, 256, 2, 64)])
def test_flash_tokens_matches_reference(n, m, heads, d):
    from medfusion_tpu.ops.flash_attention import flash_attention_tokens

    q, k, v = _tok_inputs(n=n, m=m, heads=heads, d=d)
    scale = d ** -0.25
    want = _tok_reference(q, k, v, heads, scale)
    got = flash_attention_tokens(q, k, v, heads, scale, block_q=128,
                                 block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_tokens_grads_match_reference():
    from medfusion_tpu.ops.flash_attention import flash_attention_tokens

    q, k, v = _tok_inputs(n=256, m=128, heads=4, d=32, seed=13)
    scale = 32 ** -0.25

    def loss_k(q, k, v):
        return jnp.sum(flash_attention_tokens(q, k, v, 4, scale,
                                              block_q=128, block_k=64) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(_tok_reference(q, k, v, 4, scale) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_flash_tokens_fallback_single_kv_and_odd():
    from medfusion_tpu.ops.flash_attention import flash_attention_tokens

    # single-token KV (cross-attention) and odd head dim -> rearrange+naive
    q, k, v = _tok_inputs(n=64, m=1, heads=4, d=24)
    scale = 24 ** -0.25
    got = flash_attention_tokens(q, k, v, 4, scale)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_tok_reference(q, k, v, 4, scale)),
                               atol=1e-5)


def test_ops_tokens_wrapper_dispatches_by_kv_length(monkeypatch):
    import medfusion_tpu.ops as ops

    calls = []

    def fake_impl(q, k, v, num_heads, scale):
        calls.append(k.shape[1])
        return q

    monkeypatch.setattr(ops, "_FAT_IMPL", fake_impl)
    small = jnp.ones((1, 64, 128))
    big = jnp.ones((1, 256, 128))
    ops.flash_attention_tokens(small, small, small, 4, 0.3)
    assert calls == []
    ops.flash_attention_tokens(big, big, big, 4, 0.3)
    assert calls == [256]


def test_flash_tokens_rejects_non_dividing_heads():
    """A feature dim no head count can split must fail loudly at the API
    boundary (both the kernel module and the ops wrapper), not as an opaque
    reshape TypeError inside the fallback (review fix, round 4)."""
    import medfusion_tpu.ops as ops
    from medfusion_tpu.ops.flash_attention import flash_attention_tokens

    x = jnp.ones((2, 64, 100))
    with pytest.raises(ValueError, match="not divisible by num_heads"):
        flash_attention_tokens(x, x, x, 3, 0.3)
    with pytest.raises(ValueError, match="not divisible by num_heads"):
        ops.flash_attention_tokens(x, x, x, 3, 0.3)
