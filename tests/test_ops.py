"""Pallas kernels: numerical equivalence vs the pure-XLA paths (interpret mode
on CPU; the same kernels compile for TPU)."""

import numpy as np
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
    small = jnp.ones((1, 2, 256, 64))
    big = jnp.ones((1, 2, 1024, 64))
    ops.flash_attention(small, small, small, 0.3)
    assert calls == []  # short sequence: naive path, kernel untouched
    ops.flash_attention(big, big, big, 0.3)
    assert calls == [1024]
