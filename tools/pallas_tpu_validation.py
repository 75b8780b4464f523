"""On-chip Pallas kernel validation (VERDICT r1 item 7).

Runs both Pallas kernels in COMPILED Mosaic mode (not interpret) on the real
TPU at the shipped model shapes, asserts numerical equivalence against the
pure-XLA implementations, and reports timings. The recorded output lives in
PARITY.md ("Pallas on-chip validation").

Timing method: each kernel is applied ITERS times inside one jitted
``lax.fori_loop`` (output feeds input), so the axon tunnel's per-dispatch
latency is amortized away; per-application time = loop time / ITERS.

Shapes:
* fused GroupNorm+SiLU — UNet/VAE hot-path activations (conv_blocks.py order
  Conv->GN->SiLU): the chest latent-UNet levels at B=32 and the VAE decoder
  mid-stage at 128^2.
* flash attention — [B, H, N, D] at the framework's maximum token count
  (64*64 = 4096, SURVEY §5) and the 32x32=1024 spatial-attention case.

Run ALONE on the chip (one process, several small compiles):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/pallas_tpu_validation.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

ITERS = 50  # kernel applications per jitted timing loop


def _time_loop(loop_fn, *args, runs=3):
    """Best-of-``runs`` wall time of the compiled loop / ITERS."""
    out = loop_fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(loop_fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def validate_group_norm():
    from medfusion_tpu.ops.group_norm import (
        fused_group_norm_silu,
        group_norm_silu_reference,
    )

    print("== fused GroupNorm+SiLU (Mosaic) vs XLA ==")
    cases = [  # (shape NHWC, groups, dtype) — shipped configs
        ((32, 32, 32, 256), 32, jnp.bfloat16),   # UNet level 0/1 @ B=32
        ((32, 16, 16, 512), 32, jnp.bfloat16),   # UNet level 2
        ((32, 8, 8, 1024), 32, jnp.bfloat16),    # UNet bottleneck
        ((32, 32, 32, 256), 32, jnp.float32),    # fp32 comparison point
        ((8, 128, 128, 128), 32, jnp.bfloat16),  # VAE decoder mid
    ]
    for shape, groups, dtype in cases:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), dtype)
        scale = jnp.asarray(rng.standard_normal(shape[-1]), dtype) * 0.2 + 1.0
        bias = jnp.asarray(rng.standard_normal(shape[-1]), dtype) * 0.1

        def make_loop(fn):
            @jax.jit
            def loop(x0, s, b):
                return jax.lax.fori_loop(
                    0, ITERS, lambda i, h: fn(h, s, b, groups), x0
                )
            return loop

        t_ref = _time_loop(make_loop(group_norm_silu_reference), x, scale, bias)
        t_pal = _time_loop(make_loop(fused_group_norm_silu), x, scale, bias)
        y_ref = jax.jit(lambda a, s, b: group_norm_silu_reference(a, s, b, groups))(
            x, scale, bias)
        y_pal = jax.jit(lambda a, s, b: fused_group_norm_silu(a, s, b, groups))(
            x, scale, bias)
        diff = float(jnp.max(jnp.abs(y_pal.astype(jnp.float32) - y_ref.astype(jnp.float32))))
        tol = 1e-2 if dtype == jnp.bfloat16 else 1e-5
        status = "OK" if diff <= tol else "FAIL"
        print(f"{str(shape):22s} {jnp.dtype(dtype).name:9s} xla={t_ref*1e6:8.1f}us "
              f"pallas={t_pal*1e6:8.1f}us speedup={t_ref/t_pal:5.2f}x "
              f"max|d|={diff:.2e} {status}")
        assert diff <= tol, f"GN mismatch at {shape} {jnp.dtype(dtype).name}: {diff}"


def validate_flash_attention():
    from medfusion_tpu.ops.flash_attention import flash_attention

    def naive(q, k, v, scale):
        # Default-precision reference (matches the model's compute path; a
        # HIGHEST-precision bf16 einsum is rejected by the TPU backend, which
        # folds the f32 upcasts back into a bf16 matmul).
        sm = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", (q * scale).astype(jnp.float32),
                       (k * scale).astype(jnp.float32)), axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", sm, v.astype(jnp.float32)).astype(q.dtype)

    print("== flash attention (Mosaic) vs naive XLA ==")
    cases = [  # (B, H, N, D, dtype)
        (8, 8, 4096, 64, jnp.bfloat16),   # colon 64x64 latent, max tokens
        (32, 8, 1024, 64, jnp.bfloat16),  # chest/eye 32x32 latent
        (8, 8, 4096, 64, jnp.float32),
    ]
    for b, h, n, d, dtype in cases:
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        scale = float(d) ** -0.25

        def make_loop(fn):
            @jax.jit
            def loop(q0, kk, vv):
                return jax.lax.fori_loop(
                    0, ITERS, lambda i, qq: fn(qq, kk, vv, scale), q0
                )
            return loop

        t_ref = _time_loop(make_loop(naive), q, k, v)
        t_pal = _time_loop(make_loop(flash_attention), q, k, v)
        y_ref = jax.jit(lambda a, b_, c: naive(a, b_, c, scale))(q, k, v)
        y_pal = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, scale))(q, k, v)
        diff = float(jnp.max(jnp.abs(y_pal.astype(jnp.float32) - y_ref.astype(jnp.float32))))
        # fp32 tol: the two paths order the 4096-term softmax reduction
        # differently at default MXU precision (measured ~5e-4).
        tol = 2e-2 if dtype == jnp.bfloat16 else 1e-3
        status = "OK" if diff <= tol else "FAIL"
        print(f"[{b},{h},{n},{d}] {jnp.dtype(dtype).name:9s} xla={t_ref*1e6:8.1f}us "
              f"pallas={t_pal*1e6:8.1f}us speedup={t_ref/t_pal:5.2f}x "
              f"max|d|={diff:.2e} {status}")
        assert diff <= tol, f"flash mismatch at {(b,h,n,d)} {jnp.dtype(dtype).name}: {diff}"


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    assert jax.default_backend() != "cpu", (
        "this validation must run the compiled Mosaic path on a TPU; "
        "on CPU the kernels auto-fall back to interpret mode"
    )
    validate_group_norm()
    validate_flash_attention()
    print("ALL PALLAS KERNELS VALIDATED ON-CHIP")


if __name__ == "__main__":
    main()
