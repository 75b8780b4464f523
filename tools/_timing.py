"""Shared on-chip marginal-timing harness for the tools/ A/B scripts.

Per-op cost through the axon tunnel is measured as
``(T(N_HI iters) - T(N_LO iters)) / (N_HI - N_LO)`` of one jitted
``lax.fori_loop`` that chains the op (damped 0.5x per application so bf16
values neither saturate nor denormal-flush), fetching ONE scalar checksum —
per-dispatch latency over the tunnel is hundreds of microseconds and
``block_until_ready`` returns early, so anything else mis-times (CLAUDE.md
"Micro-timing through the tunnel"). Best-of-``runs`` after one
compile+settle call. One definition so protocol changes (damping constant,
run count, loop lengths) keep every tool's numbers comparable.
"""

import time

import jax
import jax.numpy as jnp

N_LO, N_HI = 100, 900


def loop_total(fn, x, iters, runs=5):
    """Wall seconds for ``iters`` chained applications of ``fn`` (one jitted
    fori_loop, scalar-checksum fetch), best of ``runs``."""

    @jax.jit
    def loop(x0):
        def body(_, h):
            return (h + fn(h)).astype(h.dtype) * jnp.bfloat16(0.5)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0)
                       .astype(jnp.float32))

    float(loop(x))  # compile + settle
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_op(fn, x):
    """Marginal per-application seconds: (T(N_HI) - T(N_LO)) / (N_HI - N_LO)
    cancels the fixed dispatch+fetch overhead."""
    return (loop_total(fn, x, N_HI) - loop_total(fn, x, N_LO)) / (N_HI - N_LO)


def _timed(compiled, z0):
    t0 = time.perf_counter()
    float(compiled(z0))
    return time.perf_counter() - t0


def time_chained(apply_fn, z0, iters=20, runs=3):
    """ms per application of a PROGRAM-SIZED op (10s of ms — too big for the
    ``time_op`` 100/900-iteration protocol): ``iters`` chained applications
    in one jitted ``fori_loop``; ``apply_fn`` returns a scalar checksum, and
    the next input is the original perturbed by it (serializes the chain AND
    defeats CSE); ONE scalar fetch, best of ``runs``.

    One definition (decode_profile + few_step_profile both import it) so
    protocol changes keep the tools' numbers comparable."""

    def run(z_init):
        def body(_, carry):
            z, acc = carry
            s = apply_fn(z)
            return (z_init * (1.0 + 1e-6 * s.astype(z_init.dtype)), acc + s)

        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (z_init, jnp.zeros((), jnp.float32)))
        return acc

    compiled = jax.jit(run).lower(z0).compile()
    float(compiled(z0))  # settle
    best = min(_timed(compiled, z0) for _ in range(runs))
    return best / iters * 1e3
