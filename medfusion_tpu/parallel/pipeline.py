"""Pipeline parallelism (GPipe-style microbatch streaming) over a mesh axis.

Beyond-reference capability: the reference trains on a single pinned GPU
(``scripts/train_diffusion.py:64``, SURVEY §2.4 — no ``torch.distributed``
anywhere), so pipeline parallelism has no torch counterpart to mirror. This
is the TPU-native construction: each device on the ``axis`` of a
:class:`jax.sharding.Mesh` owns ONE stage's parameters (a stacked pytree
sharded on its leading dim), microbatches stream through the stage ring
with ``lax.ppermute`` neighbor pushes (ICI hops, no gather), and the whole
schedule is a single ``lax.scan`` inside one ``shard_map`` — one compiled
program, differentiable end-to-end (``jax.grad`` through ``ppermute``
gives the reverse-ring backward schedule automatically).

Schedule: the classic GPipe fill-drain pipeline — ``n_micro + n_stages - 1``
ticks; device ``s`` processes microbatch ``t - s`` at tick ``t``; bubble
fraction ``(S-1)/(T+S-1)``. Stages must be shape-preserving (activation
shape in == out), the usual contract for stacked-block pipelining.

Composes with the rest of :mod:`medfusion_tpu.parallel`: the stage axis is
just another mesh axis, so dp batch sharding (other axes) applies to the
microbatch dims untouched.
"""

from __future__ import annotations

import inspect
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

# pass check_vma=False only where the kwarg exists (newer jax) — passing it
# unconditionally would TypeError on exactly the old versions the import
# fallbacks above exist for
try:
    _SHARD_MAP_KW = ({"check_vma": False} if "check_vma" in
                     inspect.signature(shard_map).parameters else {})
except (TypeError, ValueError):  # pragma: no cover - exotic wrappers
    _SHARD_MAP_KW = {}

try:  # mark a replicated value as device-varying (shard_map vma typing)
    from jax.lax import pcast as _pcast

    def _pvary(x, axes):
        return _pcast(x, axes, to="varying")
except ImportError:  # pragma: no cover - older jax
    try:
        from jax.lax import pvary as _pvary
    except ImportError:
        _pvary = None


def stack_stage_params(params_list: Sequence[Any]):
    """Stack per-stage param pytrees along a new leading 'stage' dim."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0),
                                  *params_list)


def pipeline_partition_spec(stacked_params, axis: str = "model"):
    """PartitionSpec pytree placing the leading stage dim on ``axis``."""
    return jax.tree_util.tree_map(lambda _: P(axis), stacked_params)


def shard_stage_params(stacked_params, mesh: Mesh, axis: str = "model",
                       zero_axis: str = None):
    """Place each stage's slice of the stacked params on its pipeline device.

    ``zero_axis``: optionally ZeRO-3-shard each stage's params over a second
    mesh axis (pp x fsdp composition): the first post-stage dim of every leaf
    is sharded over ``zero_axis`` at rest and all-gathered just-in-time
    inside :func:`pipeline_apply` (pass the same ``zero_axis`` there).
    Requires that dim to divide by ``mesh.shape[zero_axis]`` for every leaf
    of rank >= 2; rank-1 stacked leaves (a per-stage scalar parameter) have
    no post-stage dim to shard and stay replicated over ``zero_axis``.
    """
    return jax.tree_util.tree_map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, _stage_leaf_spec(v, axis, zero_axis))),
        stacked_params)


def _stage_leaf_spec(v, axis: str, zero_axis: str):
    """Per-leaf spec for stacked stage params: ZeRO-shard the first
    post-stage dim when there is one; scalars-per-stage stay replicated."""
    if zero_axis and v.ndim >= 2:
        return P(axis, zero_axis)
    return P(axis)


def _mark_varying(x, axis_name: str, anchor):
    """Give a freshly-built constant the device-varying type of ``anchor``
    so it is a legal shard_map loop carry (see ring_attention.py)."""
    if _pvary is not None:
        return _pvary(x, (axis_name,))
    leaf = jax.tree_util.tree_leaves(anchor)[0]
    return x + jnp.zeros((), x.dtype) * leaf.ravel()[0].astype(x.dtype)


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params, x: jnp.ndarray, *, mesh: Mesh,
                   axis: str = "model", n_microbatches: int = None,
                   data_axis: str = None, zero_axis: str = None):
    """Apply ``n_stages = mesh.shape[axis]`` sequential stages to ``x``.

    Args:
      stage_fn: ``(stage_params, activation) -> activation`` — one stage,
        shape-preserving.
      stacked_params: pytree with leading dim ``n_stages`` (see
        :func:`stack_stage_params`), sharded over ``axis``.
      x: global input ``[B, ...]``; ``B`` must divide into
        ``n_microbatches`` equal microbatches.
      n_microbatches: defaults to ``n_stages`` (minimum sane choice; more
        microbatches shrink the pipeline bubble).
      data_axis: optional second mesh axis carrying data parallelism — the
        microbatch batch dim is sharded over it (dp x pp composition).
      zero_axis: optional mesh axis over which each stage's params are
        ZeRO-3-sharded at rest (see :func:`shard_stage_params`); they are
        all-gathered just-in-time per stage (pp x fsdp composition —
        differentiable: the gather's vjp is a reduce-scatter, so gradient
        memory stays sharded too). Usually the same axis as ``data_axis``.

    Returns the stage composition ``stage_{S-1}(... stage_0(x))`` with the
    same sharding layout as ``x`` (replicated over ``axis``).
    """
    n_stages = mesh.shape[axis]
    n_micro = n_microbatches or n_stages
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    x_mb = x.reshape((n_micro, b // n_micro) + x.shape[1:])
    x_spec = P(None, data_axis) if data_axis else P()
    p_spec = jax.tree_util.tree_map(
        lambda v: _stage_leaf_spec(v, axis, zero_axis), stacked_params)

    @partial(shard_map, mesh=mesh,
             in_specs=(p_spec, x_spec), out_specs=x_spec,
             **_SHARD_MAP_KW)
    def run(p_stacked, xm):
        p_local = jax.tree_util.tree_map(lambda v: v[0], p_stacked)
        if zero_axis is not None:
            # ZeRO-3 just-in-time gather of this stage's full params
            # (per-stage scalars were never sharded — no dim to gather)
            p_local = jax.tree_util.tree_map(
                lambda v: (jax.lax.all_gather(v, zero_axis, axis=0,
                                              tiled=True)
                           if v.ndim >= 1 else v),
                p_local)
        stage_id = jax.lax.axis_index(axis)
        is_first = (stage_id == 0)
        is_last = (stage_id == n_stages - 1)
        fwd = [(i, i + 1) for i in range(n_stages - 1)]

        # bootstrap with a REAL microbatch, not zeros: fill/drain ticks run
        # stage_fn on this carry, and an all-zeros activation is exactly the
        # out-of-distribution input that turns normalizing stages into
        # NaN factories (mean(x^2)=0 denominators, sqrt'(0)=inf in the vjp)
        act0 = _mark_varying(xm[0], axis, p_local)
        out0 = _mark_varying(jnp.zeros_like(xm), axis, p_local)
        x_mb_local = xm

        def compute(act, out, t):
            idx = t - stage_id  # microbatch this stage works on now
            inp = jnp.where(is_first,
                            x_mb_local[jnp.clip(t, 0, n_micro - 1)], act)
            y = stage_fn(p_local, inp)
            valid = jnp.logical_and(idx >= 0, idx < n_micro)
            take = jnp.logical_and(valid, is_last)
            # where(), NOT y * mask: 0 * NaN = NaN would let a garbage tick
            # poison the output (and its vjp injects an exact-zero cotangent
            # into garbage ticks, keeping the backward finite too)
            out = out.at[jnp.clip(idx, 0, n_micro - 1)].add(
                jnp.where(take, y, jnp.zeros_like(y)))
            return y, out

        def tick(carry, t):
            act, out = carry
            y, out = compute(act, out, t)
            # push to the next stage (last stage's output leaves the ring)
            act = jax.lax.ppermute(y, axis, perm=fwd)
            return (act, out), None

        ticks = jnp.arange(n_micro + n_stages - 1)
        (act, out), _ = jax.lax.scan(tick, (act0, out0), ticks[:-1])
        # final tick: compute only — a trailing ppermute would be one wasted
        # full-activation ICI exchange nobody consumes
        _, out = compute(act, out, ticks[-1])
        # only the last stage holds real data -> psum replicates the result
        return jax.lax.psum(out, axis)

    y = run(stacked_params, x_mb)
    return y.reshape(x.shape)
