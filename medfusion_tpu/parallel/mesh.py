"""Mesh construction and sharding rules.

TPU-native parallelism layer (SURVEY.md §2.4): one ``jax.sharding.Mesh`` with
axes ``('data', 'model')``:

* **data**: batch-dim sharding for the train step and the bulk
  sample_dataset/evaluate fan-out (BASELINE config 5). Gradient reduction is
  compiled into the step by GSPMD (all-reduce over ICI).
* **model**: optional tensor parallelism for the 1024-wide UNet bottleneck —
  conv kernels / dense layers are sharded on their output-channel dim where
  divisible; GSPMD inserts the matching all-gathers/reduce-scatters.

All shardings are expressed as ``NamedSharding(mesh, PartitionSpec(...))`` on
jit inputs/outputs; there is no hand-written collective in the model code, so
the same model runs on 1 chip, one host's 8 chips, or a multi-host pod
(after ``jax.distributed.initialize``) unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with dim-0 'data' sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def model_partition_spec(params: Any, mesh: Mesh, min_shard_dim: int = 256) -> Any:
    """Tensor-parallel PartitionSpecs for a param pytree.

    Rule: shard the output-channel (last) dim of conv/dense kernels over
    'model' when it is divisible by the axis size and at least
    ``min_shard_dim`` wide (the UNet bottleneck); replicate everything else.
    GSPMD propagates activations shardings and inserts collectives.
    """
    n_model = mesh.shape["model"]

    def spec(leaf):
        if n_model > 1 and np.ndim(leaf) >= 2:
            out_ch = leaf.shape[-1]
            if out_ch >= min_shard_dim and out_ch % n_model == 0:
                return P(*([None] * (np.ndim(leaf) - 1)), "model")
        return P()

    return jax.tree_util.tree_map(spec, params)


def fsdp_partition_spec(
    params: Any,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 2 ** 14,
    tp_specs: Any = None,
) -> Any:
    """ZeRO-3-style fully-sharded parameter specs.

    Each weight is *stored* sharded over ``axis``; under jit, GSPMD
    all-gathers a weight just before use and reduce-scatters its gradient —
    the JAX-native equivalent of FSDP/ZeRO-3, with the collectives compiled
    into the step rather than hand-written (the reference has no distributed
    training at all, SURVEY.md §2.4).

    Rule: shard the largest dim divisible by the axis size, skipping any dim
    already taken by ``tp_specs`` (so fsdp composes with tensor parallelism
    into a 2-D param sharding); leaves with fewer than ``min_size`` elements
    stay replicated — gathering tiny scales/biases costs more than it saves.
    """
    n = mesh.shape[axis]

    def spec(leaf, tp=P()):
        if n <= 1 or np.size(leaf) < min_size:
            return tp
        dims = list(tp) + [None] * (np.ndim(leaf) - len(tp))
        best, best_size = None, 0
        for i, d in enumerate(np.shape(leaf)):
            if dims[i] is None and d % n == 0 and d >= best_size and d > 1:
                best, best_size = i, d
        if best is None:
            return tp
        dims[best] = axis
        while dims and dims[-1] is None:
            dims.pop()
        return P(*dims)

    if tp_specs is None:
        return jax.tree_util.tree_map(spec, params)
    # two-tree map keyed on the params treedef: P specs are leaves here
    return jax.tree_util.tree_map(spec, params, tp_specs)


def shard_params(
    params: Any,
    mesh: Mesh,
    tensor_parallel: bool = False,
    fsdp: bool = False,
    min_shard_dim: int = 256,
    fsdp_min_size: int = 2 ** 14,
) -> Any:
    """Device-put params: replicated by default; 'model'-sharded per
    :func:`model_partition_spec` when ``tensor_parallel``; additionally
    'data'-sharded per :func:`fsdp_partition_spec` when ``fsdp``."""
    if not (tensor_parallel or fsdp):
        return jax.device_put(params, replicated(mesh))
    specs = (model_partition_spec(params, mesh, min_shard_dim=min_shard_dim)
             if tensor_parallel
             else jax.tree_util.tree_map(lambda _: P(), params))
    if fsdp:
        specs = fsdp_partition_spec(params, mesh, min_size=fsdp_min_size,
                                    tp_specs=specs)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
