"""Host->device prefetch: overlap input decode/transfer with device compute.

The reference relies on torch DataLoader workers + pinned memory; the TPU
equivalent is keeping N batches in flight with async ``jax.device_put`` (or
sharded puts over a mesh) so the jitted step never waits on the host."""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2, mesh=None) -> Iterator:
    """Yield batches already resident on device, ``size`` batches ahead.
    With ``mesh``, batches are sharded over its 'data' axis."""
    from medfusion_tpu.parallel.mesh import shard_batch

    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
