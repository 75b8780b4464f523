"""Multi-host (pod) initialization.

The reference is single-device (SURVEY.md §2.4). On TPU pods, JAX processes
coordinate over DCN: call :func:`initialize_multihost` once at program start,
then build the global mesh with :func:`medfusion_tpu.parallel.make_mesh`
(which sees all devices across hosts via ``jax.devices()``). Orbax
checkpointing (utils/checkpoint.py) is already multi-host coordinated.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """``jax.distributed.initialize`` with env autodetection (TPU pods fill
    everything from the metadata server when args are None). No-op when the
    runtime is already initialized or single-process.

    Returns a summary dict {process_index, process_count, local/global devices}.
    """
    wants_init = coordinator_address is not None or (num_processes or 1) > 1
    # IMPORTANT: do not touch jax.process_count()/jax.devices() before
    # initialize() — they initialize the XLA backend and initialize() then
    # refuses to run. The distributed client state is checkable without that.
    try:
        from jax._src import distributed as _dist

        already_init = _dist.global_state.client is not None
    except Exception:
        already_init = False
    if wants_init and not already_init:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def per_host_batch_slice(global_batch: int) -> slice:
    """Each host loads its contiguous shard of the global batch (the data
    pipeline is per-host; `jax.make_array_from_process_local_data` or sharded
    device_put assembles the global array)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
