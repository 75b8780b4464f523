"""Multi-host initialization: REAL 2-process jax.distributed bring-up on CPU.

The reference has no distributed runtime (SURVEY §2.4); this framework's
multi-host layer (`parallel/multihost.py`) is exercised here with two actual
processes coordinating over localhost — initialize, build a global mesh over
both processes' devices, run a psum-reducing jitted step, verify the
per-host batch slicing, and do a COORDINATED ORBAX CHECKPOINT of a
data-sharded TrainState: both processes call save_checkpoint (orbax
coordinates the distributed array write), then both restore into a sharded
template and verify their local shards — the test behind
utils/checkpoint.py's "Orbax handles multi-host coordination" claim."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from medfusion_tpu.parallel.multihost import initialize_multihost, per_host_batch_slice

coord = sys.argv[1]
pid = int(sys.argv[2])

info = initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert info["process_count"] == 2, info
assert info["process_index"] == pid, info
# idempotent: second call must be a no-op, not a re-initialize crash
info2 = initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert info2["process_count"] == 2

# global mesh over both processes' devices + a psum-compiled computation
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from medfusion_tpu.parallel.mesh import make_mesh

mesh = make_mesh(n_model=1)
assert mesh.devices.size == jax.device_count() == 2

global_batch = 8
sl = per_host_batch_slice(global_batch)
assert sl == slice(pid * 4, pid * 4 + 4), sl
local = np.arange(global_batch, dtype=np.float32)[sl]
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (global_batch,)
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
np.testing.assert_allclose(np.asarray(total), np.arange(8).sum())
print(f"proc {pid} OK", flush=True)

# ---- coordinated orbax checkpoint of a SHARDED TrainState ----
import optax
from medfusion_tpu.train import TrainState
from medfusion_tpu.utils import checkpoint as C

ckpt_dir = sys.argv[3]
sharding = NamedSharding(mesh, P("data"))
local_w = (np.arange(global_batch, dtype=np.float32) * 2.0 + 1.0)[sl]
w = jax.make_array_from_process_local_data(sharding, local_w, (global_batch,))
# globalize_for_multihost: orbax refuses host-local scalars (step, optax
# counts) in a multi-process save; they must be replicated global arrays
state = C.globalize_for_multihost(TrainState.create({"w": w}, optax.sgd(0.1)), mesh)
# every process calls save; orbax coordinates the distributed array write
C.save_checkpoint(ckpt_dir, state, step=7)
assert C.latest_step(ckpt_dir) == 7

# restore into a sharded ZERO template — values must come from disk
zeros = jax.make_array_from_process_local_data(
    sharding, np.zeros_like(local_w), (global_batch,))
template = C.globalize_for_multihost(
    TrainState.create({"w": zeros}, optax.sgd(0.1)), mesh)
restored = C.restore_checkpoint(ckpt_dir, template)
shards = restored.params["w"].addressable_shards
assert len(shards) == 1, len(shards)
np.testing.assert_allclose(np.asarray(shards[0].data), local_w)
print(f"proc {pid} ckpt OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_init_and_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "PALLAS_AXON_POOL_IPS": "",  # keep the axon plugin out of the workers
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(Path(__file__).resolve().parent.parent),
    }
    ckpt_dir = tmp_path / "shared_ckpt"
    procs = [
        subprocess.Popen([sys.executable, str(worker), coord, str(i), str(ckpt_dir)],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers hung")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"proc {i} OK" in out
        assert f"proc {i} ckpt OK" in out  # coordinated orbax save/restore
