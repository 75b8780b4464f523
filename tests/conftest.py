"""Hermetic test configuration.

Tests run on CPU with 8 virtual devices so mesh/sharding tests exercise real
collectives without TPU hardware (the driver separately dry-runs the multi-chip
path). Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote TPU backend and overrides
# JAX_PLATFORMS (axon/register/pjrt.py sets jax_platforms="axon,cpu"); undo it
# so tests run hermetically on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

# Parity oracles compare fp32 bit-level numerics vs torch; JAX CPU otherwise
# runs convs/matmuls at reduced ("fastest") precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Quick tier (`pytest -m quick`): the core-parity subset — scheduler math,
# sampler loops, model-forward parity, latent embedders, datasets, conv/attn
# blocks, the Pallas kernels, and the flow family. Measured ~7 min on the
# single CPU core (full suite ~47 min). slow-marked tests and the named
# end-to-end exclusions stay out of the tier.
_QUICK_MODULES = {
    "test_schedules", "test_pipeline", "test_full_model_parity",
    "test_latent_embedders", "test_data", "test_nn_blocks",
    "test_ops", "test_flow",
}
_QUICK_EXCLUDE = {"test_flow_cli_train_and_sample"}  # 54s CLI end-to-end


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__.rsplit(".", 1)[-1] in _QUICK_MODULES
                and "slow" not in item.keywords
                and item.originalname not in _QUICK_EXCLUDE):
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _isolate_ops_switches():
    """The Pallas/fusion switches are process-global and the product CLIs
    flip them (resolve_kernel_flags); without isolation a CLI-smoke test
    leaks its switch state into every later test module (e.g. fused-up convs
    under a torch-parity tolerance). Save/restore around every test; also
    restore FUSED_UP_VARIANT."""
    import medfusion_tpu.ops as ops
    from medfusion_tpu.nn import functional as F

    saved = (ops.flash_attention_enabled(), ops.fused_geglu_enabled(),
             ops.fused_group_norm_enabled(), ops.fused_up_conv_enabled(),
             F.FUSED_UP_VARIANT, ops.s2d_decode_tail_enabled())
    yield
    ops.enable_flash_attention(saved[0])
    ops.enable_fused_geglu(saved[1])
    ops.enable_fused_group_norm(saved[2])
    ops.enable_fused_up_conv(saved[3])
    F.FUSED_UP_VARIANT = saved[4]
    ops.enable_s2d_decode_tail(saved[5])
