"""Oracle parity of the SD schedule helpers vs the vendored
external/stable_diffusion/util.py (make_beta_schedule, make_ddim_timesteps,
make_ddim_sampling_parameters, betas_for_alpha_bar)."""

import importlib
import math
import sys
import types

import numpy as np
import pytest

from medfusion_tpu.core import (
    betas_for_alpha_bar,
    sd_ddim_sampling_parameters,
    sd_ddim_timesteps,
    sd_make_beta_schedule,
)

REF_DIR = "/root/reference/medical_diffusion/external/stable_diffusion"


def _ref_util():
    full = "refsd.util"
    if full in sys.modules:
        return sys.modules[full]
    if "refsd" not in sys.modules:
        pkg = types.ModuleType("refsd")
        pkg.__path__ = [REF_DIR]
        sys.modules["refsd"] = pkg
    return importlib.import_module(full)


@pytest.mark.parametrize("schedule", ["linear", "cosine", "sqrt_linear",
                                      "sqrt"])
def test_make_beta_schedule_parity(schedule):
    util = _ref_util()
    want = util.make_beta_schedule(schedule, 100, linear_start=2e-3,
                                   linear_end=2e-2)
    got = sd_make_beta_schedule(schedule, 100, linear_start=2e-3,
                                linear_end=2e-2)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-12)
    with pytest.raises(ValueError):
        sd_make_beta_schedule("nope", 10)


@pytest.mark.parametrize("method,n", [("uniform", 25), ("quad", 25),
                                      ("uniform", 50)])
def test_ddim_timesteps_parity(method, n):
    util = _ref_util()
    want = util.make_ddim_timesteps(method, n, 1000, verbose=False)
    got = sd_ddim_timesteps(n, 1000, method=method)
    np.testing.assert_array_equal(got, want)


def test_ddim_sampling_parameters_parity():
    util = _ref_util()
    import torch

    betas = sd_make_beta_schedule("linear", 1000)
    alphacums = np.cumprod(1.0 - betas)
    steps = sd_ddim_timesteps(50, 1000)
    want_s, want_a, want_ap = util.make_ddim_sampling_parameters(
        torch.from_numpy(alphacums), torch.from_numpy(steps), eta=0.5,
        verbose=False)
    got_s, got_a, got_ap = sd_ddim_sampling_parameters(alphacums, steps,
                                                       eta=0.5)
    np.testing.assert_allclose(got_s, np.asarray(want_s), atol=1e-12)
    np.testing.assert_allclose(got_a, np.asarray(want_a), atol=1e-12)
    np.testing.assert_allclose(got_ap, np.asarray(want_ap), atol=1e-12)


def test_betas_for_alpha_bar_parity():
    util = _ref_util()
    fn = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    want = util.betas_for_alpha_bar(200, fn)
    got = betas_for_alpha_bar(200, fn)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-12)
