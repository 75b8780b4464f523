"""Load pieces of the PyTorch reference (/root/reference) as golden oracles.

The reference's package __init__ imports pytorch_lightning/monai (absent in this
image), so modules are loaded file-by-file with their intra-package imports
stubbed. Only torch-pure modules are loadable (noise schedulers, gan losses,
math utils); model code needs MONAI and is oracled instead against torch.nn
primitives directly in the tests.
"""

import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference/medical_diffusion")


def _load(path: Path, name: str, injections: dict):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__.update(injections)
    # Pre-register so dataclasses etc. resolve.
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def reference_schedulers():
    """Returns the reference module namespace holding BasicNoiseScheduler and
    GaussianNoiseScheduler (torch-only)."""
    if "sched" in _cache:
        return _cache["sched"]
    base = _load(REF / "models/noise_schedulers/scheduler_base.py", "_ref_sched_base", {})
    # gaussian_scheduler does `from medical_diffusion.models.noise_schedulers import BasicNoiseScheduler`
    pkg = types.ModuleType("medical_diffusion.models.noise_schedulers")
    pkg.BasicNoiseScheduler = base.BasicNoiseScheduler
    shim_parents = {
        "medical_diffusion": types.ModuleType("medical_diffusion"),
        "medical_diffusion.models": types.ModuleType("medical_diffusion.models"),
        "medical_diffusion.models.noise_schedulers": pkg,
    }
    saved = {k: sys.modules.get(k) for k in shim_parents}
    sys.modules.update(shim_parents)
    try:
        gauss = _load(REF / "models/noise_schedulers/gaussian_scheduler.py", "_ref_sched_gauss", {})
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    ns = types.SimpleNamespace(
        BasicNoiseScheduler=base.BasicNoiseScheduler,
        GaussianNoiseScheduler=gauss.GaussianNoiseScheduler,
    )
    _cache["sched"] = ns
    return ns


def reference_gan_losses():
    if "gan" in _cache:
        return _cache["gan"]
    mod = _load(REF / "loss/gan_losses.py", "_ref_gan_losses", {})
    _cache["gan"] = mod
    return mod


def reference_math_utils():
    if "math" in _cache:
        return _cache["math"]
    mod = _load(REF / "utils/math_utils.py", "_ref_math_utils", {})
    _cache["math"] = mod
    return mod
