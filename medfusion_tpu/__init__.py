"""medfusion-tpu: a TPU-native (JAX/XLA/Pallas) latent-diffusion framework for
medical image synthesis, with the capabilities of mueller-franzes/medfusion.

Layout conventions
------------------
* Images and feature maps are **channels-last** (NHWC / NDHWC) — the native TPU
  conv layout.  The PyTorch reference is NCHW; the weight converter in
  :mod:`medfusion_tpu.utils.torch_compat` performs the transposition.
* All model code is functional (flax.linen): ``params`` pytrees + pure
  ``apply`` functions, jitted / pjit-sharded by the caller.
* Scheduler math is pure ``jnp`` (see :mod:`medfusion_tpu.core.schedules`);
  the whole sampling loop runs inside a single ``lax.scan`` under ``jit``.
"""

__version__ = "0.1.0"

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule  # noqa: F401
