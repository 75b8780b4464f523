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


def __getattr__(name):
    """Lazy top-level API (keeps `import medfusion_tpu` light)."""
    _API = {
        "DiffusionPipeline": ("medfusion_tpu.pipelines.diffusion", "DiffusionPipeline"),
        "UNet": ("medfusion_tpu.models.unet", "UNet"),
        "UNetLegacy": ("medfusion_tpu.models.unet_legacy", "UNetLegacy"),
        "VAE": ("medfusion_tpu.models.latent_embedders", "VAE"),
        "VQVAE": ("medfusion_tpu.models.latent_embedders", "VQVAE"),
        "Discriminator": ("medfusion_tpu.models.latent_embedders", "Discriminator"),
        "TrainState": ("medfusion_tpu.train.state", "TrainState"),
        "make_mesh": ("medfusion_tpu.parallel.mesh", "make_mesh"),
    }
    if name in _API:
        import importlib

        module, attr = _API[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'medfusion_tpu' has no attribute {name!r}")
