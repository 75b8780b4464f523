"""End-to-end pipelines (latent diffusion training/sampling)."""

from medfusion_tpu.pipelines.diffusion import DiffusionPipeline  # noqa: F401
