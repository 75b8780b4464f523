"""End-to-end pipelines (latent diffusion training/sampling)."""

from medfusion_tpu.pipelines.diffusion import (  # noqa: F401
    DiffusionPipeline,
    make_classifier_grad,
    repaint_op_schedule,
)
from medfusion_tpu.pipelines.flow import (  # noqa: F401
    FlowMatchingPipeline,
    shift_time,
)
