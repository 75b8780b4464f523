"""Latent diffusion pipeline package (former single-module
``pipelines/diffusion.py``, split per sampler; the public import surface is
unchanged — everything re-exports from here). See :mod:`.core` for the
design docstring and the reference parity map."""

from medfusion_tpu.pipelines.diffusion.core import (  # noqa: F401
    _ELT_LOSSES,
    _LOSSES,
    DiffusionPipeline,
    gaussian_nll,
)
from medfusion_tpu.pipelines.diffusion.ddim import (  # noqa: F401
    repaint_op_schedule,
)
from medfusion_tpu.pipelines.diffusion.guidance import (  # noqa: F401
    make_classifier_grad,
)
