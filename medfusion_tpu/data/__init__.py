"""Input pipeline: datasets (2D/3D), transforms, data module/loader.

Rebuilds the reference ``medical_diffusion/data`` stack (SURVEY.md §2.1 L6)
without torch: PIL + numpy + pandas producers yielding channels-last float32
batches ready for ``jax.device_put`` / ``parallel.shard_batch``."""

from medfusion_tpu.data.datasets_2d import (  # noqa: F401
    AIROGSDataset,
    CheXpert_2_Dataset,
    CheXpertDataset,
    MSIvsMSS_2_Dataset,
    MSIvsMSSDataset,
    SimpleDataset2D,
)
from medfusion_tpu.data.datasets_3d import SimpleDataset3D  # noqa: F401
from medfusion_tpu.data.synthetic import SyntheticDataset2D  # noqa: F401
from medfusion_tpu.data.datamodule import SimpleDataModule  # noqa: F401
