"""Evaluation metrics: FID (InceptionV3-2048), Improved Precision/Recall,
plus the autoencoder eval trio (LPIPS / MS-SSIM / MSE) re-exported."""

from medfusion_tpu.metrics.fid import FrechetInceptionDistance, frechet_distance  # noqa: F401
from medfusion_tpu.metrics.inception import InceptionV3, convert_torch_inception  # noqa: F401
from medfusion_tpu.metrics.pr import ImprovedPrecisionRecall, precision_recall  # noqa: F401
