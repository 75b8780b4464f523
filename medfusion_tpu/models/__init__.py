"""Model zoo: noise-estimator UNet, latent embedders, time/label embedders."""

from medfusion_tpu.models.embedders import (  # noqa: F401
    LabelEmbedder,
    LearnedSinusoidalPosEmb,
    SinusoidalPosEmb,
    TimeEmbedding,
)
from medfusion_tpu.models.latent_embedders import (  # noqa: F401
    VAE,
    VQVAE,
    Discriminator,
    NLayerDiscriminator,
    VectorQuantizer,
    diagonal_gaussian,
)
from medfusion_tpu.models.unet import UNet  # noqa: F401
