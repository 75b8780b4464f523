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
from medfusion_tpu.models.latent_embedders_diffusers import (  # noqa: F401
    AutoencoderKLDiffusers,
    VQModelDiffusers,
    convert_diffusers_vae_state_dict,
)
from medfusion_tpu.models.dit import DiT  # noqa: F401
from medfusion_tpu.models.unet import UNet  # noqa: F401
from medfusion_tpu.models.unet_diffusers import (  # noqa: F401
    UNet2DConditionDiffusers,
    convert_diffusers_unet_state_dict,
)
from medfusion_tpu.models.unet_lucidrains import (  # noqa: F401
    UNetLucidrains,
    convert_lucidrains_state_dict,
)
from medfusion_tpu.models.unet_openai import (  # noqa: F401
    EncoderUNetOpenAI,
    UNetOpenAI,
    convert_openai_state_dict,
)
