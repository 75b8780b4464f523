"""Losses: GAN criteria, SSIM/MS-SSIM, LPIPS perceptual loss."""

from medfusion_tpu.losses.gan import exp_d_loss, hinge_d_loss, vanilla_d_loss  # noqa: F401
from medfusion_tpu.losses.ssim import ms_ssim, ssim  # noqa: F401
from medfusion_tpu.losses.lpips import LPIPS, VGG16Features  # noqa: F401
