"""Named presets reproducing the reference script literals.

chest  — CheXpert_2 256x256, latent 8x32x32
         (``/root/reference/scripts/train_diffusion.py:47-132``,
          ``train_latent_embedder_2d.py:59-81``; sampling ``sample.py:45``)
eye    — AIROGS 256x256, latent 4x32x32 (``streamlit/pages/eye.py:34``)
colon  — MSIvsMSS_2 512x512 source, latent 4x64x64 (``streamlit/pages/colon.py``)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    image_size: int
    in_channels: int
    latent_shape: Tuple[int, int, int]  # (H, W, C) channels-last
    emb_channels: int
    num_classes: Optional[int]
    vae_hid_chs: Tuple[int, ...] = (64, 128, 256, 512)
    unet_hid_chs: Tuple[int, ...] = (256, 256, 512, 1024)
    # diffusion schedule (train_diffusion.py:102-108)
    timesteps: int = 1000
    schedule: str = "scaled_linear"
    beta_start: float = 0.002
    beta_end: float = 0.02
    cfg_dropout: float = 0.5
    # training (train_diffusion.py:38,55; train_latent_embedder_2d.py:61)
    diffusion_batch_size: int = 32
    diffusion_lr: float = 1e-4
    ae_batch_size: int = 8
    ae_lr: float = 1e-4
    ae_loss: str = "l2"  # reference uses MSELoss for the chest VAE (:76)
    ae_embedding_loss_weight: float = 1e-6
    ae_deep_supervision: int = 1
    dataset: str = "chexpert_2"


PRESETS = {
    "chest": Preset(
        name="chest", image_size=256, in_channels=3, latent_shape=(32, 32, 8),
        emb_channels=8, num_classes=2, dataset="chexpert_2",
    ),
    "eye": Preset(
        name="eye", image_size=256, in_channels=3, latent_shape=(32, 32, 4),
        emb_channels=4, num_classes=2, dataset="airogs",
    ),
    "colon": Preset(
        name="colon", image_size=512, in_channels=3, latent_shape=(64, 64, 4),
        emb_channels=4, num_classes=2, dataset="msivsmss_2",
    ),
    # hermetic smoke preset: tiny everything, synthetic data
    "smoke": Preset(
        name="smoke", image_size=32, in_channels=3, latent_shape=(8, 8, 2),
        emb_channels=2, num_classes=2, vae_hid_chs=(8, 16, 32),
        unet_hid_chs=(16, 32), timesteps=20, diffusion_batch_size=4,
        ae_batch_size=4, dataset="synthetic", ae_deep_supervision=0,
    ),
}


def build_vae(p: Preset, kind: str = "vae"):
    """Latent embedder by kind: 'vae' (KL) / 'vqvae' (codebook) from the
    in-house family, or 'diffusers_kl' / 'diffusers_vq' (the diffusers
    AutoencoderKL/VQModel family, reference external/diffusers/vae.py)."""
    if kind in ("diffusers_kl", "diffusers_vq"):
        from medfusion_tpu.models.latent_embedders_diffusers import (
            AutoencoderKLDiffusers,
            VQModelDiffusers,
        )

        # vae_hid_chs maps to block_out_channels: len = down levels + 1,
        # same 2^(len-1) total downsampling as the in-house strides
        groups = 32 if min(p.vae_hid_chs) >= 32 else min(p.vae_hid_chs) // 2
        common = dict(
            in_channels=p.in_channels, out_channels=p.in_channels,
            emb_channels=p.emb_channels, block_out_channels=p.vae_hid_chs,
            layers_per_block=1, norm_num_groups=groups,
        )
        if kind == "diffusers_vq":
            return VQModelDiffusers(num_embeddings=8192, **common)
        return AutoencoderKLDiffusers(**common)
    from medfusion_tpu.models.latent_embedders import VAE, VQVAE

    n_groups = 8 if min(p.vae_hid_chs) >= 8 else min(p.vae_hid_chs)
    common = dict(
        in_channels=p.in_channels, out_channels=p.in_channels,
        emb_channels=p.emb_channels, hid_chs=p.vae_hid_chs,
        kernel_sizes=(3,) * len(p.vae_hid_chs),
        strides=(1,) + (2,) * (len(p.vae_hid_chs) - 1),
        deep_supervision=p.ae_deep_supervision,
        norm_name=("GROUP", {"num_groups": n_groups, "affine": True}),
    )
    if kind == "vqvae":
        return VQVAE(num_embeddings=8192, beta=0.25, **common)
    return VAE(**common)


def build_unet(p: Preset, estimator: str = "unet", attention: str = "none",
               attn_heads: int = 8):
    """Noise estimator by family: 'unet' (reference unet2), 'unet_legacy'
    (reference estimators/unet.py), 'openai' (the SD/ADM UNet, reference
    external/stable_diffusion/unet_openai.py), 'lucidrains' (the compact
    DDPM UNet, reference external/unet_lucidrains.py — no label cond), or
    'dit' (Diffusion Transformer, arXiv:2212.09748 — beyond the
    reference; pure-matmul/MXU architecture, flash-attention-accelerated
    in training AND sampling).

    ``attention`` is the reference's per-level ``use_attention`` config
    ('none'|'linear'|'spatial', attention_blocks.py:291-335), honored by
    the unet/unet_legacy families (CLI: ``--attention``). ``attn_heads``
    (unet family only) trades heads for head width at the SAME projection
    shapes/param count — 2 heads x d=128 runs the attention einsums up to
    3.93x faster on TPU than the reference's 8 x d=32 (measured,
    tools/colon_roofline.py; the MXU contracts 128-deep)."""
    n = len(p.unet_hid_chs)
    if attention != "none" and estimator not in ("unet", "unet_legacy"):
        raise ValueError(
            f"attention={attention!r} only configures the unet/unet_legacy "
            f"families; estimator {estimator!r} fixes its own attention")
    if attn_heads != 8 and estimator != "unet":
        raise ValueError(
            f"attn_heads={attn_heads} is a unet-family option; "
            f"{estimator!r} pins the reference head geometry")
    if estimator == "dit":
        from medfusion_tpu.models.dit import DiT

        # hidden sized off the preset's top width, floored to a multiple of
        # 4 heads x 4 (sin-cos table needs hidden % 4 == 0)
        hidden = max(64, (p.unet_hid_chs[-1] // 16) * 16)
        heads = max(4, hidden // 64)
        while hidden % heads:  # heads must divide hidden (e.g. hidden=336)
            heads -= 1
        return DiT(
            in_ch=p.emb_channels, patch_size=2, hidden_size=hidden,
            depth=max(2, len(p.unet_hid_chs) * 3),
            num_heads=heads,
            cond_emb_num_classes=p.num_classes,
        )
    if estimator == "openai":
        from medfusion_tpu.models.unet_openai import UNetOpenAI

        mc = p.unet_hid_chs[0]
        assert all(c % mc == 0 for c in p.unet_hid_chs), (
            "openai estimator needs hid_chs that are multiples of hid_chs[0]")
        groups = 32 if min(p.unet_hid_chs) >= 32 else min(p.unet_hid_chs) // 2
        return UNetOpenAI(
            in_channels=p.emb_channels, model_channels=mc,
            out_channels=p.emb_channels,
            channel_mult=tuple(c // mc for c in p.unet_hid_chs),
            num_res_blocks=2, attention_resolutions=(),
            num_classes=p.num_classes, num_heads=8,
            use_scale_shift_norm=True, resblock_updown=True,
            norm_groups=groups,
        )
    if estimator == "lucidrains":
        from medfusion_tpu.models.unet_lucidrains import UNetLucidrains

        mc = p.unet_hid_chs[0]
        assert all(c % mc == 0 for c in p.unet_hid_chs), (
            "lucidrains estimator needs hid_chs that are multiples of hid_chs[0]")
        return UNetLucidrains(
            dim=mc, dim_mults=tuple(c // mc for c in p.unet_hid_chs),
            channels=p.emb_channels,
            resnet_block_groups=8 if mc >= 8 else mc // 2,
        )
    n_groups = 32 if min(p.unet_hid_chs) >= 32 else min(p.unet_hid_chs) // 2
    common = dict(
        in_ch=p.emb_channels, out_ch=p.emb_channels,
        hid_chs=p.unet_hid_chs, kernel_sizes=(3,) * n,
        strides=(1,) + (2,) * (n - 1),
        time_emb_dim=p.unet_hid_chs[-1],
        cond_emb_num_classes=p.num_classes,
        deep_supervision=0, use_attention=attention,
        norm_name=("GROUP", {"num_groups": n_groups, "affine": True}),
    )
    if estimator == "unet_legacy":
        from medfusion_tpu.models.unet_legacy import UNetLegacy

        return UNetLegacy(**common)
    if estimator != "unet":
        raise ValueError(f"unknown estimator {estimator!r}")
    from medfusion_tpu.models.unet import UNet

    return UNet(use_res_block=True, attn_heads=attn_heads, **common)


def build_scheduler(p: Preset, zero_terminal_snr: bool = False):
    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule

    return GaussianDiffusionSchedule.create(
        timesteps=p.timesteps, schedule_strategy=p.schedule,
        beta_start=p.beta_start, beta_end=p.beta_end,
        zero_terminal_snr=zero_terminal_snr,
    )


def build_dataset(p: Preset, data_root: Optional[str], n_synthetic: int = 64, seed: int = 0):
    from medfusion_tpu.data import (
        AIROGSDataset,
        CheXpert_2_Dataset,
        MSIvsMSS_2_Dataset,
        SyntheticDataset2D,
    )

    if p.dataset == "synthetic" or data_root is None:
        return SyntheticDataset2D(n=n_synthetic, image_size=p.image_size,
                                  channels=p.in_channels, num_classes=p.num_classes,
                                  seed=seed)
    common = dict(image_resize=p.image_size, image_crop=p.image_size,
                  augment_horizontal_flip=True)
    if p.dataset == "chexpert_2":
        return CheXpert_2_Dataset(data_root, **common)
    if p.dataset == "airogs":
        return AIROGSDataset(data_root, crawler_ext="jpg", **common)
    if p.dataset == "msivsmss_2":
        return MSIvsMSS_2_Dataset(data_root, crawler_ext="jpg", **common)
    raise ValueError(f"unknown dataset {p.dataset!r}")
