"""Attention config + Pallas kernel switches for every product CLI.

The reference treats attention as a first-class model config: the training
script sets ``use_attention`` on the UNet
(``/root/reference/scripts/train_diffusion.py:97``) and
``attention_blocks.py:291-335`` dispatches none/linear/spatial per level.
This module gives train_diffusion / sample / sample_dataset / the demo
server the same surface, plus the measured Pallas kernel switches
(PARITY.md "attention-enabled program": shape-aware flash attention and the
fused LN+GEGLU+proj MLP, +28-36% sampling / 1.19-1.31x train on the
spatial-attention geometries).

Defaults are *auto*: whenever the requested model actually contains
attention (``--attention linear|spatial`` on the unet/unet_legacy families,
or the all-attention ``--estimator dit``), the measured kernel dispatch is
enabled; ``--no-flash`` / ``--no-fused-geglu`` force the pure-XLA paths.
The switches are numerically-equivalence-tested (tests/test_ops.py) and the
flash wrapper is shape-aware, so short-sequence levels still take the
measured-faster naive path.
"""

from __future__ import annotations

import argparse

ATTENTION_CHOICES = ("none", "linear", "spatial")
# families whose architecture takes the reference's per-level use_attention
# config; the others fix their own attention (dit: all levels by
# construction; openai/lucidrains: family-specific settings)
ATTENTION_CONFIGURABLE = ("unet", "unet_legacy")


def add_kernel_args(ap: argparse.ArgumentParser, attention: bool = True) -> None:
    if attention:
        ap.add_argument(
            "--attention", choices=ATTENTION_CHOICES, default="none",
            help="UNet attention flavor per the reference's use_attention "
                 "config (attention_blocks.py:291-335): 'linear' = "
                 "single-layer transformer, 'spatial' = SpatialTransformer "
                 "(the eye/colon attention configs). unet/unet_legacy "
                 "families only; presets default to 'none' (the pinned "
                 "chest protocol)")
    if attention:
        ap.add_argument(
            "--attention-heads", type=int, default=8,
            help="attention heads on the unet family (reference geometry: "
                 "8 heads x ch/8). Fewer, wider heads keep the same "
                 "projection shapes/param count and run the attention "
                 "einsums up to 3.93x faster on TPU (2 heads = d>=128 at "
                 "the preset widths; measured, tools/colon_roofline.py). "
                 "Must divide every attended level's channel width")
    ap.add_argument(
        "--flash", action=argparse.BooleanOptionalAction, default=None,
        help="route attention through the shape-aware Pallas flash kernel "
             "(measured dispatch, PARITY.md round 4). Default: auto — on "
             "whenever the model has attention layers")
    ap.add_argument(
        "--fused-geglu", action=argparse.BooleanOptionalAction, default=None,
        help="route the SpatialTransformer MLP through the fused "
             "LN+GEGLU+proj Pallas kernel (ops/geglu.py). Default: auto — "
             "on with --attention spatial")
    ap.add_argument(
        "--fused-up", action=argparse.BooleanOptionalAction, default=None,
        help="route integer-2x nearest-upsample + 3x3-conv pairs (UNet and "
             "VAE decoder up-levels) through the exact 4-phase 2x2-conv "
             "decomposition (2.25x fewer MACs; measured decode +9.4%%, "
             "UNet step +1.5%%, PARITY.md round 5). Pure XLA, identical "
             "param tree; self-gates to 2D k=3 s=1. Default: on")
    ap.add_argument(
        "--s2d-tail", action=argparse.BooleanOptionalAction, default=None,
        help="run the final autoencoder decoder level in space-to-depth "
             "layout (one 2x2 conv with 4C channels per 3x3 conv — full MXU "
             "lanes where C=64 wastes half; exact math, identical params; "
             "measured 1.38x on the level's convs, PARITY.md round 5). "
             "Self-gates to 2D group-normed inference decodes. Default: on")


def resolve_kernel_flags(args, parser: argparse.ArgumentParser | None = None):
    """Resolve the auto defaults against the requested model and flip the
    global ops switches. Returns ``(flash, fused_geglu, fused_up)`` as
    resolved bools.

    Must run before any pipeline function is traced — the switches are read
    at trace time (``nn.attention.compute_attention``).
    """
    def _err(msg):
        if parser is not None:
            parser.error(msg)
        raise ValueError(msg)

    attention = getattr(args, "attention", "none") or "none"
    estimator = getattr(args, "estimator", "unet")
    if attention != "none" and estimator not in ATTENTION_CONFIGURABLE:
        _err(f"--attention {attention} only configures the "
             f"{'/'.join(ATTENTION_CONFIGURABLE)} families; "
             f"--estimator {estimator} fixes its own attention")
    has_attention = attention != "none" or estimator == "dit"

    heads = getattr(args, "attention_heads", 8)
    if heads != 8:
        if estimator != "unet":
            _err(f"--attention-heads is a unet-family option; "
                 f"--estimator {estimator} pins its own head geometry")
        if attention == "none":
            _err("--attention-heads has no effect without attention layers; "
                 "add --attention spatial|linear")

    flash = getattr(args, "flash", None)
    flash = has_attention if flash is None else bool(flash)
    if flash and not has_attention:
        _err("--flash has no effect without attention layers; add "
             "--attention spatial|linear (or --estimator dit)")

    fused = getattr(args, "fused_geglu", None)
    fused = (attention == "spatial") if fused is None else bool(fused)
    if fused and attention != "spatial":
        # the GEGLU MLP lives only in the SpatialTransformer blocks
        _err("--fused-geglu has no effect without --attention spatial "
             "(DiT's MLP is GELU, not GEGLU)")

    # fused 2x-upsample+conv is model-agnostic (exact linear map, identical
    # param tree, self-gates to 2D k=3 s=1 integer-2x pairs) and measured
    # faster on both the VAE decoder and the UNet step — default ON.
    fused_up = getattr(args, "fused_up", None)
    fused_up = True if fused_up is None else bool(fused_up)

    # s2d decode tail: exact, self-gating (2D group-normed inference
    # decodes only), measured 1.38x on the final-level convs — default ON.
    s2d_tail = getattr(args, "s2d_tail", None)
    s2d_tail = True if s2d_tail is None else bool(s2d_tail)

    import medfusion_tpu.ops as ops

    ops.enable_flash_attention(flash)
    ops.enable_fused_geglu(fused)
    ops.enable_fused_up_conv(fused_up)
    ops.enable_s2d_decode_tail(s2d_tail)
    return flash, fused, fused_up, s2d_tail
