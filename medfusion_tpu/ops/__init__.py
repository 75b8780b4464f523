"""Pallas TPU kernels and global kernel switches.

Kernels are numerically-equivalent accelerators for the pure-XLA paths; each is
opt-in via a module-level switch so correctness tests can compare both paths.
"""

from __future__ import annotations

_FLASH_ATTENTION = False
_FUSED_GROUP_NORM = False


def enable_flash_attention(on: bool = True) -> None:
    global _FLASH_ATTENTION
    _FLASH_ATTENTION = on


def flash_attention_enabled() -> bool:
    return _FLASH_ATTENTION


def enable_fused_group_norm(on: bool = True) -> None:
    global _FUSED_GROUP_NORM
    _FUSED_GROUP_NORM = on


def fused_group_norm_enabled() -> bool:
    return _FUSED_GROUP_NORM


def flash_attention(q, k, v, scale):
    """[B, H, N, D] flash attention (compiled Mosaic on TPU, interpret mode
    on CPU — see :mod:`medfusion_tpu.ops.flash_attention`).

    Shape-aware: below ``MIN_KV_TOKENS`` XLA's fused softmax measures faster
    on-chip than the kernel (PARITY.md "attention-enabled program"), so short
    sequences take the naive path. Call the kernel module directly to force
    the flash recurrence regardless of length (the tests do)."""
    if k.shape[2] < _MIN_KV_TOKENS:
        return _NAIVE(q, k, v, scale)
    return _FA_IMPL(q, k, v, scale)


def flash_attention_tokens(q, k, v, num_heads, scale):
    """Token-layout flash attention: q/k/v [B, N, H*D] (the layout the
    transformer blocks hold) — the Mosaic kernel computes every head in one
    program instance, so no b n (h d) <-> b h n d transposes touch HBM.

    Shape-aware layout dispatch (all three measured on-chip — PARITY.md
    round-4 layout A/B): short KV (< ``MIN_KV_TOKENS``) takes the naive XLA
    path; mid-size levels (256-1023 tokens) take the token-layout kernel;
    long levels (>= ``HEAD_LAYOUT_MIN_TOKENS``) pay the head transposes and
    run the per-head kernel, whose full 1024 blocks beat the token kernel's
    VMEM-capped 512 blocks. Thresholds were measured in bf16 (the production
    dtype); f32 inputs use 256-capped blocks, so the crossovers may differ —
    the dispatch still applies them unconditionally."""
    b, n, hd = q.shape
    m = k.shape[1]
    if hd % num_heads:
        raise ValueError(
            f"feature dim {hd} is not divisible by num_heads={num_heads}")
    d = hd // num_heads

    def split_heads(x):
        bb, nn, _ = x.shape
        return x.reshape(bb, nn, num_heads, d).transpose(0, 2, 1, 3)

    def merge_heads(x):
        return x.transpose(0, 2, 1, 3).reshape(b, n, hd)

    if m < _MIN_KV_TOKENS:
        return merge_heads(
            _NAIVE(split_heads(q), split_heads(k), split_heads(v), scale))
    if m >= _HEAD_LAYOUT_MIN:
        return merge_heads(
            _FA_IMPL(split_heads(q), split_heads(k), split_heads(v), scale))
    return _FAT_IMPL(q, k, v, num_heads, scale)


_FLASH_WRAPPER = flash_attention
_FLASH_TOKENS_WRAPPER = flash_attention_tokens

# Import the kernel submodule ONCE, eagerly. The initial submodule load binds
# the module object over this package's same-named wrapper ("'module' object
# is not callable" for every caller of ops.flash_attention from then on);
# re-claim the name here — later `import medfusion_tpu.ops.flash_attention`
# statements hit sys.modules and do NOT re-bind the parent attribute.
from medfusion_tpu.ops.flash_attention import (  # noqa: E402
    HEAD_LAYOUT_MIN_TOKENS as _HEAD_LAYOUT_MIN,
    MIN_KV_TOKENS as _MIN_KV_TOKENS,
    flash_attention as _FA_IMPL,
    flash_attention_tokens as _FAT_IMPL,
    naive_attention as _NAIVE,
)

flash_attention = _FLASH_WRAPPER
flash_attention_tokens = _FLASH_TOKENS_WRAPPER


def fused_group_norm_silu(x, scale, bias, num_groups, eps=1e-5, apply_silu=True,
                          interpret=False):
    from medfusion_tpu.ops.group_norm import fused_group_norm_silu as _gn

    return _gn(x, scale, bias, num_groups, eps, apply_silu=apply_silu,
               interpret=interpret)


_FUSED_UP_CONV = False


def enable_fused_up_conv(on: bool = True) -> None:
    """Route every integer-2x nearest-upsample + 3x3-conv pair (BasicUp,
    i.e. the UNet decoder path AND the VAE decoder) through the 4-phase
    2x2-conv decomposition (``nn.functional.fused_up2x_conv``) — the same
    linear map at 16 MACs per output pixel instead of 36. Pure XLA, not
    Pallas; exact math up to one weight-add reassociation per tap pair."""
    global _FUSED_UP_CONV
    _FUSED_UP_CONV = on


def fused_up_conv_enabled() -> bool:
    return _FUSED_UP_CONV


_S2D_DECODE_TAIL = False


def enable_s2d_decode_tail(on: bool = True) -> None:
    """Run the FINAL autoencoder decoder level (the highest-resolution,
    lowest-channel one — 256^2 at C=64 on the flagship configs) in
    space-to-depth layout: each 3x3 conv becomes ONE 2x2 conv with 4C in/out
    channels (full MXU lanes — the stock C=64 conv measures 0.17 of v5e peak,
    the s2d form 2.6x that), GroupNorm reduces phase-aware (exact same
    element set), the 1x1 head applies per phase, and a single
    depth-to-space lands the full-res image at the very end. Exact math;
    applies to inference-shaped decodes (no deep-supervision heads / GAN
    hiddens). Pure XLA, not Pallas."""
    global _S2D_DECODE_TAIL
    _S2D_DECODE_TAIL = on


def s2d_decode_tail_enabled() -> bool:
    return _S2D_DECODE_TAIL


_FUSED_GEGLU = False


def enable_fused_geglu(on: bool = True) -> None:
    global _FUSED_GEGLU
    _FUSED_GEGLU = on


def fused_geglu_enabled() -> bool:
    return _FUSED_GEGLU


def fused_geglu_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, **kw):
    """Fused LayerNorm+GEGLU+down-projection transformer MLP (see
    :mod:`medfusion_tpu.ops.geglu`). Streams the 4x-expansion intermediates
    through VMEM instead of HBM — measured win on the spatial-attention
    program (PARITY.md round 4)."""
    from medfusion_tpu.ops.geglu import fused_geglu_mlp as _impl

    return _impl(x, ln_scale, ln_bias, w1, b1, w2, b2, **kw)
