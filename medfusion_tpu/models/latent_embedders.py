"""Latent embedders: VAE / VQVAE autoencoders + discriminators + quantizers.

Capability parity with
``/root/reference/medical_diffusion/models/embedders/latent_embedders.py``,
redesigned for JAX/Flax (channels-last, functional RNG):

* ``diagonal_gaussian``   — reparameterized posterior sample + KL
  (latent_embedders.py:20-33). Functional: callers pass the PRNG key.
* ``VectorQuantizer``     — nearest-codebook lookup via the MXU-friendly
  ||z||^2 + ||e||^2 - 2 z.e distance matmul, straight-through estimator,
  beta-commitment loss (latent_embedders.py:40-72).
* ``Discriminator``       — BasicBlock conv stack with zero-init 3x3 head
  (latent_embedders.py:76-131).
* ``NLayerDiscriminator`` — PatchGAN alternative (latent_embedders.py:134-186).
* ``VAE``                 — symmetric encoder/decoder over DownBlock/UpBlock,
  2x emb_channels out-encoder for (mu, logvar), deep-supervision heads
  (latent_embedders.py:620-855).
* ``VQVAE``               — same skeleton with a VectorQuantizer bottleneck
  (latent_embedders.py:191-404).

The reference's GAN wrappers (VAEGAN/VQGAN, latent_embedders.py:408-618,
860-1065) are Lightning modules whose substance is *training logic* (two
optimizers, adaptive lambda); in this framework that logic lives in
:mod:`medfusion_tpu.train.adversarial` as pure loss/step functions over
(autoencoder, discriminators) params — the model classes here stay pure
function approximators.

Training losses (pixel + LPIPS + (1-SSIM) + KL/commitment) live in
:mod:`medfusion_tpu.losses`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from medfusion_tpu.nn.blocks import (
    ActName,
    BasicBlock,
    DownBlock,
    NormName,
    UnetBasicBlock,
    UnetResBlock,
    UpBlock,
)


def diagonal_gaussian(
    x: jnp.ndarray, rng: Optional[jax.Array], sample: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split channels into (mean, logvar), reparameterize, return (z, kl).

    Parity: latent_embedders.py:20-33 — logvar clamped to [-30, 20]; KL is
    summed over ALL dims then divided by batch (scalar).
    """
    mean, logvar = jnp.split(x, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    if sample:
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    else:
        z = mean
    var = jnp.exp(logvar)
    kl = 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar) / x.shape[0]
    return z, kl


class VectorQuantizer(nn.Module):
    """Nearest-neighbour codebook with straight-through gradients
    (latent_embedders.py:40-72).

    Distances are computed as one [N, num_embeddings] matmul — MXU-shaped —
    instead of gather loops. Codebook init: U(-1/K, 1/K).
    """

    num_embeddings: int
    emb_channels: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.num_embeddings
        codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0 / k, 1.0 / k),
            (k, self.emb_channels),
        )
        flat = z.reshape(-1, self.emb_channels)
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)
            - 2.0 * jnp.dot(flat, codebook.T, preferred_element_type=jnp.float32)
        )
        idx = jnp.argmin(dist, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, loss


class Discriminator(nn.Module):
    """Conv-stack discriminator with zero-init output head
    (latent_embedders.py:76-131). Defaults here are the 2D flavor; the
    reference default kernel/stride tuples are its 3D flavor."""

    spatial_dims: int = 2
    hid_chs: Sequence[int] = (32, 64, 128, 256, 512)
    kernel_sizes: Sequence = (3, 3, 3, 3, 3)
    strides: Sequence = (1, 2, 2, 2, 2)
    act_name: ActName = ("SWISH", {})
    norm_name: NormName = ("GROUP", {"num_groups": 32, "affine": True})
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(
            self.spatial_dims, self.hid_chs[0], self.kernel_sizes[0], self.strides[0],
            self.norm_name, self.act_name, self.dropout, name="inc",
        )(x, train=train)
        for i in range(1, len(self.hid_chs)):
            x = BasicBlock(
                self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i], self.strides[i],
                self.norm_name, self.act_name, self.dropout, name=f"encoder_{i - 1}",
            )(x, train=train)
        return BasicBlock(
            self.spatial_dims, 1, 3, 1, None, None, None, zero_conv=True, name="outc"
        )(x, train=train)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (pix2pix flavor, latent_embedders.py:134-186)."""

    spatial_dims: int = 2
    hid_chs: Sequence[int] = (64, 128, 256, 512, 512)
    kernel_sizes: Sequence = (4, 4, 4, 4, 4)
    strides: Sequence = (2, 2, 2, 1, 1)
    act_name: ActName = ("LEAKYRELU", {"negative_slope": 0.2})
    norm_name: NormName = ("BATCH", {})
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(
            self.spatial_dims, self.hid_chs[0], self.kernel_sizes[0], self.strides[0],
            None, self.act_name, self.dropout, name="inc",
        )(x, train=train)
        for i in range(1, len(self.strides)):
            x = BasicBlock(
                self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i], self.strides[i],
                self.norm_name, self.act_name, self.dropout, name=f"encoder_{i - 1}",
            )(x, train=train)
        return BasicBlock(
            self.spatial_dims, 1, 4, 1, None, None, None, name="outc"
        )(x, train=train)


class _AutoencoderBase(nn.Module):
    """Shared encoder/decoder skeleton for VAE and VQVAE."""

    in_channels: int = 3
    out_channels: int = 3
    spatial_dims: int = 2
    emb_channels: int = 4
    hid_chs: Sequence[int] = (64, 128, 256, 512)
    kernel_sizes: Sequence = (3, 3, 3, 3)
    strides: Sequence = (1, 2, 2, 2)
    norm_name: NormName = ("GROUP", {"num_groups": 8, "affine": True})
    act_name: ActName = ("SWISH", {})
    dropout: Optional[float] = None
    use_res_block: bool = True
    deep_supervision: Union[bool, int] = False
    learnable_interpolation: bool = True
    use_attention: Union[str, Sequence[str]] = "none"

    @property
    def depth(self) -> int:
        return len(self.strides)

    def _attn(self):
        ua = self.use_attention
        return list(ua) if isinstance(ua, (list, tuple)) else [ua] * self.depth

    def _num_ds(self) -> int:
        ds = self.deep_supervision
        if isinstance(ds, bool):
            return self.depth - 1 if ds else 0
        return int(ds)

    def _setup_backbone(self):
        ConvBlock = UnetResBlock if self.use_res_block else UnetBasicBlock
        attn = self._attn()
        self.inc = ConvBlock(
            self.spatial_dims, self.hid_chs[0], self.kernel_sizes[0], self.strides[0],
            self.norm_name, self.act_name,
        )
        self.encoders = [
            DownBlock(
                self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i], self.strides[i],
                self.kernel_sizes[i], self.norm_name, self.act_name, self.dropout,
                self.use_res_block, self.learnable_interpolation, attn[i], None,
            )
            for i in range(1, self.depth)
        ]
        self.inc_dec = ConvBlock(
            self.spatial_dims, self.hid_chs[-1], 3, 1, self.norm_name, self.act_name
        )
        self.decoders = [
            UpBlock(
                self.spatial_dims, self.hid_chs[i], self.kernel_sizes[i + 1],
                self.strides[i + 1], self.strides[i + 1], self.norm_name, self.act_name,
                self.dropout, self.use_res_block, self.learnable_interpolation, attn[i],
                None, 0,
            )
            for i in range(self.depth - 1)
        ]
        self.outc = BasicBlock(self.spatial_dims, self.out_channels, 1, zero_conv=True)
        self.outc_ver = [
            BasicBlock(self.spatial_dims, self.out_channels, 1, zero_conv=True)
            for _ in range(1, self._num_ds() + 1)
        ]

    def _encode_backbone(self, x, train: bool):
        h = self.inc(x, train=train)
        for enc in self.encoders:
            h = enc(h, train=train)
        return h

    def _use_s2d_tail(self, train: bool, with_vertical: bool,
                      with_hiddens: bool) -> bool:
        """The s2d decode tail (ops.enable_s2d_decode_tail) applies when the
        final decoder level is a plain learnable 2x up + 3x3 GROUP-normed
        conv block with no attention/dropout, on an inference-shaped decode
        (no deep-supervision heads, no GAN hiddens — those consume the
        full-res pre-head activation)."""
        from medfusion_tpu import ops
        from medfusion_tpu.nn.blocks import _parse
        from medfusion_tpu.nn.functional import ensure_tuple

        if not ops.s2d_decode_tail_enabled():
            return False
        if self.spatial_dims != 2 or with_vertical or with_hiddens:
            return False
        if not self.decoders or self.dropout is not None:
            return False
        if not self.learnable_interpolation or self._attn()[0] != "none":
            return False
        if ensure_tuple(self.strides[1], 2) != (2, 2):
            return False
        if ensure_tuple(self.kernel_sizes[1], 2) != (3, 3):
            return False
        kind, _ = _parse(self.norm_name)
        return kind in (None, "group")

    def _decode_backbone(self, z_q, train: bool, with_vertical: bool, with_hiddens: bool = False):
        """Decoder pass. With ``with_hiddens`` also returns the pre-head
        activations (input of ``outc`` / each ``outc_ver``) — needed by the
        adversarial trainer's adaptive-lambda (reference ``compute_lambda``
        differentiates w.r.t. the out-layer weight, latent_embedders.py:1059-1065)."""
        from medfusion_tpu.nn import functional as F

        s2d = self._use_s2d_tail(train, with_vertical, with_hiddens)
        out_hor, h_vers = [], []
        h = self.inc_dec(z_q, train=train)
        for i in range(len(self.decoders) - 1, -1, -1):
            if with_vertical and i < len(self.outc_ver):
                out_hor.append(self.outc_ver[i](h, train=train))
                h_vers.append(h)
            h = self.decoders[i](h, None, train=train,
                                 s2d_tail=(s2d and i == 0))
        out = self.outc(h, train=train, s2d=s2d)
        if s2d:
            out = F.depth_to_space2(out)
        if with_hiddens:
            return out, out_hor[::-1], h, h_vers[::-1]
        return out, out_hor[::-1]


class VAE(_AutoencoderBase):
    """KL autoencoder (latent_embedders.py:620-855).

    ``__call__`` returns ``(pred, pred_vertical, emb_loss)`` where emb_loss is
    the KL term. Sampling RNG comes from the flax RNG stream ``"sample"``;
    pass ``sample=False`` for the deterministic (mean) path.
    """

    def setup(self):
        self._setup_backbone()
        # Out-encoder: 3x3 then 1x1, both plain convs (latent_embedders.py:708-711).
        self.out_enc_0 = BasicBlock(self.spatial_dims, 2 * self.emb_channels, 3)
        self.out_enc_1 = BasicBlock(self.spatial_dims, 2 * self.emb_channels, 1)

    def _moments(self, x, train: bool):
        h = self._encode_backbone(x, train)
        return self.out_enc_1(self.out_enc_0(h, train=train), train=train)

    def encode(self, x, train: bool = False, sample: bool = True):
        z = self._moments(x, train)
        rng = self.make_rng("sample") if sample else None
        z, _ = diagonal_gaussian(z, rng, sample=sample)
        return z

    def decode(self, z, train: bool = False):
        out, _ = self._decode_backbone(z, train, with_vertical=False)
        return out

    def __call__(self, x, train: bool = False, sample: bool = True):
        z = self._moments(x, train)
        rng = self.make_rng("sample") if sample else None
        z_q, emb_loss = diagonal_gaussian(z, rng, sample=sample)
        pred, pred_ver = self._decode_backbone(z_q, train, with_vertical=True)
        return pred, pred_ver, emb_loss

    def forward_with_hiddens(self, x, train: bool = False, sample: bool = True):
        """(pred, pred_vertical, emb_loss, h_top, h_vers) — hiddens feed the
        adversarial trainer's adaptive lambda."""
        z = self._moments(x, train)
        rng = self.make_rng("sample") if sample else None
        z_q, emb_loss = diagonal_gaussian(z, rng, sample=sample)
        pred, pred_ver, h_top, h_vers = self._decode_backbone(
            z_q, train, with_vertical=True, with_hiddens=True
        )
        return pred, pred_ver, emb_loss, h_top, h_vers


class VQVAE(_AutoencoderBase):
    """VQ autoencoder (latent_embedders.py:191-404).

    Reference defaults differ from VAE: hid_chs (32,64,128,256), GroupNorm 32.
    ``encode`` returns the *pre-quantization* latent (parity:
    latent_embedders.py:310-316); ``decode`` quantizes first (:318-324).
    """

    hid_chs: Sequence[int] = (32, 64, 128, 256)
    norm_name: NormName = ("GROUP", {"num_groups": 32, "affine": True})
    num_embeddings: int = 8192
    beta: float = 0.25

    def setup(self):
        self._setup_backbone()
        self.out_enc = BasicBlock(self.spatial_dims, self.emb_channels, 1)
        self.quantizer = VectorQuantizer(
            num_embeddings=self.num_embeddings,
            emb_channels=self.emb_channels,
            beta=self.beta,
        )

    def encode(self, x, train: bool = False):
        return self.out_enc(self._encode_backbone(x, train), train=train)

    def decode(self, z, train: bool = False):
        z_q, _ = self.quantizer(z)
        out, _ = self._decode_backbone(z_q, train, with_vertical=False)
        return out

    def __call__(self, x, train: bool = False):
        z = self.encode(x, train=train)
        z_q, emb_loss = self.quantizer(z)
        pred, pred_ver = self._decode_backbone(z_q, train, with_vertical=True)
        return pred, pred_ver, emb_loss

    def forward_with_hiddens(self, x, train: bool = False):
        z = self.encode(x, train=train)
        z_q, emb_loss = self.quantizer(z)
        pred, pred_ver, h_top, h_vers = self._decode_backbone(
            z_q, train, with_vertical=True, with_hiddens=True
        )
        return pred, pred_ver, emb_loss, h_top, h_vers
