"""bf16 programs must STAY bf16 end-to-end through every estimator family.

Round-4 measured bug: the f32 sinusoidal time embedding re-promoted every
activation downstream of its injection, so the "bf16" sampling program
traced as f32 — XLA's bf16 propagation silently demoted the convs again on
TPU, but the Pallas attention custom-calls are opaque to that pass and ran
f32 dots with f32 block caps. These tests pin the fix (each estimator casts
the embedding to the activation dtype at injection).
"""

import jax
import jax.numpy as jnp
import pytest

from medfusion_tpu.models.dit import DiT
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.models.unet_legacy import UNetLegacy
from medfusion_tpu.models.unet_lucidrains import UNetLucidrains
from medfusion_tpu.models.unet_openai import UNetOpenAI
from medfusion_tpu.models.unet_diffusers import UNet2DConditionDiffusers


def _bf16(tree):
    return jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), tree)


def _out_dtype(model, *args, rngs=None):
    params = model.init(rngs or jax.random.PRNGKey(0), *args)["params"]
    x, t, c = args[:3]
    out = jax.eval_shape(
        lambda p, x, t, c: model.apply({"params": p}, x, t, c),
        _bf16(params), x.astype(jnp.bfloat16), t, c)
    y = out[0] if isinstance(out, (tuple, list)) else out
    return y.dtype


X = jnp.zeros((2, 16, 16, 4), jnp.float32)
T = jnp.zeros((2,), jnp.int32)
C = jnp.zeros((2,), jnp.int32)


def test_unet_bf16_stays_bf16():
    m = UNet(in_ch=4, out_ch=4, hid_chs=(8, 8, 16), kernel_sizes=(3, 3, 3),
             strides=(1, 2, 2), time_emb_dim=16, cond_emb_num_classes=2,
             deep_supervision=0, use_attention="spatial",
             norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    assert _out_dtype(m, X, T, C) == jnp.bfloat16


def test_unet_attention_input_is_bf16(monkeypatch):
    """The dtype that actually reaches the attention kernels (the round-4
    regression was exactly here: f32 q/k/v into the Pallas custom call)."""
    import medfusion_tpu.nn.attention as A

    seen = []
    orig = A.compute_attention

    def spy(q, k, v, num_heads, scale):
        seen.append(q.dtype)
        return orig(q, k, v, num_heads, scale)

    monkeypatch.setattr(A, "compute_attention", spy)
    m = UNet(in_ch=4, out_ch=4, hid_chs=(8, 8, 16), kernel_sizes=(3, 3, 3),
             strides=(1, 2, 2), time_emb_dim=16, cond_emb_num_classes=2,
             deep_supervision=0, use_attention="spatial",
             norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    params = m.init(jax.random.PRNGKey(0), X, T, C)["params"]
    seen.clear()
    jax.eval_shape(lambda p, x, t, c: m.apply({"params": p}, x, t, c),
                   _bf16(params), X.astype(jnp.bfloat16), T, C)
    assert seen and all(d == jnp.bfloat16 for d in seen)


def test_unet_legacy_bf16_stays_bf16():
    m = UNetLegacy(in_ch=4, out_ch=4, hid_chs=(8, 16), kernel_sizes=(3, 3),
                   strides=(1, 2), time_emb_dim=16, cond_emb_num_classes=2,
                   deep_supervision=0,
                   norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    assert _out_dtype(m, X, T, C) == jnp.bfloat16


def test_unet_openai_bf16_stays_bf16():
    m = UNetOpenAI(in_channels=4, model_channels=8, out_channels=4,
                   num_res_blocks=1, attention_resolutions=(2,),
                   channel_mult=(1, 2), num_heads=2, num_classes=2,
                   norm_groups=4)
    assert _out_dtype(m, X, T, C) == jnp.bfloat16


def test_unet_lucidrains_bf16_stays_bf16():
    m = UNetLucidrains(dim=8, init_dim=8, out_dim=4, dim_mults=(1, 2),
                       channels=4)
    assert _out_dtype(m, X, T, None) == jnp.bfloat16


def test_unet_diffusers_bf16_stays_bf16():
    m = UNet2DConditionDiffusers(
        in_channels=4, out_channels=4, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=4, cross_attention_dim=8,
        num_classes=2, norm_num_groups=4)
    assert _out_dtype(m, X, T, C) == jnp.bfloat16


def test_dit_bf16_stays_bf16():
    m = DiT(in_ch=4, patch_size=4, hidden_size=16, depth=1, num_heads=2,
            cond_emb_num_classes=2)
    assert _out_dtype(m, X, T, C) == jnp.bfloat16


def _conv_dtypes(closed_jaxpr):
    """Dtypes of every conv_general_dilated input, walking nested jaxprs."""
    out = []

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                out.extend(v.aval.dtype for v in eqn.invars)
            for p in eqn.params.values():
                inner = getattr(p, "jaxpr", None)
                if inner is not None:
                    walk(inner)

    walk(closed_jaxpr.jaxpr)
    return out


def _tiny_pipe(compute_dtype):
    from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
    from medfusion_tpu.models.latent_embedders import VAE
    from medfusion_tpu.pipelines.diffusion import DiffusionPipeline

    vae = VAE(in_channels=3, out_channels=3, emb_channels=4, hid_chs=(32, 64),
              kernel_sizes=(3, 3), strides=(1, 2), deep_supervision=0)
    unet = UNet(in_ch=4, out_ch=4, hid_chs=(32, 64), kernel_sizes=(3, 3),
                strides=(1, 2), time_emb_dim=32, cond_emb_num_classes=2,
                deep_supervision=0, use_attention="none")
    k = jax.random.PRNGKey(0)
    params = {
        "noise_estimator": unet.init(
            k, jnp.zeros((1, 8, 8, 4)), T[:1], C[:1])["params"],
        "latent_embedder": vae.init(
            {"params": k, "sample": k}, jnp.zeros((1, 16, 16, 3)))["params"],
    }  # f32 MASTER params — the product-CLI regime
    pipe = DiffusionPipeline(
        scheduler=GaussianDiffusionSchedule.create(),
        noise_estimator=unet, latent_embedder=vae,
        compute_dtype=compute_dtype)
    return pipe, params


def test_decode_latent_bf16_convs_with_f32_masters():
    """Round-5 measured bug: flax promotes bf16-activation x f32-param convs
    back to f32, so decode_latent under compute_dtype=bf16 ran the f32
    decode (31.3 vs 23.0 ms at B=32) for every caller holding f32 master
    params — all product CLIs. decode_latent must cast the latent-embedder
    params too (as encode_latent already did)."""
    pipe, params = _tiny_pipe(jnp.bfloat16)
    z = jnp.zeros((2, 8, 8, 4), jnp.float32)
    jaxpr = jax.make_jaxpr(pipe.decode_latent)(params, z)
    dts = _conv_dtypes(jaxpr)
    assert dts and all(d == jnp.bfloat16 for d in dts), dts
    # output contract unchanged: f32 out
    out = jax.eval_shape(pipe.decode_latent, params, z)
    assert out.dtype == jnp.float32


def test_encode_latent_bf16_convs_with_f32_masters():
    pipe, params = _tiny_pipe(jnp.bfloat16)
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda p, xx: pipe.encode_latent(p, xx, jax.random.PRNGKey(0)))(params, x)
    dts = _conv_dtypes(jaxpr)
    assert dts and all(d == jnp.bfloat16 for d in dts), dts


def test_decode_latent_f32_pipe_stays_f32():
    pipe, params = _tiny_pipe(None)
    z = jnp.zeros((2, 8, 8, 4), jnp.float32)
    dts = _conv_dtypes(jax.make_jaxpr(pipe.decode_latent)(params, z))
    assert dts and all(d == jnp.float32 for d in dts), dts


def test_f32_program_unchanged():
    """No compute_dtype: everything stays f32 (the parity-test regime)."""
    m = UNet(in_ch=4, out_ch=4, hid_chs=(8, 8, 16), kernel_sizes=(3, 3, 3),
             strides=(1, 2, 2), time_emb_dim=16, cond_emb_num_classes=2,
             deep_supervision=0, use_attention="spatial",
             norm_name=("GROUP", {"num_groups": 4, "affine": True}))
    params = m.init(jax.random.PRNGKey(0), X, T, C)["params"]
    out = jax.eval_shape(lambda p: m.apply({"params": p}, X, T, C), params)
    assert out[0].dtype == jnp.float32
