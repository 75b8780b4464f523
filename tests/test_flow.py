"""Rectified-flow / flow-matching family (pipelines/flow.py) — BEYOND the
reference (DDPM/DDIM only, diffusion_pipeline.py:278-310): linear-path
conditional flow matching (arXiv:2210.02747, 2209.03003) in the SD3
convention (arXiv:2403.03206), on the same estimators/trainers/CLIs."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from medfusion_tpu.data import SyntheticDataset2D
from medfusion_tpu.models.latent_embedders import VAE
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.flow import FlowMatchingPipeline, shift_time
from medfusion_tpu.train import TrainState, make_flow_train_step

KEY = jax.random.PRNGKey(0)


def _tiny_unet(in_ch=1, classes=2):
    return UNet(in_ch=in_ch, out_ch=in_ch, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                cond_emb_num_classes=classes, deep_supervision=0, time_emb_dim=16)


def test_shift_time_identity_and_monotone():
    t = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(np.asarray(shift_time(t, 1.0)), np.asarray(t))
    s3 = np.asarray(shift_time(t, 3.0))
    assert np.all(np.diff(s3) > 0) and s3[0] == 0.0 and abs(s3[-1] - 1.0) < 1e-7
    # shift > 1 pushes interior points toward t=1 (more noise)
    assert np.all(s3[1:-1] > np.asarray(t)[1:-1])


class _LinearVelocity:
    """Stub estimator: v(x, t) = -x. The probability-flow ODE dx/dt = -x
    integrated from t=1 down to 0 has the exact solution x(0) = e * x(1)."""

    def apply(self, variables, x, t, condition, self_cond, cond_mask):
        return -x, []


def test_ode_integrator_against_analytic_solution():
    pipe = FlowMatchingPipeline(noise_estimator=_LinearVelocity(),
                                do_input_centering=False)
    x1 = jax.random.normal(KEY, (2, 4, 4, 1))
    params = {"noise_estimator": {}}
    exact = np.e * np.asarray(x1)
    out_heun = np.asarray(pipe.denoise(params, x1, steps=32, heun=True))
    out_euler = np.asarray(pipe.denoise(params, x1, steps=32, heun=False))
    err_heun = np.max(np.abs(out_heun - exact))
    err_euler = np.max(np.abs(out_euler - exact))
    assert err_heun < 2e-2, err_heun
    # 2nd order beats 1st order at the same grid
    assert err_heun < 0.2 * err_euler, (err_heun, err_euler)
    # t_start composes: integrating only from t=0.5 gives x(0) = e^0.5 x(0.5)
    out_half = np.asarray(pipe.denoise(params, x1, steps=32, t_start=0.5))
    np.testing.assert_allclose(out_half, np.exp(0.5) * np.asarray(x1), atol=2e-2)


def test_train_step_and_sampling_shapes():
    unet = _tiny_unet()
    x = jax.random.uniform(KEY, (4, 8, 8, 1), minval=-1, maxval=1)
    y = jnp.asarray([0, 1, 0, 1], jnp.int32)
    params = unet.init(KEY, x, jnp.zeros((4,), jnp.float32), y)["params"]
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False,
                                classifier_free_guidance_dropout=0.1)
    state = TrainState.create(params, optax.adam(1e-3))
    step = make_flow_train_step(pipe, donate=False)
    state, metrics = step(state, None, {"source": x, "target": y}, KEY)
    assert np.isfinite(float(metrics["loss"]))

    p = {"noise_estimator": state.params}
    # Euler / Heun / CFG / shift all produce finite, right-shaped output
    for kw in ({"heun": False}, {"heun": True},
               {"guidance_scale": 3.0}, {"shift": 3.0}):
        out = pipe.sample(p, jax.random.PRNGKey(1), 2, (8, 8, 1),
                          condition=y[:2], steps=4, **kw)
        assert out.shape == (2, 8, 8, 1)
        assert np.all(np.isfinite(np.asarray(out)))
    # the ODE is deterministic given the prior draw: rng only seeds x_T
    a = pipe.sample(p, jax.random.PRNGKey(7), 2, (8, 8, 1), condition=y[:2], steps=4)
    b = pipe.sample(p, jax.random.PRNGKey(7), 2, (8, 8, 1), condition=y[:2], steps=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timestep_sampling_distributions():
    unet = _tiny_unet()
    pipe_u = FlowMatchingPipeline(noise_estimator=unet,
                                  timestep_sampling="uniform")
    pipe_ln = FlowMatchingPipeline(noise_estimator=unet,
                                   timestep_sampling="logit_normal")
    t_u = np.asarray(pipe_u._sample_t(KEY, 4096))
    t_ln = np.asarray(pipe_ln._sample_t(KEY, 4096))
    assert 0.0 < t_u.min() and t_u.max() < 1.0
    assert abs(t_u.mean() - 0.5) < 0.02
    # logit-normal (m=0, s=1) concentrates mass mid-path vs uniform
    assert ((t_ln > 0.25) & (t_ln < 0.75)).mean() > ((t_u > 0.25) & (t_u < 0.75)).mean()
    with pytest.raises(ValueError):
        FlowMatchingPipeline(noise_estimator=unet, timestep_sampling="nope")
    with pytest.raises(ValueError):
        FlowMatchingPipeline(noise_estimator=unet, shift=0.5)


def test_img2img_strength_scales_deviation():
    unet = _tiny_unet()
    x = jax.random.uniform(KEY, (2, 8, 8, 1), minval=-1, maxval=1)
    params = {"noise_estimator": unet.init(
        KEY, x, jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.int32))["params"]}
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False)
    near = pipe.img2img(params, KEY, x, strength=0.05, steps=4)
    far = pipe.img2img(params, KEY, x, strength=0.95, steps=4)
    d_near = float(jnp.mean(jnp.abs(near - x)))
    d_far = float(jnp.mean(jnp.abs(far - x)))
    assert d_near < d_far
    assert d_near < 0.25  # 5% along the straight path stays near the input
    with pytest.raises(ValueError):
        pipe.img2img(params, KEY, x, strength=0.0)


def test_flow_with_latent_embedder_roundtrip():
    vae = VAE(in_channels=1, out_channels=1, emb_channels=2, hid_chs=(4, 8),
              strides=(1, 2), kernel_sizes=(3, 3), deep_supervision=0,
              norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    x = jax.random.uniform(KEY, (2, 8, 8, 1))
    vae_params = vae.init({"params": KEY, "sample": KEY}, x)["params"]
    unet = _tiny_unet(in_ch=2)
    z0 = jnp.zeros((2, 4, 4, 2))
    unet_params = unet.init(KEY, z0, jnp.zeros((2,), jnp.float32),
                            jnp.zeros((2,), jnp.int32))["params"]
    pipe = FlowMatchingPipeline(noise_estimator=unet, latent_embedder=vae,
                                do_input_centering=False, latent_scale=2.0)
    params = {"noise_estimator": unet_params, "latent_embedder": vae_params}
    loss, metrics = pipe.train_loss(
        params, {"source": x, "target": jnp.asarray([0, 1], jnp.int32)}, KEY)
    assert np.isfinite(float(loss))
    out = pipe.sample(params, KEY, 2, (4, 4, 2),
                      condition=jnp.asarray([0, 1], jnp.int32), steps=3)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_flow_learns():
    """The flow stack must actually learn (mirror of
    test_learning.py's diffusion assertion)."""
    ds = SyntheticDataset2D(n=32, image_size=16, channels=1, num_classes=2, seed=0)
    x = jnp.asarray(np.stack([ds[i]["source"] for i in range(32)]))
    y = jnp.asarray([ds[i]["target"] for i in range(32)], jnp.int32)
    unet = UNet(in_ch=1, out_ch=1, hid_chs=(16, 32), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 8, "affine": True}),
                cond_emb_num_classes=2, deep_supervision=0, time_emb_dim=32)
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False,
                                classifier_free_guidance_dropout=0.0,
                                timestep_sampling="uniform")
    params = unet.init(KEY, x[:4], jnp.zeros((4,), jnp.float32), y[:4])["params"]
    state = TrainState.create(params, optax.adamw(2e-3))
    step = make_flow_train_step(pipe, donate=False)
    losses = []
    for i in range(200):
        idx = np.random.default_rng(i).choice(32, 8, replace=False)
        state, metrics = step(state, None, {"source": x[idx], "target": y[idx]},
                              jax.random.fold_in(KEY, i))
        losses.append(float(metrics["loss"]))
    early, late = np.mean(losses[:10]), np.mean(losses[-10:])
    assert late < 0.75 * early, f"no learning: {early:.3f} -> {late:.3f}"

    # a trained velocity field moves img2img output toward the data manifold:
    # denoising a mid-path point must land closer to the clean image than
    # the noised input is
    p = {"noise_estimator": state.params}
    clean = x[:4]
    eps = jax.random.normal(jax.random.PRNGKey(5), clean.shape)
    t_mid = 0.4
    noised = (1 - t_mid) * clean + t_mid * eps
    recon = pipe.denoise(p, noised, condition=y[:4], steps=8, t_start=t_mid)
    err_recon = float(jnp.mean((recon - clean) ** 2))
    err_noised = float(jnp.mean((noised - clean) ** 2))
    assert err_recon < err_noised, (err_recon, err_noised)


def test_flow_cli_train_and_sample(tmp_path):
    """--family flow through the real CLIs: train 2 steps (pixel-space smoke
    preset still carries a VAE — the flow family rides the same frozen
    latent embedder), checkpoint, sample with the ODE sampler."""
    from medfusion_tpu.cli import sample as sample_cli
    from medfusion_tpu.cli import train_diffusion
    from medfusion_tpu.utils import checkpoint as C

    out = tmp_path / "flow"
    train_diffusion.main([
        "--preset", "smoke", "--family", "flow", "--flow-shift", "1.5",
        "--max-steps", "2", "--ckpt-every", "2", "--sample-every", "2",
        "--out", str(out),
    ])
    assert C.latest_step(out / "checkpoints") == 2
    assert list((out / "images").glob("*.png"))

    sample_dir = tmp_path / "samples"
    sample_cli.main([
        "--preset", "smoke", "--family", "flow", "--flow-shift", "1.5",
        "--ckpt", str(out / "checkpoints"), "--n", "2", "--steps", "4",
        "--guidance", "2.0", "--out", str(sample_dir),
    ])
    assert (sample_dir / "sample_cond_0.png").exists()


def test_flow_serving_microbatcher():
    """The serving micro-batcher serves flow checkpoints: family='flow'
    batch fn produces finite fixed-shape rows, deterministic per (seed,
    cond) slot regardless of batch composition."""
    from medfusion_tpu.demo.serving import MicroBatcher, make_sample_batch_fn

    pipe = FlowMatchingPipeline(noise_estimator=_LinearVelocity(),
                                do_input_centering=False)
    fn = make_sample_batch_fn(pipe, {"noise_estimator": {}}, (4, 4, 1),
                              steps=4, conditional=False, family="flow")
    mb = MicroBatcher(fn, batch_size=2, max_wait_s=0.2)
    try:
        futs = [mb.submit(seed=s, cond=0) for s in range(4)]
        got = [np.asarray(f.result(timeout=120)) for f in futs]
    finally:
        mb.close()
    assert all(g.shape == (4, 4, 1) and np.all(np.isfinite(g)) for g in got)
    # per-slot determinism: same seed alone reproduces the batched row
    solo = np.asarray(fn(jnp.asarray([2, 2]), jnp.asarray([0, 0])))[0]
    np.testing.assert_allclose(got[2], solo, rtol=1e-5, atol=1e-6)


def test_flow_cli_rejects_schedule_flags(tmp_path):
    from medfusion_tpu.cli import sample as sample_cli
    from medfusion_tpu.cli import train_diffusion

    with pytest.raises(SystemExit):
        train_diffusion.main([
            "--preset", "smoke", "--family", "flow", "--zero-terminal-snr",
            "--max-steps", "1", "--out", str(tmp_path / "x"),
        ])
    with pytest.raises(SystemExit):
        train_diffusion.main([
            "--preset", "smoke", "--family", "flow", "--objective", "v",
            "--max-steps", "1", "--out", str(tmp_path / "x"),
        ])
    # sample CLI rejects (not silently ignores) diffusion-schedule flags
    for bad in (["--zero-terminal-snr"], ["--guidance-rescale", "0.7"],
                ["--timestep-spacing", "trailing"], ["--objective", "v"]):
        with pytest.raises(SystemExit):
            sample_cli.main(["--preset", "smoke", "--family", "flow",
                             "--n", "1", "--steps", "2",
                             "--out", str(tmp_path / "y")] + bad)


@pytest.mark.parametrize("estimator", ["dit", "openai"])
def test_flow_rides_other_estimator_families(estimator):
    """The flow family reuses the shared estimator contract (float t like
    the EDM sampler's fractional queries), so non-UNet families train and
    sample as flow models with zero changes."""
    from medfusion_tpu.cli.presets import PRESETS, build_unet

    p = PRESETS["smoke"]
    est = build_unet(p, estimator)
    h, w, c = p.latent_shape
    z = jax.random.normal(KEY, (2, h, w, c))
    y = jnp.asarray([0, 1], jnp.int32)
    params = est.init(KEY, z, jnp.zeros((2,), jnp.float32), y)["params"]
    pipe = FlowMatchingPipeline(noise_estimator=est, do_input_centering=False,
                                classifier_free_guidance_dropout=0.0)
    state = TrainState.create(params, optax.adam(1e-3))
    step = make_flow_train_step(pipe, donate=False)
    state, metrics = step(state, None, {"source": z, "target": y}, KEY)
    assert np.isfinite(float(metrics["loss"]))
    out = pipe.sample({"noise_estimator": state.params}, jax.random.PRNGKey(1),
                      2, (h, w, c), condition=y, steps=3, guidance_scale=2.0)
    assert out.shape == (2, h, w, c)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flow_3d_volumetric():
    """The flow family is dimension-agnostic through the estimator contract:
    3D UNet + the same ODE sampler over a volumetric latent (mirror of
    test_3d.py's diffusion assertion)."""
    unet = UNet(in_ch=2, out_ch=2, spatial_dims=3, hid_chs=(4, 8),
                kernel_sizes=(3, 3), strides=(1, 2), time_emb_dim=16,
                cond_emb_num_classes=2, deep_supervision=0, use_attention="none",
                norm_name=("GROUP", {"num_groups": 2, "affine": True}))
    z = jax.random.normal(KEY, (2, 4, 4, 4, 2))
    c = jnp.asarray([0, 1], jnp.int32)
    params = unet.init(KEY, z, jnp.zeros((2,), jnp.float32), c)["params"]
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False)
    loss, _ = pipe.train_loss({"noise_estimator": params},
                              {"source": z, "target": c}, KEY)
    assert np.isfinite(float(loss))
    out = pipe.sample({"noise_estimator": params}, jax.random.PRNGKey(4), 2,
                      (4, 4, 4, 2), condition=c, steps=3, guidance_scale=4.0)
    assert out.shape == (2, 4, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flow_sharded_bulk_sampler(tmp_path):
    """make_sharded_sampler(sampler='flow'): one batch-sharded ODE program
    over the mesh, deterministic given the prior draw, and the
    sample_dataset --family flow CLI fan-out on top of it."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from medfusion_tpu.parallel import make_mesh
    from medfusion_tpu.parallel.sampling import make_sharded_sampler

    unet = _tiny_unet()
    x = jax.random.uniform(KEY, (8, 8, 8, 1), minval=-1, maxval=1)
    params = {"noise_estimator": unet.init(
        KEY, x, jnp.zeros((8,), jnp.float32), jnp.zeros((8,), jnp.int32))["params"]}
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False)
    mesh = make_mesh(n_data=8, n_model=1)
    sampler = make_sharded_sampler(pipe, mesh, (8, 8, 1), steps=3,
                                   sampler="flow", flow_shift=1.5,
                                   guidance_scale=2.0)
    cond = jnp.arange(8, dtype=jnp.int32) % 2
    out = sampler(params, jax.random.PRNGKey(1), 8, cond, 1 - cond)
    assert out.shape == (8, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    # sharded program == the single-chip pipeline path (same rng protocol)
    k_init, _ = jax.random.split(jax.random.PRNGKey(1))
    x_T = jax.random.normal(k_init, (8, 8, 8, 1))
    ref = pipe.denoise(params, x_T, None, condition=cond, steps=3,
                       guidance_scale=2.0, un_cond=1 - cond, shift=1.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="flow-family"):
        make_sharded_sampler(pipe, mesh, (8, 8, 1), sampler="flow",
                             encoder_key_every=3)


def test_sample_dataset_cli_flow(tmp_path):
    from medfusion_tpu.cli import sample_dataset

    out = tmp_path / "fake_flow"
    sample_dataset.main([
        "--preset", "smoke", "--family", "flow", "--flow-shift", "1.5",
        "--n-samples", "8", "--chunk", "8", "--steps-list", "3",
        "--out", str(out)])
    for label in (0, 1):
        files = list((out / "steps_3" / f"label_{label}").glob("fake_*.png"))
        assert len(files) == 8, (label, files)


def test_flow_data_parallel_step_matches_single_device():
    """The flow family rides the same GSPMD path: dp-sharded train step ==
    single-device (mirror of test_parallel.py's diffusion assertion)."""
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    from medfusion_tpu.parallel import make_mesh, shard_batch, shard_params

    unet = UNet(in_ch=1, out_ch=1, hid_chs=(8, 16), kernel_sizes=(3, 3),
                strides=(1, 2), norm_name=("GROUP", {"num_groups": 4, "affine": True}),
                deep_supervision=0, use_attention="none")
    pipe = FlowMatchingPipeline(noise_estimator=unet, do_input_centering=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32))
    params = unet.init(KEY, x, jnp.zeros((8,), jnp.float32))["params"]
    step = make_flow_train_step(pipe, donate=False)
    rng = jax.random.PRNGKey(1)

    state_single = TrainState.create(params, optax.adamw(1e-3))
    state_single, m_single = step(state_single, None, {"source": x}, rng)

    mesh = make_mesh(n_data=8, n_model=1)
    state_dp = TrainState.create(shard_params(params, mesh), optax.adamw(1e-3))
    state_dp, m_dp = step(state_dp, None, shard_batch({"source": x}, mesh), rng)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(state_single.params),
                      jax.tree_util.tree_leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)
