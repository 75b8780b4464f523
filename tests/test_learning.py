"""End-to-end learning smoke: the diffusion stack must actually learn.

The reference has no equivalent (its tests are eyeballed); this pins the whole
train stack — scheduler, UNet, optimizer, EMA — on a task small enough for
CPU: denoising a fixed dataset of class-conditional blobs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule
from medfusion_tpu.data import SyntheticDataset2D
from medfusion_tpu.models.unet import UNet
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState, make_diffusion_train_step

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_diffusion_learns_and_samples_class_structure():
    ds = SyntheticDataset2D(n=32, image_size=16, channels=1, num_classes=2, seed=0)
    x = jnp.asarray(np.stack([ds[i]["source"] for i in range(32)]))
    y = jnp.asarray([ds[i]["target"] for i in range(32)], jnp.int32)

    unet = UNet(in_ch=1, out_ch=1, hid_chs=(16, 32), kernel_sizes=(3, 3), strides=(1, 2),
                norm_name=("GROUP", {"num_groups": 8, "affine": True}),
                cond_emb_num_classes=2, deep_supervision=0, time_emb_dim=32)
    sched = GaussianDiffusionSchedule.create(timesteps=50, schedule_strategy="scaled_linear",
                                             beta_start=0.002, beta_end=0.02)
    pipe = DiffusionPipeline(scheduler=sched, noise_estimator=unet,
                             do_input_centering=False, clip_x0=True,
                             classifier_free_guidance_dropout=0.0)
    params = unet.init(KEY, x[:4], jnp.zeros((4,), jnp.int32), y[:4])["params"]
    state = TrainState.create(params, optax.adamw(2e-3))
    step = make_diffusion_train_step(pipe, donate=False)

    losses = []
    for i in range(200):
        idx = np.random.default_rng(i).choice(32, 8, replace=False)
        batch = {"source": x[idx], "target": y[idx]}
        state, metrics = step(state, None, batch, jax.random.fold_in(KEY, i))
        losses.append(float(metrics["loss"]))
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < 0.6 * early, f"no learning: {early:.3f} -> {late:.3f}"

    # learned denoising: noising a clean image to t and running the reverse
    # scan from there must land closer to the original than the noised input
    from medfusion_tpu.core import schedules as S

    p = {"noise_estimator": state.params}
    clean = x[:4]
    t_mid = jnp.full((4,), 20, jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(5), clean.shape)
    noised = S.q_sample(sched, clean, t_mid, noise)
    recon = pipe.denoise(p, noised, jax.random.PRNGKey(6), condition=y[:4],
                         steps=20, use_ddim=False, decode=False)
    err_before = float(jnp.mean((noised - clean) ** 2))
    err_after = float(jnp.mean((recon - clean) ** 2))
    assert err_after < 0.5 * err_before, (err_before, err_after)
