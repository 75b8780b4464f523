"""Recorded distillation quality demo at toy scale (companion to
tools/quality_loop.py, same hermetic 8-virtual-device CPU protocol and the
same 4x4-pooled random-projection featurizer — see quality_loop's docstring
for why InceptionV3 weights are unobtainable here).

What it demonstrates, end to end:

1. Train the two-stage toy stack (quality_loop's VAE + v-objective diffusion
   on the zero-terminal-SNR schedule).
2. Baseline few-step FID of the TEACHER sampled directly at 1/2/4 trailing
   DDIM steps (few-step sampling of an undistilled model degrades).
3. PROGRESSIVE DISTILLATION (arXiv:2202.00512): chain 8 -> 4 -> 2 -> 1
   students; FID of the 1-step and 4-step students through the same bulk
   sampler — the distilled few-step FID must beat the teacher's few-step
   FID and approach the teacher's 50-step FID.
4. CONSISTENCY DISTILLATION (arXiv:2303.01469): a second teacher on a
   standard (non-zero-SNR) schedule — CD runs in k-space where sigma_max
   must be finite — then 1-step and 2-step consistency sampling, vs that
   teacher's own 1-step baseline.

Run:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/distill_quality.py
Prints a JSON summary; numbers are recorded in PARITY.md.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_loop import (  # noqa: E402
    BATCH,
    CLASSES,
    IMG,
    KEY,
    N_FAKE,
    N_REAL,
    build_pipe,
    dataset_arrays,
    evaluate,
    to_uint8,
    train_diffusion,
    train_vae,
)

from medfusion_tpu.core.schedules import GaussianDiffusionSchedule  # noqa: E402
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline  # noqa: E402
from medfusion_tpu.train import TrainState, make_diffusion_train_step  # noqa: E402
from medfusion_tpu.train.consistency import (  # noqa: E402
    consistency_sample,
    make_consistency_train_step,
)
from medfusion_tpu.train.distillation import (  # noqa: E402
    make_distillation_train_step,
    next_stage_steps,
)

PD_ITERS = 600
CD_ITERS = 1200
LAT = (IMG // 2, IMG // 2, 2)


def encode_all(pipe, vae_params, x):
    z = pipe.encode_latent({"latent_embedder": vae_params}, x,
                           jax.random.PRNGKey(11))
    return z


def sample_ddim(pipe, est_params, vae_params, steps, tag):
    """Bulk trailing-DDIM sampling on the toy geometry (single jit, eta=0 so
    few-step is the deterministic grid the distilled students trained for)."""
    params = {"noise_estimator": est_params, "latent_embedder": vae_params}
    cond = jnp.asarray([i % CLASSES for i in range(N_FAKE)], jnp.int32)
    run = jax.jit(lambda p, r: pipe.denoise(
        p, jax.random.normal(jax.random.fold_in(r, 1), (N_FAKE, *LAT)),
        jax.random.fold_in(r, 2), condition=cond, steps=steps, use_ddim=True,
        eta=0.0, timestep_spacing="trailing", guidance_scale=1.0))
    t0 = time.time()
    out = np.asarray(run(params, jax.random.PRNGKey(42)))
    print(f"# sample[{tag}]: {N_FAKE} imgs, {steps} steps in "
          f"{time.time()-t0:.0f}s", flush=True)
    return out


def distill_pd(pipe, teacher, vae_params, z_all, y_all):
    """8 -> 4 -> 2 -> 1 progressive chain; returns {N: params}."""
    students = {}
    cur = teacher
    n = 8
    while n is not None:
        step = make_distillation_train_step(pipe, student_steps=n, donate=False)
        state = TrainState.create(cur, optax.adamw(1e-3))
        t0 = time.time()
        for it in range(PD_ITERS):
            idx = np.random.default_rng(50_000 + it).choice(N_REAL, BATCH,
                                                            replace=False)
            state, m = step(state, cur, {"source": z_all[idx],
                                         "target": y_all[idx]},
                            jax.random.fold_in(KEY, 90_000 + 1000 * n + it))
        print(f"# pd stage {n}-step: {PD_ITERS} iters in {time.time()-t0:.0f}s "
              f"loss={float(m['loss']):.5f}", flush=True)
        students[n] = state.params
        cur = state.params
        n = next_stage_steps(n)
    return students


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-pd", action="store_true",
                    help="run only the teacher-B + consistency-distillation "
                         "half (the pd half of the recorded table comes from "
                         "a prior full run)")
    args = ap.parse_args()

    assert jax.device_count() >= 8
    x, y = dataset_arrays()
    real_u8 = to_uint8(x)
    vae, vae_params = train_vae(x)

    # ---------------- teacher A: zero-SNR v (quality_loop config) ---------
    pipe, unet = build_pipe(vae)
    results = {}
    if not args.skip_pd:
        teacher = train_diffusion(pipe, unet, vae_params, x, y)
        z_all = encode_all(pipe, vae_params, x)

        f50, _, _ = evaluate(real_u8, to_uint8(
            sample_ddim(pipe, teacher, vae_params, 50, "teacher@50")))
        results["teacher_50step_fid"] = round(f50, 2)
        for s in (4, 1):
            f, _, _ = evaluate(real_u8, to_uint8(
                sample_ddim(pipe, teacher, vae_params, s, f"teacher@{s}")))
            results[f"teacher_{s}step_fid"] = round(f, 2)

        students = distill_pd(pipe, teacher, vae_params, z_all, y)
        for s in (4, 1):
            f, _, _ = evaluate(real_u8, to_uint8(
                sample_ddim(pipe, students[s], vae_params, s, f"pd-student@{s}")))
            results[f"pd_student_{s}step_fid"] = round(f, 2)

    # ---------------- teacher B: standard schedule (CD needs finite sigma) -
    # T=1000: at T=200 the reference beta range leaves abar_T ~ 0.11 — the
    # 11%% terminal signal gap that wrecks toy runs (quality_loop docstring);
    # the first recorded attempt's teacher B hit FID 4.3 (~untrained) for
    # exactly this reason and CD faithfully distilled the bad teacher.
    # T=1000 leaves abar_T ~ 3e-5: near-zero gap, sigma_max still finite so
    # CD's k-space construction stands.
    sched_b = GaussianDiffusionSchedule.create(
        timesteps=1000, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    import dataclasses
    pipe_b = dataclasses.replace(pipe, scheduler=sched_b)
    teacher_b = train_diffusion(pipe_b, unet, vae_params, x, y)
    fb50, _, _ = evaluate(real_u8, to_uint8(
        sample_ddim(pipe_b, teacher_b, vae_params, 50, "teacherB@50")))
    results["teacherB_50step_fid"] = round(fb50, 2)

    cond = jnp.asarray([i % CLASSES for i in range(N_FAKE)], jnp.int32)

    # encode the training latents ONCE; sigma_data = the MEASURED latent std
    # (the c_skip/c_out boundary parameterization assumes sigma_data is the
    # data scale — the 0.5 default is EDM's image normalization, not ours)
    z_all_b = encode_all(pipe_b, vae_params, x)
    sd = float(jnp.std(z_all_b))
    print(f"# latent std (sigma_data) = {sd:.4f}", flush=True)

    def cd_sample(est_params, steps, tag):
        params = {"noise_estimator": est_params, "latent_embedder": vae_params}
        run = jax.jit(lambda p, r: consistency_sample(
            pipe_b, p, jax.random.normal(jax.random.fold_in(r, 1),
                                         (N_FAKE, *LAT)),
            rng=jax.random.fold_in(r, 2), steps=steps, condition=cond,
            sigma_data=sd))
        t0 = time.time()
        out = np.asarray(run(params, jax.random.PRNGKey(43)))
        print(f"# cd-sample[{tag}]: {N_FAKE} imgs, {steps} step(s) in "
              f"{time.time()-t0:.0f}s", flush=True)
        return out

    # untrained-CD baseline: teacher params straight through f (boundary
    # wrapper, no CD training)
    fb1, _, _ = evaluate(real_u8, to_uint8(cd_sample(teacher_b, 1, "teacherB-f@1")))
    results["teacherB_f_1step_fid"] = round(fb1, 2)

    # Heun teacher step (paper default; O(h^2) target on the coarse Karras
    # grid), EMA target network (paper Alg. 2, mu=0.95 at N=18), measured
    # sigma_data — the euler/no-EMA/0.5 first attempt stalled at FID 1.16
    # vs the 0.3 one-step baseline
    step = make_consistency_train_step(
        pipe_b, n_grid=18, sigma_data=sd, huber_c=0.03, solver="heun")
    state = TrainState.create(teacher_b, optax.adamw(4e-4), use_ema=True,
                              ema_kwargs={"min_value": 0.95,
                                          "max_value": 0.95})
    t0 = time.time()
    for it in range(CD_ITERS):
        idx = np.random.default_rng(70_000 + it).choice(N_REAL, BATCH,
                                                        replace=False)
        state, m = step(state, teacher_b,
                        {"source": z_all_b[idx], "target": y[idx]},
                        jax.random.fold_in(KEY, 300_000 + it))
    print(f"# cd: {CD_ITERS} iters in {time.time()-t0:.0f}s "
          f"loss={float(m['loss']):.5f}", flush=True)
    for s in (1, 2):
        f, _, _ = evaluate(real_u8, to_uint8(
            cd_sample(state.params, s, f"cd-student@{s}")))
        results[f"cd_student_{s}step_fid"] = round(f, 2)

    ok = (results["cd_student_1step_fid"] < results["teacherB_f_1step_fid"])
    if not args.skip_pd:
        ok = (ok and results["pd_student_1step_fid"] < results["teacher_1step_fid"]
              and results["pd_student_4step_fid"] < results["teacher_4step_fid"])
    results["distillation_beats_fewstep_baselines"] = ok
    results["protocol"] = (
        "toy distill demo: quality_loop stack; FID featurizer = 4x4-pooled "
        "pixels -> 128-d random projection; %d fake vs %d real" %
        (N_FAKE, N_REAL))
    print(json.dumps(results))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
