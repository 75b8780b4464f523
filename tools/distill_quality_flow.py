"""Recorded distillation quality, part 2 of 2 (companion to
tools/distill_quality.py, same hermetic 8-virtual-device CPU protocol and
featurizer): the remaining two distillation methods — REFLOW and teacher-free
CONSISTENCY TRAINING — each with a 1-step FID row, so every method in
cli/distill has a recorded quality number (round-3 verdict ask #1).

1. Train the toy VAE + a rectified-flow teacher (quality_loop --family flow
   config; its recorded 25-step FID is 0.03).
2. Baselines: teacher sampled at 25-step Heun (reference quality) and
   1-step Euler (the few-step failure mode reflow must fix).
3. REFLOW (arXiv:2209.03003 §3): coupled pairs (z1, teacher-ODE z0) ->
   flow matching on straight paths -> 1-step Euler student; then one
   distill stage (distill_t=1.0) on the same teacher pairs. Both 1-step
   FIDs must beat the teacher's own 1-step FID.
4. CONSISTENCY TRAINING (iCT, arXiv:2310.14189): teacher-FREE, from random
   init on a standard (finite-sigma) schedule with the N(k) doubling
   curriculum; 1-step and 2-step consistency sampling vs the untrained
   1-step baseline.

Run:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/distill_quality_flow.py
Prints a JSON summary; numbers are recorded in PARITY.md
("Distillation quality" table).
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
from medfusion_tpu.train import TrainState  # noqa: E402
from medfusion_tpu.train.consistency import (  # noqa: E402
    consistency_sample,
    ct_curriculum_grid,
    make_consistency_training_step,
)
from medfusion_tpu.train.reflow import (  # noqa: E402
    generate_reflow_pairs,
    make_reflow_train_step,
)

REFLOW_ITERS = 800
CT_ITERS = 2000
LAT = (IMG // 2, IMG // 2, 2)


def sample_flow(pipe, est_params, vae_params, steps, heun, tag):
    params = {"noise_estimator": est_params, "latent_embedder": vae_params}
    cond = jnp.asarray([i % CLASSES for i in range(N_FAKE)], jnp.int32)
    run = jax.jit(lambda p, r: pipe.sample(
        p, r, N_FAKE, LAT, condition=cond, steps=steps, heun=heun,
        guidance_scale=1.0))
    t0 = time.time()
    out = np.asarray(run(params, jax.random.PRNGKey(42)))
    print(f"# sample[{tag}]: {N_FAKE} imgs, {steps} steps heun={heun} in "
          f"{time.time()-t0:.0f}s", flush=True)
    return out


def train_reflow_stage(pipe, init_params, pairs, y, distill_t, iters, tag):
    step = make_reflow_train_step(pipe, distill_t=distill_t, donate=False)
    state = TrainState.create(init_params, optax.adamw(1e-3))
    z1_all, z0_all = pairs
    t0 = time.time()
    for it in range(iters):
        idx = np.random.default_rng(40_000 + it).choice(
            z0_all.shape[0], BATCH, replace=False)
        batch = {"z0": z0_all[idx], "z1": z1_all[idx], "target": y[idx]}
        state, m = step(state, batch, jax.random.fold_in(KEY, 500_000 + it))
    print(f"# reflow[{tag}]: {iters} iters in {time.time()-t0:.0f}s "
          f"loss={float(m['loss']):.5f}", flush=True)
    return state.params


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-reflow", action="store_true",
                    help="run only the consistency-training half (the reflow "
                         "half of the recorded table comes from a prior full "
                         "run)")
    args = ap.parse_args()

    assert jax.device_count() >= 8
    x, y_all = dataset_arrays()
    real_u8 = to_uint8(x)
    vae, vae_params = train_vae(x)

    results = {}

    # ---------------- rectified-flow teacher + reflow ----------------------
    if not args.skip_reflow:
        fpipe, unet = build_pipe(vae, family="flow")
        teacher = train_diffusion(fpipe, unet, vae_params, x, y_all)
        f25, _, _ = evaluate(real_u8, to_uint8(
            sample_flow(fpipe, teacher, vae_params, 25, True, "teacher@25heun")))
        results["flow_teacher_25step_fid"] = round(f25, 2)
        f1, _, _ = evaluate(real_u8, to_uint8(
            sample_flow(fpipe, teacher, vae_params, 1, False, "teacher@1euler")))
        results["flow_teacher_1step_fid"] = round(f1, 2)

        # coupled pairs from the ORIGINAL teacher only (never from a guided
        # student pool — train/reflow.py CFG-compounding gotcha)
        t_tree = {"noise_estimator": teacher, "latent_embedder": vae_params}
        n_pairs = N_REAL
        cond_pool = jnp.asarray([i % CLASSES for i in range(n_pairs)], jnp.int32)
        gen = jax.jit(lambda r: generate_reflow_pairs(
            fpipe, t_tree, r, n_pairs, LAT, condition=cond_pool, steps=25))
        t0 = time.time()
        z1_all, z0_all = gen(jax.random.PRNGKey(7))
        print(f"# pairs: {n_pairs} teacher-ODE couplings in {time.time()-t0:.0f}s",
              flush=True)

        student = train_reflow_stage(fpipe, teacher, (z1_all, z0_all), cond_pool,
                                     None, REFLOW_ITERS, "2-rectified-flow")
        fr1, _, _ = evaluate(real_u8, to_uint8(
            sample_flow(fpipe, student, vae_params, 1, False, "reflow@1euler")))
        results["reflow_student_1step_fid"] = round(fr1, 2)

        one_step = train_reflow_stage(fpipe, student, (z1_all, z0_all), cond_pool,
                                      1.0, REFLOW_ITERS // 2, "distill_t=1")
        fd1, _, _ = evaluate(real_u8, to_uint8(
            sample_flow(fpipe, one_step, vae_params, 1, False, "reflow-distill@1")))
        results["reflow_distilled_1step_fid"] = round(fd1, 2)

    # ---------------- teacher-free consistency training (iCT) --------------
    # T=1000: the first recorded attempt used T=200, whose sigma_max ~ 2.4
    # leaves an irreducible train/sample mismatch — CT only ever trains on
    # x0 + sigma*eps (data-correlated points) but 1-step sampling starts
    # from PURE noise sqrt(1+sigma_max^2)*N(0,1); at sigma_max ~ 2.4 the
    # missing x0 component is ~40%% of the signal and the run landed at
    # FID 4.61 ~ untrained. T=1000 puts sigma_max ~ 183 where the prior
    # mismatch is negligible (same fix as distill_quality's teacher B).
    sched = GaussianDiffusionSchedule.create(
        timesteps=1000, schedule_strategy="scaled_linear",
        beta_start=0.002, beta_end=0.02)
    dpipe, dunet = build_pipe(vae)  # zero-SNR pipe; swap in the CT schedule
    import dataclasses

    dpipe = dataclasses.replace(dpipe, scheduler=sched,
                                estimator_objective="x_0", min_snr_gamma=None)
    z0t = jnp.zeros((2, *LAT))
    ct_params = dunet.init(jax.random.PRNGKey(21), z0t,
                           jnp.zeros((2,), jnp.int32),
                           jnp.zeros((2,), jnp.int32))["params"]
    cond_all = jnp.asarray([i % CLASSES for i in range(N_FAKE)], jnp.int32)

    # encode once; the CT loss q-samples internally from clean latents.
    # sigma_data = the MEASURED latent std (c_skip/c_out assume the data
    # scale; 0.5 is EDM's image normalization, not this VAE's)
    z_all = dpipe.encode_latent({"latent_embedder": vae_params}, x,
                                jax.random.PRNGKey(11))
    sd = float(jnp.std(z_all))
    print(f"# latent std (sigma_data) = {sd:.4f}", flush=True)

    def ct_sample(est_params, steps, tag):
        params = {"noise_estimator": est_params, "latent_embedder": vae_params}
        run = jax.jit(lambda p, r: consistency_sample(
            dpipe, p, jax.random.normal(jax.random.fold_in(r, 1),
                                        (N_FAKE, *LAT)),
            rng=jax.random.fold_in(r, 2), steps=steps, condition=cond_all,
            sigma_data=sd))
        t0 = time.time()
        out = np.asarray(run(params, jax.random.PRNGKey(43)))
        print(f"# ct-sample[{tag}]: {N_FAKE} imgs, {steps} step(s) in "
              f"{time.time()-t0:.0f}s", flush=True)
        return out

    fu1, _, _ = evaluate(real_u8, to_uint8(ct_sample(ct_params, 1,
                                                     "ct-untrained@1")))
    results["ct_untrained_1step_fid"] = round(fu1, 2)

    stages = ct_curriculum_grid(CT_ITERS, s0=10, s1=160)
    starts = [s for s, _ in stages] + [CT_ITERS]
    state = TrainState.create(ct_params, optax.adamw(1e-3))
    t0 = time.time()
    for (start, n_k), end in zip(stages, starts[1:]):
        # re-jit per curriculum doubling (cli/distill driver pattern)
        step = make_consistency_training_step(dpipe, n_grid=int(n_k),
                                              sigma_data=sd, huber_c=0.03)
        for it in range(start, end):
            idx = np.random.default_rng(90_000 + it).choice(N_REAL, BATCH,
                                                            replace=False)
            state, m = step(state, {"source": z_all[idx],
                                    "target": y_all[idx]},
                            jax.random.fold_in(KEY, 700_000 + it))
    print(f"# ct: {CT_ITERS} iters (N {stages[0][1]}->{stages[-1][1]}) in "
          f"{time.time()-t0:.0f}s loss={float(m['loss']):.5f}", flush=True)
    for s in (1, 2):
        f, _, _ = evaluate(real_u8, to_uint8(
            ct_sample(state.params, s, f"ct@{s}")))
        results[f"ct_{s}step_fid"] = round(f, 2)

    ok = results["ct_1step_fid"] < results["ct_untrained_1step_fid"]
    if not args.skip_reflow:
        ok = (ok
              and results["reflow_student_1step_fid"] < results["flow_teacher_1step_fid"]
              and results["reflow_distilled_1step_fid"] < results["flow_teacher_1step_fid"])
    results["reflow_ct_beat_baselines"] = ok
    results["protocol"] = (
        "toy distill demo part 2: quality_loop stack; featurizer = 4x4-pooled "
        "pixels -> 128-d random projection; %d fake vs %d real" %
        (N_FAKE, N_REAL))
    print(json.dumps(results))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
