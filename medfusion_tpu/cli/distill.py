"""Progressive distillation driver (arXiv:2202.00512) — BEYOND the reference.

Loads a trained diffusion checkpoint (``cli/train_diffusion`` run dir) as the
teacher and distills a chain of students, halving the sampling step count
each stage (N -> N/2 -> ... -> 1). Each stage's student initializes from its
teacher, trains with the truncated-SNR x-space loss
(:mod:`medfusion_tpu.train.distillation`), then becomes the next teacher.

The distilled N-step student samples with the stock sampler:
``cli/sample --steps N --timestep-spacing trailing`` (the student training
grid IS the trailing DDIM grid — see ``student_sample_timesteps``).

Usage:
  python -m medfusion_tpu.cli.distill --preset chest \\
      --teacher-ckpt runs/diffusion/checkpoints --vae-ckpt runs/ae/checkpoints \\
      --objective v --start-steps 16 --iters-per-stage 10000 [--out runs/distill]
  python -m medfusion_tpu.cli.distill --preset smoke --start-steps 4 \\
      --stages 1 --iters-per-stage 4   # smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medfusion_tpu.cli.kernels import add_kernel_args, resolve_kernel_flags
from medfusion_tpu.cli.presets import (
    PRESETS,
    build_dataset,
    build_scheduler,
    build_unet,
    build_vae,
)
from medfusion_tpu.cli.train_diffusion import load_vae_params
from medfusion_tpu.data import SimpleDataModule
from medfusion_tpu.pipelines.diffusion import DiffusionPipeline
from medfusion_tpu.train import TrainState
from medfusion_tpu.train.distillation import (
    make_distillation_train_step,
    next_stage_steps,
)
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.logging import MetricsWriter


def _run_stage(state, stage_step, iters, stage_dir, tag, ckpt_every, p,
               resume=False):
    """One training stage shared by all four methods:
    ``stage_step(state, it0) -> (state, metrics)`` supplies the method-
    specific work; this handles the log-every-50 / checkpoint-every /
    final-checkpoint scaffolding exactly once.

    ``resume=True`` restores the stage's latest checkpoint and continues
    from its iteration count (a COMPLETED stage returns its final state
    untouched — pd/reflow use that to fast-forward finished stages). The
    optimizer/EMA state and step counter restore exactly; the data stream
    restarts (infinite reshuffle — same property as train_* --resume)."""
    start = 0
    if resume:
        done = C.latest_step(stage_dir / "checkpoints")
        if done:
            state = C.restore_checkpoint(stage_dir / "checkpoints", state)
            start = min(done, iters)
            print(f"{tag}: resumed from it {start}/{iters}")
    if start >= iters:
        return state
    writer = MetricsWriter(stage_dir / "logs")
    t0s = time.time()
    for it in range(start + 1, iters + 1):
        state, metrics = stage_step(state, it - 1)
        if it % 50 == 0 or it == 1:
            writer.log_scalars(it, metrics)
            print(f"{tag} it {it} loss {float(metrics['loss']):.5f} "
                  f"({time.time() - t0s:.1f}s)")
        if it % ckpt_every == 0 or it >= iters:
            C.save_checkpoint(stage_dir / "checkpoints", state, it,
                              config=dataclasses.asdict(p), keep_top_k=2)
    writer.close()
    return state


def _latent_batches(dm, p, encode, key, want_uncond):
    """Infinite ``(device_batch, step_rng)`` stream: dataloader -> frozen-VAE
    encode (outside the distillation graph) -> optional 2-class negative
    labels (reference 1-label convention, guided teachers only)."""
    it, epoch = 0, 0
    while True:
        for batch in dm.train_dataloader(epoch=epoch):
            k_enc, k_step = jax.random.split(jax.random.fold_in(key, it))
            dev = {"source": encode(jax.device_put(batch["source"]), k_enc)}
            if "target" in batch and p.num_classes:
                tgt = batch["target"].astype(np.int32)
                dev["target"] = jax.device_put(tgt)
                if want_uncond and p.num_classes == 2:
                    dev["un_cond"] = jax.device_put(1 - tgt)
            yield dev, k_step
            it += 1
        epoch += 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chest")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--teacher-ckpt", default=None,
                    help="train_diffusion run checkpoints dir (random init "
                         "when omitted — smoke/testing only)")
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--out", default="runs/distill")
    ap.add_argument("--objective", choices=("x_T", "x_0", "v"), default="v",
                    help="teacher parameterization; the paper recommends v "
                         "(eps degenerates at few steps, arXiv:2202.00512 §4)")
    ap.add_argument("--start-steps", type=int, default=16,
                    help="first student's sampling step count N")
    ap.add_argument("--stages", type=int, default=0,
                    help="number of halvings (0 = keep halving down to 1 step)")
    ap.add_argument("--iters-per-stage", type=int, default=10000)
    ap.add_argument("--method", choices=("pd", "cd", "ct", "reflow"),
                    default="pd",
                    help="pd = progressive distillation (stage-halving, "
                         "arXiv:2202.00512); cd = consistency distillation "
                         "(single run -> 1-step generator, arXiv:2303.01469); "
                         "ct = teacher-FREE consistency training "
                         "(arXiv:2310.14189 — no diffusion teacher at all); "
                         "reflow = rectified-flow straightening + 1-step "
                         "distillation for --family flow checkpoints "
                         "(arXiv:2209.03003 §3)")
    ap.add_argument("--ct-s0", type=int, default=10,
                    help="ct: curriculum start discretization N(0)-1")
    ap.add_argument("--ct-s1", type=int, default=1280,
                    help="ct: curriculum end discretization (doubles toward)")
    ap.add_argument("--ct-doublings", type=int, default=None,
                    help="ct: cap curriculum stages (smoke/testing)")
    ap.add_argument("--flow-shift", type=float, default=1.0,
                    help="reflow: SD3 shift the flow teacher was trained "
                         "with (arXiv:2403.03206 eq. 23)")
    ap.add_argument("--reflow-teacher-steps", type=int, default=32,
                    help="reflow: teacher ODE steps per generated pair")
    ap.add_argument("--pair-batches", type=int, default=8,
                    help="reflow: coupled-pair pool size in batches, "
                         "generated up front and cycled")
    ap.add_argument("--regen-every", type=int, default=0,
                    help="reflow: regenerate the pair pool from the CURRENT "
                         "student every N iters (0 = never; k-rectification "
                         "within one run)")
    ap.add_argument("--reflow-distill-iters", type=int, default=0,
                    help="reflow: extra iterations of fixed-t=1 distillation "
                         "after straightening (trains the one-Euler-step "
                         "generator; sample with --family flow --steps 1)")
    ap.add_argument("--cd-grid", type=int, default=18,
                    help="CD sigma-grid discretization N (paper Alg. 2)")
    ap.add_argument("--cd-sigma-data", type=float, default=0.5)
    ap.add_argument("--cd-huber", type=float, default=None,
                    help="pseudo-Huber c (arXiv:2310.14189; None = L2)")
    ap.add_argument("--cd-ema", action="store_true",
                    help="EMA target network (paper Alg. 2; default uses the "
                         "stop-gradient student, arXiv:2310.14189)")
    ap.add_argument("--cd-solver", choices=("euler", "heun"), default="heun",
                    help="teacher ODE step Phi for CD (paper Alg. 2; heun = "
                         "the CM paper's default, one extra teacher forward "
                         "for an O(h^2) target)")
    ap.add_argument("--teacher-guidance", type=float, default=1.0,
                    help="fixed-weight guided distillation "
                         "(arXiv:2210.03142): the teacher rollout uses the "
                         "CFG-combined prediction at this scale (negative = "
                         "1-label for 2-class presets, reference "
                         "convention); sample the student with guidance 1")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None,
                    help="default: the preset diffusion LR")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--latent-scale", type=float, default=1.0)
    ap.add_argument("--latent-shift", type=float, default=0.0)
    ap.add_argument("--estimator", default="unet",
                    choices=("unet", "unet_legacy", "openai", "lucidrains", "dit"))
    add_kernel_args(ap)
    ap.add_argument("--resume", action="store_true",
                    help="restore each stage's latest checkpoint and "
                         "continue (completed stages fast-forward)")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.method == "ct" and args.teacher_ckpt:
        raise SystemExit("--method ct is teacher-free (consistency "
                         "TRAINING); drop --teacher-ckpt (use cd to "
                         "distill a diffusion teacher)")
    p = PRESETS[args.preset]
    batch_size = args.batch_size or p.diffusion_batch_size
    out = Path(args.out)
    key = jax.random.PRNGKey(args.seed)

    # match the teacher's model config (an attention-trained teacher has a
    # different param tree) and flip the measured kernel switches before the
    # first trace — teacher rollout, student step, and reflow pair
    # generation all inherit them
    resolve_kernel_flags(args, ap)
    vae = build_vae(p)
    unet = build_unet(p, args.estimator, attention=args.attention,
                      attn_heads=getattr(args, "attention_heads", 8))
    if args.method == "reflow":
        if args.teacher_guidance != 1.0 and p.num_classes != 2:
            ap.error("--teacher-guidance negative labels need a 2-class preset")
        _reflow(args, p, unet, vae, out, key, batch_size)
        return
    sched = build_scheduler(p)
    pipe = DiffusionPipeline(
        scheduler=sched, noise_estimator=unet, latent_embedder=vae,
        estimator_objective=args.objective,
        classifier_free_guidance_dropout=0.0,
        do_input_centering=False, clip_x0=False,
        latent_scale=args.latent_scale, latent_shift=args.latent_shift,
    )
    vae_params = load_vae_params(vae, p, args.vae_ckpt, key)

    h, w, c = p.latent_shape
    z0 = np.zeros((batch_size, h, w, c), np.float32)
    t0 = np.zeros((batch_size,), np.int32)
    teacher = unet.init(key, z0, t0, t0 if p.num_classes else None)["params"]
    if args.teacher_ckpt:
        template = TrainState.create(teacher, optax.adamw(1e-4))
        teacher = C.restore_checkpoint(Path(args.teacher_ckpt), template).params
        print(f"teacher restored from {args.teacher_ckpt}")

    # frozen-VAE encode into the diffusion working space, once per batch,
    # OUTSIDE the distillation graph (the teacher already costs 2 forwards)
    @jax.jit
    def encode(x, rng):
        return pipe.encode_latent({"latent_embedder": vae_params}, x, rng)

    ds = build_dataset(p, args.data_root, n_synthetic=max(batch_size * 4, 16),
                       seed=args.seed)
    dm = SimpleDataModule(ds, batch_size=batch_size, seed=args.seed,
                          weights=ds.get_weights())

    lr = args.lr or p.diffusion_lr
    if args.method == "ct":
        from medfusion_tpu.train.consistency import (
            ct_curriculum_grid,
            make_consistency_training_step,
        )

        # iCT default metric: pseudo-Huber with c = 0.00054*sqrt(D)
        D = h * w * c
        huber = (args.cd_huber if args.cd_huber is not None
                 else 0.00054 * float(np.sqrt(D)))
        stages = ct_curriculum_grid(args.iters_per_stage, args.ct_s0,
                                    args.ct_s1, args.ct_doublings)
        stage_dir = out / "consistency_training"
        state = TrainState.create(teacher, optax.adamw(lr, weight_decay=1e-2),
                                  use_ema=args.cd_ema)
        batches = _latent_batches(dm, p, encode, key, want_uncond=False)
        cur = {"n": None, "fn": None}

        def ct_step(state, it0):
            # the discretization N(k) is static per compiled step: rebuild
            # (recompile) at each curriculum doubling
            n_grid = max(n for s, n in stages if s <= it0)
            if n_grid != cur["n"]:
                cur["n"] = n_grid
                print(f"ct curriculum: N={n_grid} from it {it0}")
                cur["fn"] = make_consistency_training_step(
                    pipe, n_grid=n_grid, sigma_data=args.cd_sigma_data,
                    huber_c=huber,
                    compute_dtype=jnp.bfloat16 if args.bf16 else None)
            dev, k_step = next(batches)
            return cur["fn"](state, dev, k_step)

        _run_stage(state, ct_step, args.iters_per_stage, stage_dir, "ct",
                   args.ckpt_every, p, resume=args.resume)
        print(f"consistency training done -> {stage_dir}/checkpoints  "
              f"(sample: train.consistency.consistency_sample, 1-4 steps)")
        return
    if args.method == "cd":
        from medfusion_tpu.train.consistency import make_consistency_train_step

        stage_dir = out / "consistency"
        step_fn = make_consistency_train_step(
            pipe, n_grid=args.cd_grid, sigma_data=args.cd_sigma_data,
            huber_c=args.cd_huber,
            teacher_guidance_scale=args.teacher_guidance,
            solver=args.cd_solver,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
        state = TrainState.create(teacher, optax.adamw(lr, weight_decay=1e-2),
                                  use_ema=args.cd_ema)
        batches = _latent_batches(dm, p, encode, key,
                                  want_uncond=args.teacher_guidance != 1.0)
        _run_stage(state,
                   lambda s, it0: step_fn(s, teacher, *next(batches)),
                   args.iters_per_stage, stage_dir, "cd", args.ckpt_every, p,
                   resume=args.resume)
        print(f"consistency distillation done -> {stage_dir}/checkpoints  "
              f"(sample: train.consistency.consistency_sample, 1-4 steps)")
        return

    n = args.start_steps
    stage_idx = 0
    while n is not None:
        stage_dir = out / f"stage_{n}steps"
        # guided distillation applies to the FIRST stage only: later
        # teachers are students that already absorbed the guidance
        # (arXiv:2210.03142 two-stage recipe)
        tg = args.teacher_guidance if stage_idx == 0 else 1.0
        step_fn = make_distillation_train_step(
            pipe, student_steps=n, donate=False,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
            teacher_guidance_scale=tg)
        state = TrainState.create(teacher, optax.adamw(lr, weight_decay=1e-2))
        print(f"--- stage {stage_idx}: distilling to {n}-step student ---")
        batches = _latent_batches(dm, p, encode,
                                  jax.random.fold_in(key, stage_idx),
                                  want_uncond=tg != 1.0)
        state = _run_stage(
            state,
            lambda s, it0, _f=step_fn, _t=teacher, _b=batches:
                _f(s, _t, *next(_b)),
            args.iters_per_stage, stage_dir, f"stage {n}-step",
            args.ckpt_every, p, resume=args.resume)
        teacher = state.params  # student becomes the next teacher
        print(f"stage done -> {stage_dir}/checkpoints  "
              f"(sample: --steps {n} --timestep-spacing trailing --objective "
              f"{args.objective})")
        stage_idx += 1
        if args.stages and stage_idx >= args.stages:
            break
        n = next_stage_steps(n)
    print(f"distillation complete: {stage_idx} stage(s) -> {out}")


def _reflow(args, p, unet, vae, out, key, batch_size):
    """Rectified-flow straightening (arXiv:2209.03003 §3) of a
    ``--family flow`` teacher: generate a coupled-pair pool with the teacher
    ODE, retrain on the straight paths, optionally finish with fixed-t=1
    distillation into a one-Euler-step generator. The reflowed student
    samples with the stock flow sampler at few steps
    (``cli/sample --family flow --steps 1..4``)."""
    from medfusion_tpu.pipelines.flow import FlowMatchingPipeline
    from medfusion_tpu.train.reflow import (
        generate_reflow_pairs,
        make_reflow_train_step,
    )

    pipe = FlowMatchingPipeline(
        noise_estimator=unet, latent_embedder=vae,
        classifier_free_guidance_dropout=0.0, do_input_centering=False,
        shift=args.flow_shift,
        latent_scale=args.latent_scale, latent_shift=args.latent_shift,
    )

    h, w, c = p.latent_shape
    z0 = np.zeros((batch_size, h, w, c), np.float32)
    t0 = np.zeros((batch_size,), np.int32)
    teacher = unet.init(key, z0, t0.astype(np.float32),
                        t0 if p.num_classes else None)["params"]
    if args.teacher_ckpt:
        template = TrainState.create(teacher, optax.adamw(1e-4))
        teacher = C.restore_checkpoint(Path(args.teacher_ckpt), template).params
        print(f"flow teacher restored from {args.teacher_ckpt}")

    def _mk_gen(g):
        return jax.jit(partial(
            generate_reflow_pairs, pipe, num_pairs=batch_size,
            latent_shape=p.latent_shape, steps=args.reflow_teacher_steps,
            guidance_scale=g))

    gen_guided = _mk_gen(args.teacher_guidance)
    gen_plain = gen_guided if args.teacher_guidance == 1.0 else _mk_gen(1.0)

    def make_pool(params, pool_key, guided):
        """args.pair_batches coupled-pair batches from `params`' ODE.
        ``guided`` applies --teacher-guidance CFG — valid ONLY for the
        ORIGINAL teacher's pool: a (re)trained student has already absorbed
        the guidance into its velocity field, so guiding its ODE again would
        compound to ~w^2 (mirror of the pd stage-0-only rule)."""
        gen = gen_guided if guided else gen_plain
        pool = []
        for j in range(args.pair_batches):
            k = jax.random.fold_in(pool_key, j)
            k_cond, k_pair = jax.random.split(k)
            cond = un_cond = None
            if p.num_classes:
                cond = jax.random.randint(k_cond, (batch_size,), 0,
                                          p.num_classes)
                if guided and args.teacher_guidance != 1.0:
                    un_cond = 1 - cond  # reference convention, 2-class
            z1, z0p = gen({"noise_estimator": params}, k_pair,
                          condition=cond, un_cond=un_cond)
            batch = {"z0": z0p, "z1": z1}
            if cond is not None:
                batch["target"] = cond
            pool.append(batch)
        return pool

    lr = args.lr or p.diffusion_lr
    dtype = jnp.bfloat16 if args.bf16 else None
    phases = [("reflow", None, args.iters_per_stage)]
    if args.reflow_distill_iters:
        phases.append(("reflow_1step", 1.0, args.reflow_distill_iters))

    student = teacher
    for phase_idx, (phase, distill_t, iters) in enumerate(phases):
        stage_dir = out / phase
        step_fn = make_reflow_train_step(pipe, distill_t=distill_t,
                                         compute_dtype=dtype)
        state = TrainState.create(student, optax.adamw(lr, weight_decay=1e-2))
        # the first phase's pool comes from the ORIGINAL teacher (guided if
        # --teacher-guidance); student-sourced pools (--regen-every
        # k-rectification, and the 1-step phase) are NEVER guided — the
        # student already absorbed the guidance
        first = phase == "reflow"
        pool_src = teacher if first else student
        holder = {"pool": make_pool(pool_src,
                                    jax.random.fold_in(key, 500_000 + phase_idx),
                                    guided=first)}
        print(f"--- {phase}: {len(holder['pool'])} pair batches x "
              f"{batch_size}, {iters} iters ---")

        def reflow_step(state, it0, _phase=phase, _idx=phase_idx,
                        _step=step_fn, _h=holder):
            it = it0 + 1
            if (args.regen_every and _phase == "reflow"
                    and it % args.regen_every == 0):
                _h["pool"] = make_pool(state.params,
                                       jax.random.fold_in(key, it),
                                       guided=False)
            batch = _h["pool"][it0 % len(_h["pool"])]
            k_it = jax.random.fold_in(jax.random.fold_in(key, 7_000_000 + it),
                                      _idx)
            return _step(state, batch, k_it)

        state = _run_stage(state, reflow_step, iters, stage_dir, phase,
                           args.ckpt_every, p, resume=args.resume)
        student = state.params
        print(f"{phase} done -> {stage_dir}/checkpoints")
    n_rec = ("1 (Euler)" if args.reflow_distill_iters else "1-4")
    print(f"reflow complete -> {out}  "
          f"(sample: cli.sample --family flow --steps {n_rec})")


if __name__ == "__main__":
    main()
