"""Helper commands mirroring the reference ``scripts/helpers``.

* ``latent-stats``   — one batch -> encode -> latent histogram + decode dump
  (``/root/reference/scripts/helpers/sample_latent_embedder.py:63-84``).
* ``extract-vae``    — pull the VAE subtree out of a VAEGAN (GANTrainState)
  checkpoint into a standalone TrainState checkpoint
  (``scripts/helpers/dump_discrimnator.py:10-25`` — the reference needs a
  Trainer hack; here it is a pytree re-save).
* ``export-gif``     — sampling-trajectory GIF for the README/demo
  (``scripts/helpers/export_example_gifs.py`` capability).
* ``export-images``  — grid of random dataset images
  (``scripts/helpers/export_random_images.py``).

Usage: python -m medfusion_tpu.cli.helpers <command> [options]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medfusion_tpu.cli.presets import PRESETS, build_dataset, build_vae
from medfusion_tpu.cli.train_diffusion import load_vae_params
from medfusion_tpu.utils import checkpoint as C
from medfusion_tpu.utils.logging import save_image_grid, to_uint8


def latent_stats(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = PRESETS[args.preset]
    key = jax.random.PRNGKey(args.seed)
    vae = build_vae(p)
    vae_params = load_vae_params(vae, p, args.vae_ckpt, key)
    ds = build_dataset(p, args.data_root, n_synthetic=args.n, seed=args.seed)
    x = jnp.asarray(np.stack([ds[i]["source"] for i in range(min(args.n, len(ds)))]))
    z = vae.apply({"params": vae_params}, x, method=vae.encode, rngs={"sample": key})
    dec = vae.apply({"params": vae_params}, z, method=vae.decode)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(6, 4))
    plt.hist(np.asarray(z).ravel(), bins=100)
    plt.title(f"latent histogram (mean {float(z.mean()):.3f}, std {float(z.std()):.3f})")
    plt.savefig(out / "latent_hist.png", dpi=100)
    save_image_grid(np.concatenate([np.asarray(x), np.asarray(dec)]),
                    out / "roundtrip.png", nrow=x.shape[0])
    print(f"latent shape {z.shape}, mean {float(z.mean()):.4f}, std {float(z.std()):.4f}")
    print(f"suggested: train_diffusion/sample --latent-shift {float(z.mean()):.4f} "
          f"--latent-scale {1.0 / max(float(z.std()), 1e-8):.4f}")
    print(f"wrote {out}/latent_hist.png and {out}/roundtrip.png")


def extract_vae(args):
    """GANTrainState ckpt -> standalone VAE TrainState ckpt."""
    from medfusion_tpu.models.latent_embedders import Discriminator, NLayerDiscriminator
    from medfusion_tpu.train import GANTrainState, TrainState
    from medfusion_tpu.train.adversarial import init_discriminators

    p = PRESETS[args.preset]
    key = jax.random.PRNGKey(0)
    vae = build_vae(p)
    x0 = np.zeros((1, p.image_size, p.image_size, p.in_channels), np.float32)
    vae_params = vae.init({"params": key, "sample": key}, x0)["params"]
    disc = (NLayerDiscriminator(spatial_dims=2)
            if getattr(args, "disc", "conv") == "patch"
            else Discriminator(spatial_dims=2))
    shapes = [(1, p.image_size // (2**i), p.image_size // (2**i), p.in_channels)
              for i in range(p.ae_deep_supervision + 1)]
    template = GANTrainState.create(
        vae_params, init_discriminators(disc, key, shapes),
        optax.adam(1e-6), optax.adam(1e-6),
    )
    state = C.restore_checkpoint(args.ckpt, template)
    out_state = TrainState.create(state.gen.params, optax.adam(p.ae_lr))
    out_state = out_state.replace(step=state.step)
    C.save_checkpoint(args.out, out_state, int(state.step))
    print(f"extracted VAE (step {int(state.step)}) -> {args.out}")


def export_gif(args):
    """Denoise-trajectory GIF: sample with per-step frames (host loop over
    pipeline.estimate — intentionally eager, it is a media exporter)."""
    from PIL import Image

    from medfusion_tpu.cli.sample import load_pipeline

    p = PRESETS[args.preset]
    pipe, params = load_pipeline(args, p)
    sched = pipe.scheduler
    steps = min(args.steps, p.timesteps)
    ts = np.asarray(sched.ddim_timesteps(steps))[::-1]
    rng = jax.random.PRNGKey(args.seed)
    k_init, rng = jax.random.split(rng)
    x = jax.random.normal(k_init, (1, *p.latent_shape))
    frames = []
    for i, t_scalar in enumerate(ts):
        rng, k = jax.random.split(rng)
        tb = jnp.full((1,), int(t_scalar), jnp.int32)
        noise = jax.random.normal(k, x.shape, x.dtype)
        x_prior, x_0, x_T, _ = pipe.estimate(params, x, tb, noise=noise)
        if i < steps - 1:
            t_next = int(ts[i + 1]) if i + 1 < steps else 0
            from medfusion_tpu.core import schedules as S

            x = S.ddim_step(sched, x_0, x_T, int(t_scalar), t_next,
                            jnp.zeros_like(x), eta=0.0)
        else:
            x = x_prior
        img = pipe.decode_latent(params, x)
        frames.append(Image.fromarray(to_uint8(np.asarray(img)[0])))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(out, save_all=True, append_images=frames[1:], duration=80, loop=0)
    print(f"wrote {out} ({len(frames)} frames)")


def export_images(args):
    p = PRESETS[args.preset]
    ds = build_dataset(p, args.data_root, n_synthetic=args.n, seed=args.seed)
    idx = np.random.default_rng(args.seed).choice(len(ds), size=min(args.n, len(ds)),
                                                  replace=False)
    imgs = np.stack([ds[int(i)]["source"] for i in idx])
    save_image_grid(imgs, Path(args.out) / "random_images.png")
    print(f"wrote {args.out}/random_images.png")


def _batched_slerp(zT1, zT2, lams):
    """Spherical interpolation between two noise tensors at a column of
    lambdas ``[n,1,1,1]`` (the standard interpolation for ~N(0,1) vectors —
    lerp shrinks norms), with a lerp fallback when the endpoints are
    near-parallel. One definition for both family branches of
    :func:`interpolate`."""
    f1, f2 = zT1.reshape(-1), zT2.reshape(-1)
    omega = jnp.arccos(jnp.clip(
        jnp.vdot(f1, f2) / (jnp.linalg.norm(f1) * jnp.linalg.norm(f2)),
        -1.0, 1.0))
    so = jnp.sin(omega)
    w1, w2 = jnp.where(
        so > 1e-6,
        jnp.stack([jnp.sin((1.0 - lams) * omega) / jnp.maximum(so, 1e-6),
                   jnp.sin(lams * omega) / jnp.maximum(so, 1e-6)]),
        jnp.stack([1.0 - lams, lams]))
    return w1 * zT1 + w2 * zT2


def _save_interp_row(args, x1, out, x2, detail):
    """Write the [img1, interpolations..., img2] grid row and log it."""
    rows = [np.asarray(x1)[0], *np.asarray(out), np.asarray(x2)[0]]
    out_dir = Path(args.out)
    save_image_grid(np.stack(rows), out_dir / "interpolation.png",
                    nrow=len(rows))
    print(f"wrote {out_dir}/interpolation.png ({args.n} lambdas, {detail})")


def interpolate(args):
    """Latent interpolation between two dataset images (the reference ships
    ``DiffusionPipeline.interpolate``, diffusion_pipeline.py:320-332, with no
    script around it): noise both latents to step i, lerp at n lambdas,
    denoise each, save one grid row [img1, interpolations..., img2]."""
    import jax

    from medfusion_tpu.cli.sample import load_pipeline

    p = PRESETS[args.preset]
    pipe, params = load_pipeline(args, p)
    ds = build_dataset(p, args.data_root, n_synthetic=max(args.n, 4), seed=args.seed)
    x1 = jnp.asarray(ds[args.i1 % len(ds)]["source"])[None]
    x2 = jnp.asarray(ds[args.i2 % len(ds)]["source"])[None]
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k_loop = jax.random.split(key, 3)
    z1 = pipe.encode_latent(params, x1, k1)
    z2 = pipe.encode_latent(params, x2, k2)
    i_step = min(args.steps, p.timesteps - 1)
    # Reference semantics (diffusion_pipeline.py:320-332): noise each latent
    # ONCE to step i, lerp, denoise — but all lambdas ride ONE batched
    # denoise program (per-lambda eager loops would pay the axon
    # per-dispatch latency n times over).
    from medfusion_tpu.core import schedules as S

    if getattr(args, "family", "diffusion") == "flow":
        # Flow-family editing parity (pipelines/flow.py): same two modes as
        # the diffusion branch below, one batched denoise over all lambdas.
        lams = jnp.linspace(0.0, 1.0, args.n).reshape(-1, 1, 1, 1)
        if getattr(args, "ddim_invert", False):
            # deterministic ODE inversion + slerp in noise space
            zT1 = pipe.invert(params, z1, steps=args.steps)
            zT2 = pipe.invert(params, z2, steps=args.steps)
            x = _batched_slerp(zT1, zT2, lams)
            out = pipe.denoise(params, x, k_loop, steps=args.steps)
            tag = "ode-invert"
        else:
            # reference semantics on the linear path: noise each latent ONCE
            # to t=strength, lerp, integrate the ODE tail
            s = args.strength
            k_n1, k_n2 = jax.random.split(jax.random.fold_in(key, 1))
            x1t = (1.0 - s) * z1 + s * jax.random.normal(k_n1, z1.shape, z1.dtype)
            x2t = (1.0 - s) * z2 + s * jax.random.normal(k_n2, z2.shape, z2.dtype)
            x = (1.0 - lams) * x1t + lams * x2t
            out = pipe.denoise(params, x, k_loop, steps=args.steps, t_start=s)
            tag = f"strength={s:g}"
        _save_interp_row(args, x1, out, x2, f"flow {tag}, {args.steps} steps")
        return
    if getattr(args, "ddim_invert", False):
        # Noise-space interpolation via deterministic DDIM inversion
        # (pipe.invert): endpoints reconstruct the inputs faithfully under
        # the eta=0 denoise, and intermediate noises are slerped.
        zT1 = pipe.invert(params, z1, steps=i_step)
        zT2 = pipe.invert(params, z2, steps=i_step)
        lams = jnp.linspace(0.0, 1.0, args.n).reshape(-1, 1, 1, 1)
        x = _batched_slerp(zT1, zT2, lams)
        out = pipe.denoise(params, x, k_loop, steps=i_step, use_ddim=True,
                           eta=0.0)
        _save_interp_row(args, x1, out, x2, f"ddim-invert, {i_step} steps")
        return
    k_n1, k_n2 = jax.random.split(jax.random.fold_in(key, 1))
    tvec = jnp.full((1,), i_step, jnp.int32)
    z1t = S.q_sample(pipe.scheduler, z1, tvec,
                     jax.random.normal(k_n1, z1.shape, z1.dtype))
    z2t = S.q_sample(pipe.scheduler, z2, tvec,
                     jax.random.normal(k_n2, z2.shape, z2.dtype))
    lams = jnp.linspace(0.0, 1.0, args.n).reshape(-1, 1, 1, 1)
    x = (1.0 - lams) * z1t + lams * z2t  # broadcasts [n, H, W, C]
    # use_ddim=False: ancestral over timesteps_array[:i] reversed, so the
    # first model query is at t = i-1 — matching the level the latents were
    # actually noised to. (The reference's interpolate->denoise DDIM path
    # queries t~T-1 on an input noised only to t=i, diffusion_pipeline.py:
    # 320-332 + 285 — a quirk, deliberately NOT carried over.)
    out = pipe.denoise(params, x, k_loop, steps=i_step, use_ddim=False)
    _save_interp_row(args, x1, out, x2, f"i={i_step}")


def inpaint(args):
    """Mask-guided regeneration of a dataset image (RePaint-style, see
    ``DiffusionPipeline.sample_inpaint``; beyond the reference): keep the
    image outside ``--box``, generate inside it conditioned on the kept
    context. The fractional image-space box is mapped to the latent grid
    (conservatively — any latent cell overlapping the box is regenerated)."""
    from medfusion_tpu.cli.sample import load_pipeline

    p = PRESETS[args.preset]
    pipe, params = load_pipeline(args, p)
    ds = build_dataset(p, args.data_root, n_synthetic=max(args.i1 + 1, 4),
                       seed=args.seed)
    x = jnp.asarray(ds[args.i1 % len(ds)]["source"])[None]
    key = jax.random.PRNGKey(args.seed)
    k_enc, k_loop = jax.random.split(key)
    z = pipe.encode_latent(params, x, k_enc)
    if pipe.do_input_centering:
        z = 2 * z - 1
    fx0, fy0, fx1, fy1 = (float(v) for v in args.box.split(","))
    lh, lw = z.shape[1], z.shape[2]
    y0, y1 = int(np.floor(fy0 * lh)), int(np.ceil(fy1 * lh))
    x0, x1 = int(np.floor(fx0 * lw)), int(np.ceil(fx1 * lw))
    mask = np.ones((1, lh, lw, 1), np.float32)  # 1 = keep
    mask[:, y0:y1, x0:x1, :] = 0.0  # 0 = generate
    if getattr(args, "family", "diffusion") == "flow":
        # flow family: per-grid-step renoise harmonization; jump_length has
        # no separate analog (the flow resample always jumps one grid step)
        if args.jump_length != 1:
            print("# note: --jump-length is a diffusion-family knob; the "
                  "flow resample analog jumps one grid step (ignored)")
        out = pipe.sample_inpaint(params, k_loop, z, jnp.asarray(mask),
                                  steps=args.steps,
                                  resample_steps=args.resample_steps)
    else:
        out = pipe.sample_inpaint(params, k_loop, z, jnp.asarray(mask),
                                  steps=args.steps, use_ddim=True, eta=1.0,
                                  resample_steps=args.resample_steps,
                                  jump_length=args.jump_length)
    ih, iw = x.shape[1], x.shape[2]
    img_mask = np.ones((ih, iw, 1), np.float32)
    img_mask[int(fy0 * ih):int(fy1 * ih), int(fx0 * iw):int(fx1 * iw)] = 0.0
    masked_vis = np.asarray(x)[0] * img_mask - (1.0 - img_mask)
    rows = [np.asarray(x)[0], masked_vis, np.asarray(out)[0]]
    out_dir = Path(args.out)
    save_image_grid(np.stack(rows), out_dir / "inpaint.png", nrow=3)
    print(f"wrote {out_dir}/inpaint.png (box {args.box} -> latent "
          f"[{y0}:{y1},{x0}:{x1}] of {lh}x{lw})")


def img2img(args):
    """SDEdit-style edit of a dataset image (arXiv:2108.01073, see
    ``DiffusionPipeline.img2img``; beyond the reference): noise the input
    ``--strength`` of the way along the forward path, regenerate the rest
    of the reverse scan (optionally steered to ``--label``). Saves
    [original | edited] side by side."""
    import jax

    from medfusion_tpu.cli.sample import load_pipeline

    p = PRESETS[args.preset]
    pipe, params = load_pipeline(args, p)
    ds = build_dataset(p, args.data_root, n_synthetic=max(args.i1 + 1, 4),
                       seed=args.seed)
    x = jnp.asarray(ds[args.i1 % len(ds)]["source"])[None]
    cond = None
    if args.label is not None and p.num_classes:
        cond = jnp.asarray([args.label], jnp.int32)
    if args.family == "flow":
        out = pipe.img2img(params, jax.random.PRNGKey(args.seed), x,
                           strength=args.strength, condition=cond,
                           steps=args.steps,
                           guidance_scale=args.guidance_scale)
    else:
        # cap at T like sample.py: a longer DDIM grid just duplicates
        # timesteps and skews the strength -> start_idx mapping
        out = pipe.img2img(params, jax.random.PRNGKey(args.seed), x,
                           strength=args.strength, condition=cond,
                           steps=min(args.steps, p.timesteps),
                           use_ddim=True, eta=0.0,
                           guidance_scale=args.guidance_scale)
    rows = [np.asarray(x)[0], np.asarray(out)[0]]
    out_dir = Path(args.out)
    save_image_grid(np.stack(rows), out_dir / "img2img.png", nrow=2)
    print(f"wrote {out_dir}/img2img.png (strength {args.strength}, "
          f"{args.steps} steps)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("latent-stats", "extract-vae", "export-gif", "export-images",
                 "interpolate", "inpaint", "img2img"):
        s = sub.add_parser(name)
        s.add_argument("--preset", choices=sorted(PRESETS), default="smoke")
        s.add_argument("--data-root", default=None)
        s.add_argument("--vae-ckpt", default=None)
        s.add_argument("--ckpt", default=None)
        s.add_argument("--ema", action="store_true")
        s.add_argument("--out", default="results/helpers")
        s.add_argument("--n", type=int, default=8)
        s.add_argument("--steps", type=int, default=25)
        s.add_argument("--seed", type=int, default=0)
        if name in ("export-gif", "export-images", "interpolate", "inpaint",
                    "img2img"):
            from medfusion_tpu.cli.kernels import add_kernel_args

            s.add_argument("--estimator", default="unet",
                           choices=("unet", "unet_legacy", "openai",
                                    "lucidrains", "dit"),
                           help="noise-estimator family the checkpoint was "
                                "trained with")
            add_kernel_args(s)
        if name == "extract-vae":
            s.add_argument("--disc", choices=["conv", "patch"], default="conv",
                           help="discriminator flavor the GAN checkpoint was "
                                "trained with (must match train_autoencoder --disc)")
        if name in ("interpolate", "inpaint", "img2img"):
            s.add_argument("--family", choices=("diffusion", "flow"),
                           default="diffusion",
                           help="flow = rectified-flow checkpoint (linear-"
                                "path noising + ODE tail instead of q_sample "
                                "+ DDIM/ancestral)")
            s.add_argument("--flow-shift", type=float, default=1.0)
        if name == "interpolate":
            s.add_argument("--i1", type=int, default=0)
            s.add_argument("--i2", type=int, default=1)
            s.add_argument("--ddim-invert", action="store_true",
                           help="interpolate in deterministically inverted "
                                "noise space (DDIM inversion / forward ODE "
                                "for --family flow; slerp) instead of "
                                "stochastic noising — faithful endpoints")
            s.add_argument("--strength", type=float, default=0.9,
                           help="flow family only: how far along the linear "
                                "path to noise before lerping (diffusion "
                                "uses --steps as the reference's level i)")
        if name == "img2img":
            s.add_argument("--i1", type=int, default=0,
                           help="dataset index of the image to edit")
            s.add_argument("--strength", type=float, default=0.6,
                           help="fraction of the forward path to renoise to "
                                "(1 = full resample, ->0 = return the input)")
            s.add_argument("--label", type=int, default=None,
                           help="steer the edit toward this class")
            s.add_argument("--guidance-scale", type=float, default=1.0)
        if name == "inpaint":
            s.add_argument("--i1", type=int, default=0,
                           help="dataset index of the image to inpaint")
            s.add_argument("--box", default="0.25,0.25,0.75,0.75",
                           help="fractional x0,y0,x1,y1 region to REGENERATE")
            s.add_argument("--resample-steps", type=int, default=1,
                           help="RePaint resamplings per jump point "
                                "(arXiv:2201.09865; paper uses 10)")
            s.add_argument("--jump-length", type=int, default=1,
                           help="RePaint jump length in grid steps "
                                "(paper uses 10)")
    args = ap.parse_args(argv)
    if hasattr(args, "flash"):
        from medfusion_tpu.cli.kernels import resolve_kernel_flags

        resolve_kernel_flags(args, ap)
    if args.cmd == "export-gif" and args.out == "results/helpers":
        args.out = "results/helpers/trajectory.gif"
    {"latent-stats": latent_stats, "extract-vae": extract_vae,
     "export-gif": export_gif, "export-images": export_images,
     "interpolate": interpolate, "inpaint": inpaint,
     "img2img": img2img}[args.cmd](args)


if __name__ == "__main__":
    main()
