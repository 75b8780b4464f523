"""Browser demo: per-dataset sampling pages.

Capability parity with the reference streamlit app
(``/root/reference/streamlit/welcome.py`` + ``pages/{chest,eye,colon}.py``):
number inputs (samples <= 25, steps <= 999, guidance 1-10, seed), cached
pipeline, DDIM sampling at the dataset's latent shape, images rendered in the
browser. Implemented on stdlib ``http.server`` (streamlit is not installed in
this image); the sampler itself is the same jitted ``DiffusionPipeline.sample``.

Usage:
  python -m medfusion_tpu.demo.server --preset smoke [--ckpt ... --vae-ckpt ...] \
      [--port 8600]
"""

from __future__ import annotations

import argparse
import io
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from medfusion_tpu.cli.kernels import add_kernel_args, resolve_kernel_flags
from medfusion_tpu.cli.presets import PRESETS
from medfusion_tpu.cli.sample import load_pipeline

_PAGE = """<!doctype html><html><head><title>medfusion-tpu demo</title>
<style>body{{font-family:sans-serif;max-width:760px;margin:2em auto}}
img{{image-rendering:pixelated;border:1px solid #ccc;margin:2px}}</style></head>
<body><h1>medfusion-tpu — {name}</h1>
<p>Medical image synthesis with a TPU-native latent diffusion model.</p>
<form action="/sample" method="get">
preset <select name="preset">{options}</select>
samples <input type="number" name="n" value="4" min="1" max="25">
steps <input type="number" name="steps" value="50" min="1" max="999">
guidance <input type="number" name="guidance" value="8" min="1" max="10">
condition <input type="number" name="cond" value="1" min="0" max="1">
seed <input type="number" name="seed" value="0">
<button type="submit">sample</button></form>
{body}</body></html>"""


class DemoState:
    """Pipelines + generated batches, keyed by the FULL request parameters so
    concurrent users can't overwrite each other's images (the reference
    streamlit app gets this per-session from st.cache, pages/chest.py:13-41)."""

    _MAX_BATCHES = 8

    def __init__(self, args):
        self.args = args
        self._cache = {}
        self._images = OrderedDict()
        self._lock = threading.Lock()
        self._inflight = {}
        self._batchers = {}

    def batcher(self, preset_name):
        """Lazy per-preset MicroBatcher for the /one serving endpoint:
        concurrent single-image requests coalesce onto ONE fixed-shape
        compiled program (see demo/serving.py)."""
        from medfusion_tpu.demo.serving import MicroBatcher, make_sample_batch_fn

        p, pipe, params = self.pipeline(preset_name)
        with self._lock:
            if preset_name not in self._batchers:
                fam = getattr(self.args, "family", "diffusion")
                fn = make_sample_batch_fn(
                    pipe, params, p.latent_shape,
                    steps=(25 if fam == "flow" else min(50, p.timesteps)),
                    guidance_scale=4.0,
                    conditional=bool(p.num_classes), family=fam)
                self._batchers[preset_name] = MicroBatcher(
                    fn, batch_size=self.args.serve_batch)
        return self._batchers[preset_name]

    def pipeline(self, preset_name):
        with self._lock:
            if preset_name not in self._cache:
                p = PRESETS[preset_name]
                pipe, params = load_pipeline(self.args, p)
                self._cache[preset_name] = (p, pipe, params)
            return self._cache[preset_name]

    def images_for(self, preset, n, steps, guidance, cond_val, seed):
        """uint8 [n, H, W, C] for the request key; sampled once, LRU-cached.
        Concurrent requests for the same key (e.g. the n parallel /img
        fetches of one page) deduplicate onto a single sampling run."""
        key = (preset, n, steps, guidance, cond_val, seed)
        while True:
            with self._lock:
                if key in self._images:
                    self._images.move_to_end(key)
                    return self._images[key]
                event = self._inflight.get(key)
                if event is None:
                    event = self._inflight[key] = threading.Event()
                    break  # this thread computes
            event.wait(timeout=600)  # another thread is sampling this key

        try:
            p, pipe, params = self.pipeline(preset)
            cond = jnp.full((n,), cond_val, jnp.int32) if p.num_classes else None
            gs = guidance if cond is not None else 1.0
            if getattr(self.args, "family", "diffusion") == "flow":
                # cap the ODE NFE: each distinct steps value is its own jit
                # compile (minutes on the remote TPU) and 50 Heun steps
                # (99 NFE) already saturates flow quality
                imgs = pipe.sample(
                    params, jax.random.PRNGKey(seed), n, p.latent_shape,
                    condition=cond, steps=min(steps, 50), guidance_scale=gs,
                )
            else:
                imgs = pipe.sample(
                    params, jax.random.PRNGKey(seed), n, p.latent_shape,
                    condition=cond, steps=min(steps, p.timesteps),
                    use_ddim=True, guidance_scale=gs,
                )
            arr = ((np.asarray(imgs).clip(-1, 1) + 1) * 127.5).astype(np.uint8)
            with self._lock:
                self._images[key] = arr
                self._images.move_to_end(key)
                while len(self._images) > self._MAX_BATCHES:
                    self._images.popitem(last=False)
            return arr
        finally:
            with self._lock:
                self._inflight.pop(key, None)
            event.set()


def make_handler(state: DemoState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _html(self, body=""):
            options = "".join(
                f'<option value="{k}"{" selected" if k == state.args.preset else ""}>{k}</option>'
                for k in sorted(PRESETS)
            )
            page = _PAGE.format(name=state.args.preset, options=options, body=body)
            data = page.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        @staticmethod
        def _request_key(q):
            preset = q.get("preset", state.args.preset)
            return dict(
                preset=preset,
                n=min(int(q.get("n", 4)), 25),
                steps=min(int(q.get("steps", 50)), 999),
                guidance=float(q.get("guidance", 8)),
                cond_val=int(q.get("cond", 1)),
                seed=int(q.get("seed", 0)),
            )

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                return self._html()
            if url.path == "/sample":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                key = self._request_key(q)
                arr = state.images_for(**key)
                query = (f"preset={key['preset']}&n={key['n']}&steps={key['steps']}"
                         f"&guidance={key['guidance']}&cond={key['cond_val']}"
                         f"&seed={key['seed']}")
                tags = "".join(
                    f'<img src="/img?{query}&i={i}" width="128">'
                    for i in range(arr.shape[0])
                )
                return self._html(
                    f"<h2>{key['n']} samples, {key['steps']} steps</h2>{tags}"
                )
            if url.path == "/one":
                # serving endpoint: one image per request, micro-batched
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                preset = q.get("preset", state.args.preset)
                if preset not in PRESETS:
                    self.send_error(400, f"unknown preset {preset!r}")
                    return
                try:
                    seed = int(q.get("seed", 0))
                    cond = int(q.get("cond", 1))
                except ValueError:
                    self.send_error(400, "seed/cond must be integers")
                    return
                try:
                    fut = state.batcher(preset).submit(seed=seed, cond=cond)
                    arr = np.asarray(fut.result(timeout=600))
                except Exception as e:  # noqa: BLE001 - surface as HTTP 500
                    self.send_error(500, f"sampling failed: {type(e).__name__}")
                    return
                arr = ((arr.clip(-1, 1) + 1) * 127.5).astype(np.uint8)
                img = arr[:, :, 0] if arr.shape[-1] == 1 else arr
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "PNG")
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            if url.path == "/img":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                i = int(q.get("i", 0))
                arr = state.images_for(**self._request_key(q))
                if i >= arr.shape[0]:
                    self.send_response(404)
                    self.end_headers()
                    return
                img = arr[i, :, :, 0] if arr.shape[-1] == 1 else arr[i]
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "PNG")
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="smoke")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vae-ckpt", default=None)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--family", choices=("diffusion", "flow"),
                    default="diffusion",
                    help="flow = serve a rectified-flow checkpoint "
                         "(Heun probability-flow ODE sampler)")
    ap.add_argument("--flow-shift", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--port", type=int, default=8600)
    ap.add_argument("--serve-batch", type=int, default=4,
                    help="micro-batch size for the /one serving endpoint")
    ap.add_argument("--estimator", default="unet",
                    choices=("unet", "unet_legacy", "openai", "lucidrains", "dit"),
                    help="noise-estimator family the checkpoint was trained with")
    add_kernel_args(ap)
    args = ap.parse_args(argv)
    # global trace-time switches: cover every page sampler AND the /one
    # MicroBatcher program (both trace after this point)
    resolve_kernel_flags(args, ap)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(DemoState(args)))
    print(f"demo listening on http://127.0.0.1:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
