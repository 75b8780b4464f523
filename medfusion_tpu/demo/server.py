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
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

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
    def __init__(self, args):
        self.args = args
        self._cache = {}

    def pipeline(self, preset_name):
        if preset_name not in self._cache:
            p = PRESETS[preset_name]
            pipe, params = load_pipeline(self.args, p)
            self._cache[preset_name] = (p, pipe, params)
        return self._cache[preset_name]


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

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                return self._html()
            if url.path == "/sample":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                preset = q.get("preset", state.args.preset)
                n = min(int(q.get("n", 4)), 25)
                steps = min(int(q.get("steps", 50)), 999)
                guidance = float(q.get("guidance", 8))
                seed = int(q.get("seed", 0))
                cond_val = int(q.get("cond", 1))
                p, pipe, params = state.pipeline(preset)
                cond = (jnp.full((n,), cond_val, jnp.int32)
                        if p.num_classes else None)
                imgs = pipe.sample(
                    params, jax.random.PRNGKey(seed), n, p.latent_shape,
                    condition=cond, steps=min(steps, p.timesteps), use_ddim=True,
                    guidance_scale=guidance if cond is not None else 1.0,
                )
                arr = ((np.asarray(imgs).clip(-1, 1) + 1) * 127.5).astype(np.uint8)
                tags = "".join(
                    f'<img src="/img?preset={preset}&seed={seed}&i={i}" width="128">'
                    for i in range(n)
                )
                self._last = arr
                Handler.last_images = arr
                return self._html(f"<h2>{n} samples, {steps} steps</h2>{tags}")
            if url.path == "/img":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                i = int(q.get("i", 0))
                arr = getattr(Handler, "last_images", None)
                if arr is None or i >= arr.shape[0]:
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
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--port", type=int, default=8600)
    args = ap.parse_args(argv)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(DemoState(args)))
    print(f"demo listening on http://127.0.0.1:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
