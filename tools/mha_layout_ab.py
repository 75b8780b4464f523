"""On-chip A/B: head-layout flash kernel (rearrange -> [B,H,N,D] kernel ->
rearrange) vs the round-4 token-layout multi-head kernel ([B,N,H*D] direct)
at the chest spatial-attention levels.

The end-to-end bench moved 6.82 -> 6.09 samples/s when the token-layout
kernel became the default flash path; this isolates whether the kernel
itself is slower (lane-offset d=32 slices inside one program instance vs
per-head grid) or the regression lives elsewhere.

Timing: marginal fori_loop protocol (see tools/attn_profile.py) — per-op
cost is (T(900 iters) - T(100 iters)) / 800, scalar-checksum fetch.

Run ALONE on the chip:  python tools/mha_layout_ab.py
"""

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/medfusion_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import sys

sys.path.insert(0, ".")

from einops import rearrange  # noqa: E402

from medfusion_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention,
    flash_attention_tokens,
    naive_attention,
)

from _timing import time_op  # noqa: E402

B = 32


def level(n, ch):
    heads, d = 8, ch // 8
    scale = d ** -0.25
    x = jax.random.normal(jax.random.PRNGKey(0), (B, n, ch), jnp.bfloat16)

    def head_layout(h):
        q = rearrange(h, "b n (hh dd) -> b hh n dd", hh=heads)
        o = flash_attention(q, q, q, scale)
        return rearrange(o, "b hh n dd -> b n (hh dd)")

    def token_layout(h, bq=None, bk=None):
        if bq is None:
            return flash_attention_tokens(h, h, h, heads, scale)
        return flash_attention_tokens(h, h, h, heads, scale,
                                      block_q=bq, block_k=bk)

    def xla(h):
        q = rearrange(h, "b n (hh dd) -> b hh n dd", hh=heads)
        o = naive_attention(q, q, q, scale)
        return rearrange(o, "b hh n dd -> b n (hh dd)")

    rec = {"tokens": n, "ch": ch}
    rec["xla_ms"] = time_op(xla, x) * 1e3
    rec["head_kernel_ms"] = time_op(head_layout, x) * 1e3
    for bq, bk in ((None, None), (512, 256), (256, 512), (256, 256)):
        key = "token_kernel_ms" if bq is None else f"token_{bq}x{bk}_ms"
        try:
            rec[key] = time_op(lambda h: token_layout(h, bq, bk), x) * 1e3
        except Exception as e:  # scoped-VMEM OOM configs report, not crash
            rec[key] = f"OOM: {str(e)[:80]}"
    return rec


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rows = []
    for n, ch in ((1024, 256), (256, 512), (4096, 128)):
        r = level(n, ch)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "flash layout A/B (B=32, bf16, ms/app)",
                      "levels": rows}))


if __name__ == "__main__":
    main()
