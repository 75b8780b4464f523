"""Demo server: request-keyed image cache, deterministic /img responses.

Capability parity with the reference streamlit pages
(``/root/reference/streamlit/pages/chest.py:13-41``): per-request sampling
parameters, deterministic per-seed output, no cross-request state bleed."""

import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest


@pytest.fixture(scope="module")
def demo_server():
    from medfusion_tpu.demo.server import DemoState, make_handler

    class Args:
        preset = "smoke"
        ckpt = None
        vae_ckpt = None
        ema = False
        seed = 0
        serve_batch = 2

    state = DemoState(Args())
    # Random-init pipelines have zero-init out heads (every decode is exactly
    # gray); perturb the VAE out-head so images depend on the sampled latent.
    import jax

    _, _, params = state.pipeline("smoke")
    k = params["latent_embedder"]["outc"]["conv"]["conv"]["kernel"]
    params["latent_embedder"]["outc"]["conv"]["conv"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), k.shape, k.dtype) * 0.5
    )

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, r.read()


def test_index_and_sample_page(demo_server):
    status, body = _get(demo_server + "/")
    assert status == 200 and b"medfusion-tpu" in body
    status, body = _get(demo_server + "/sample?preset=smoke&n=2&steps=3&seed=1")
    assert status == 200
    # image tags carry the full request key so /img reproduces this batch
    assert b"/img?preset=smoke" in body and b"seed=1" in body and b"steps=3" in body


def test_img_is_keyed_by_request_not_shared_state(demo_server):
    # Two interleaved "users" with different seeds: each /img must return the
    # image of ITS request, not whoever sampled last.
    url_a = demo_server + "/sample?preset=smoke&n=2&steps=3&seed=11"
    url_b = demo_server + "/sample?preset=smoke&n=2&steps=3&seed=22"
    _get(url_a)
    _get(url_b)  # would have clobbered a last_images-style shared attribute
    img_a0 = _get(demo_server + "/img?preset=smoke&n=2&steps=3&seed=11&i=0")[1]
    img_b0 = _get(demo_server + "/img?preset=smoke&n=2&steps=3&seed=22&i=0")[1]
    assert img_a0 != img_b0, "different seeds must give different images"
    # deterministic: re-fetching the same key returns identical bytes
    assert img_a0 == _get(demo_server + "/img?preset=smoke&n=2&steps=3&seed=11&i=0")[1]
    # /img works even for a key never visited via /sample (regenerates)
    img_c = _get(demo_server + "/img?preset=smoke&n=1&steps=3&seed=33&i=0")[1]
    assert img_c.startswith(b"\x89PNG")
    # out-of-range index -> 404
    with pytest.raises(urllib.error.HTTPError):
        _get(demo_server + "/img?preset=smoke&n=1&steps=3&seed=33&i=5")


def test_one_endpoint_micro_batches_concurrent_requests(demo_server):
    """/one serves one PNG per request through the MicroBatcher: concurrent
    requests coalesce onto a fixed-shape compiled batch; different seeds give
    different images."""
    results = {}

    def client(seed):
        status, body = _get(demo_server + f"/one?preset=smoke&seed={seed}&cond=1")
        results[seed] = (status, body)

    threads = [threading.Thread(target=client, args=(s,)) for s in (101, 202)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {101, 202}
    for status, body in results.values():
        assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    assert results[101][1] != results[202][1]


def test_one_endpoint_rejects_bad_requests(demo_server):
    # unknown preset -> HTTP 400, not a dropped connection
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(demo_server + "/one?preset=typo&seed=1")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(demo_server + "/one?preset=smoke&seed=notanint")
    assert e.value.code == 400
