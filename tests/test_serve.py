"""Serving tests: micro-batching service semantics + the HTTP surface.

Runs on the virtual CPU mesh with the tiny model config; stage 2 keeps the
synthesized waveforms short (the vocoder upsamples every stage to full
512-bin resolution, so even tiny stages produce real audio)."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax

from musicgan_tpu.models import init_generator
from musicgan_tpu.serve import SynthesisService, _make_handler, _next_bucket

from tiny_cfg import TINY_MODEL

STAGE = 2
NB_VEC = 1


@pytest.fixture(scope="module")
def service():
    params = init_generator(jax.random.PRNGKey(0), TINY_MODEL)
    # generous window: thread scheduling on a loaded 1-core CI host can
    # delay the enqueue of "concurrent" requests by tens of ms
    svc = SynthesisService(
        params, TINY_MODEL, max_batch=4, window_ms=500.0, default_stage=STAGE
    )
    yield svc
    svc.close()


def test_next_bucket():
    assert [_next_bucket(n, 8) for n in (1, 2, 3, 5, 8, 9)] == [
        1, 2, 4, 8, 8, 8,
    ]


def test_submit_deterministic_and_distinct(service):
    w1 = service.submit(seed=7, nb_vec=NB_VEC).result(timeout=300)
    w2 = service.submit(seed=7, nb_vec=NB_VEC).result(timeout=300)
    w3 = service.submit(seed=8, nb_vec=NB_VEC).result(timeout=300)
    assert w1.dtype == np.float32 and w1.ndim == 1 and np.isfinite(w1).all()
    np.testing.assert_array_equal(w1, w2)  # same seed -> same audio
    assert not np.array_equal(w1, w3)      # different seed -> different audio


def test_concurrent_requests_microbatch(service):
    """Concurrent same-signature requests coalesce into fewer dispatches,
    and each caller still gets its own seed's waveform."""
    before = service.stats["batches"]
    futs = [service.submit(seed=s, nb_vec=NB_VEC) for s in range(4)]
    waves = [f.result(timeout=300) for f in futs]
    n_batches = service.stats["batches"] - before
    assert n_batches < 4  # coalesced (typically 1)
    solo = service.submit(seed=2, nb_vec=NB_VEC).result(timeout=300)
    # same seed across different batch buckets: equal up to XLA's
    # batch-shape-dependent reduction order
    np.testing.assert_allclose(waves[2], solo, atol=1e-5)


def test_mixed_signatures_not_merged(service):
    """Different (stage, nb_vec) signatures must never share a dispatch."""
    f1 = service.submit(seed=1, nb_vec=1)
    f2 = service.submit(seed=1, nb_vec=2)
    w1, w2 = f1.result(timeout=300), f2.result(timeout=300)
    # nb_vec doubles the audio length (up to the constant iSTFT edge term)
    assert abs(w2.shape[0] - 2 * w1.shape[0]) <= 1024


def test_longclip_route_matches_unsharded(service):
    """A solo wide request routes through the time-sharded mesh path and
    produces the same waveform as the single-device graph (to sharded-
    vs-unsharded tolerance)."""
    from musicgan_tpu.generate import synthesize_fn

    assert service.mesh is not None  # 8 virtual CPU devices (conftest)
    nb_vec = 4  # latent width 2*4 = 8 divides the 8-device mesh
    w = service.submit(seed=21, nb_vec=nb_vec, stage=STAGE).result(timeout=600)
    assert any("longclip" in s for s in service.stats["signatures"])

    z = jax.random.normal(
        jax.random.PRNGKey(21),
        (1, TINY_MODEL.latent_height, TINY_MODEL.latent_width * nb_vec,
         TINY_MODEL.rand_channels),
    )
    ref = np.asarray(
        synthesize_fn(TINY_MODEL, STAGE)(service.params, z)
    )[0]
    assert w.shape == ref.shape
    np.testing.assert_allclose(w, ref, atol=5e-4)


def test_longclip_not_used_for_batches(service):
    """Concurrent wide requests still micro-batch on the vmapped path
    (the time-sharded graph is solo-request only)."""
    before = [s for s in service.stats["signatures"]]
    futs = [service.submit(seed=s, nb_vec=4, stage=STAGE) for s in range(3)]
    waves = [f.result(timeout=600) for f in futs]
    assert all(np.isfinite(w).all() for w in waves)
    new = [s for s in service.stats["signatures"] if s not in before]
    assert any("b2" in s or "b4" in s for s in new) or not new


def test_invalid_args(service):
    with pytest.raises(ValueError):
        service.submit(seed=0, nb_vec=0)
    with pytest.raises(ValueError):
        service.submit(seed=0, stage=99)
    # compile-cache growth bound: each distinct nb_vec retains an XLA
    # executable, so unbounded requests are refused
    with pytest.raises(ValueError, match="nb_vec"):
        service.submit(seed=0, nb_vec=service.max_nb_vec + 1)


def test_stats_queue_depth_gauge(service):
    snap = service.stats_snapshot()
    assert "queue_depth" in snap and snap["queue_depth"] >= 0
    fut = service.submit(seed=11, nb_vec=1, stage=STAGE)
    fut.result(timeout=600)
    assert service.stats_snapshot()["queue_depth"] == 0  # drained


def test_http_surface(service):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["stage"] == STAGE

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize?seed=5&nb_vec=1",
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        from scipy.io import wavfile

        sr, wav = wavfile.read(io.BytesIO(body))
        assert sr == service.audio_cfg.sample_rate
        np.testing.assert_array_equal(
            wav, service.submit(seed=5, nb_vec=1).result(timeout=300)
        )

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1 and stats["batches"] >= 1

        # error surface: bad args -> 400 JSON, server keeps serving
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize?nb_vec=0", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_http_streaming_wav(service):
    """`?stream=1` returns a chunked WAV (device->host fetch overlaps the
    socket writes) that decodes byte-identically to the buffered route."""
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def fetch(extra=""):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize?seed=11&nb_vec=1{extra}",
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                assert r.headers["Content-Type"] == "audio/wav"
                return r.read(), r.headers

        body_s, hdr_s = fetch("&stream=1")
        assert hdr_s.get("Transfer-Encoding") == "chunked"
        assert hdr_s.get("Content-Length") is None
        body_b, _ = fetch()

        from scipy.io import wavfile

        sr_s, wav_s = wavfile.read(io.BytesIO(body_s))
        sr_b, wav_b = wavfile.read(io.BytesIO(body_b))
        assert sr_s == sr_b == service.audio_cfg.sample_rate
        np.testing.assert_array_equal(wav_s, wav_b)
    finally:
        server.shutdown()
        server.server_close()


def test_http_keepalive_post_with_body(service):
    """POSTs carrying a body over a REUSED HTTP/1.1 connection: the
    handler must drain the unread body, or the next request on the same
    socket is parsed from the leftover body bytes and 400s."""
    import http.client

    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        for seed in (3, 4):  # two requests, one persistent connection
            conn.request(
                "POST",
                f"/synthesize?seed={seed}&nb_vec=1",
                body=json.dumps({"client_tag": "keepalive-test"}),
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            assert r.status == 200
            body = r.read()
            assert body[:4] == b"RIFF"
    finally:
        conn.close()
        server.shutdown()
        server.server_close()


def test_http_chunked_body_refused_with_411(service):
    """A Transfer-Encoding: chunked POST has no Content-Length, so its
    framing would survive the body drain and poison a kept-alive
    connection — the handler must refuse it (411) and close."""
    import http.client

    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        conn.putrequest("POST", "/synthesize?seed=5&nb_vec=1")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        # one chunk + terminator — the exact bytes that would otherwise be
        # parsed as the next request line
        conn.send(b"5\r\nhello\r\n0\r\n\r\n")
        r = conn.getresponse()
        assert r.status == 411
        assert "Content-Length" in json.loads(r.read())["error"]
        # server must close the (unparseable-past-here) connection
        assert r.getheader("Connection") == "close" or r.will_close
    finally:
        conn.close()
        server.shutdown()
        server.server_close()
