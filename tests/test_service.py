"""Micro-batching embedding service: concurrent requests coalesce into
device batches and results scatter back correctly."""

import os
import threading

import numpy as np
import pytest

import jax

from l3embedding_tpu.embed import EmbeddingExtractor
from l3embedding_tpu.embed.service import EmbeddingService


@pytest.fixture(scope="module")
def service():
    ex = EmbeddingExtractor(None, "tiny_L3", "original")
    with EmbeddingService(ex, max_batch_size=32, max_latency_ms=20) as svc:
        yield svc


def test_single_request(service):
    w = np.random.RandomState(0).randn(3, 48000).astype(np.float32) * 0.1
    emb = service.embed(w)
    assert emb.shape == (3, 350)
    # Equal to the direct extractor path.
    direct = service.extractor.embed_windows(w)
    np.testing.assert_allclose(emb, direct, rtol=1e-5, atol=1e-6)


def test_concurrent_requests_batch_and_scatter(service):
    rng = np.random.RandomState(1)
    inputs = [rng.randn(n, 48000).astype(np.float32) * 0.1
              for n in (1, 2, 5, 3, 1, 4)]
    results = [None] * len(inputs)

    def worker(i):
        results[i] = service.embed(inputs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(inputs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i, (w, r) in enumerate(zip(inputs, results)):
        assert r.shape == (w.shape[0], 350)
        direct = service.extractor.embed_windows(w)
        np.testing.assert_allclose(r, direct, rtol=1e-5, atol=1e-6)


def test_loopback_bench_coalesces(service):
    """tools/bench_serving.py --loopback (VERDICT r3 #4): drives
    EmbeddingService.submit in-process and reports observed coalesced
    device-batch sizes. With many concurrent single-window producers the
    micro-batcher must actually coalesce (mean batch > 1) and every
    request must round-trip."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from bench_serving import _BatchRecorder, run_load_loopback

    recorder = _BatchRecorder(service.extractor)
    orig, service.extractor = service.extractor, recorder
    try:
        res = run_load_loopback(
            service, recorder, n_clients=8, n_requests=6,
            windows_per_req=1, window_samples=48000,
            rng=np.random.RandomState(2),
        )
    finally:
        service.extractor = orig
    assert res["clients"] == 8
    assert res["aggregate_clips_per_sec"] > 0
    assert res["p95_ms"] >= res["p50_ms"] > 0
    # 8 closed-loop producers against a 20 ms coalescing window on a
    # slow CPU tower: batching must occur.
    assert res["device_batches"] < 48
    assert res["mean_coalesced_batch"] > 1
    assert res["max_coalesced_batch"] <= 32


def test_embed_windows_async_matches_sync(service):
    """embed_windows_async (the pipelined service's dispatch path) is a
    lazy handle over the identical computation: materializing it must
    equal embed_windows bit-for-bit, including non-bucket batch sizes."""
    ex = service.extractor
    rng = np.random.RandomState(3)
    for n in (1, 3, 16, 17):
        w = rng.randn(n, 48000).astype(np.float32) * 0.1
        lazy = ex.embed_windows_async(w)
        assert lazy.shape == (n, 350)
        np.testing.assert_array_equal(np.asarray(lazy), ex.embed_windows(w))


def test_pipeline_depth_overlap_and_sync_mode(service):
    """pipeline_depth > 1 keeps dispatch ahead of collection without
    reordering or corrupting scatter; depth=1 (synchronous) produces the
    same results."""
    ex = service.extractor
    rng = np.random.RandomState(4)
    inputs = [rng.randn(n, 48000).astype(np.float32) * 0.1
              for n in (2, 1, 3, 1, 2, 4, 1, 1)]
    want = [ex.embed_windows(w) for w in inputs]
    for depth in (1, 3):
        with EmbeddingService(ex, max_batch_size=4, max_latency_ms=5,
                              pipeline_depth=depth) as svc:
            futs = [svc.submit(w) for w in inputs]
            for f, w, expect in zip(futs, inputs, want):
                got = f.result(timeout=120)
                assert got.shape == (w.shape[0], 350)
                np.testing.assert_allclose(got, expect, rtol=1e-5,
                                           atol=1e-6)


def test_loopback_staged_device_mode(service):
    """bench_serving --staged-device: coalesced batches run on
    pre-staged device windows with scalar-fetch sync; every request
    still resolves with correctly-shaped rows and batch sizes are
    recorded (the relay-byte-excluded ceiling measurement)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from bench_serving import _BatchRecorder, run_load_loopback

    recorder = _BatchRecorder(service.extractor, staged=True)
    with EmbeddingService(recorder, max_batch_size=8, max_latency_ms=10,
                          pipeline_depth=2) as svc:
        res = run_load_loopback(
            svc, recorder, n_clients=4, n_requests=5,
            windows_per_req=2, window_samples=48000,
            rng=np.random.RandomState(5),
        )
    assert res["aggregate_clips_per_sec"] > 0
    assert res["mean_coalesced_batch"] >= 2
    # Staged inputs upload once per bucket, not per batch.
    assert set(recorder._staged) <= {2, 4, 8, 16}


def test_bench_serving_ceiling_and_artifact(service, tmp_path):
    """bench_serving --ceiling measures the raw extraction rate on the
    same extractor the sweep used (the internally-consistent denominator
    ADVICE r4 #1 asked for), in both staged and unstaged recorder modes;
    the --json artifact shape is what SERVING_r*.json commits."""
    import json
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from bench_serving import _BatchRecorder, _measure_ceiling

    for staged in (False, True):
        recorder = _BatchRecorder(service.extractor, staged=staged)
        res = _measure_ceiling(recorder, batch=4, steps=2, warmup=1)
        assert res["batch"] == 4
        assert res["clips_per_sec"] > 0
        assert res["ms"] > 0
        # The ceiling leg must not flip the recorder's mode: a
        # non-staged recorder would otherwise silently serve placeholder
        # staged buffers to every later _embed_async call.
        if staged:
            assert 4 in recorder._staged
        else:
            assert recorder._staged is None

    artifact = {"dtype": "f32", "rows": [res],
                "extraction_ceiling": res}
    out = tmp_path / "serving.json"
    out.write_text(json.dumps(artifact))
    assert json.loads(out.read_text())["extraction_ceiling"]["batch"] == 4


def test_stats_snapshot_and_drain(service):
    """Observability counters (http_serve /statz backing) and the
    graceful-drain half of SIGTERM shutdown."""
    ex = service.extractor
    rng = np.random.RandomState(6)
    with EmbeddingService(ex, max_batch_size=8, max_latency_ms=5,
                          pipeline_depth=2) as svc:
        futs = [svc.submit(rng.randn(n, 48000).astype(np.float32) * 0.1)
                for n in (1, 2, 3)]
        assert svc.drain(timeout=60)
        for f in futs:
            f.result(timeout=1)  # drained == already resolved
        st = svc.stats_snapshot()
    assert st["requests"] == 3
    assert st["windows"] == 6
    assert 1 <= st["device_batches"] <= 3
    assert st["errors"] == 0
    assert st["latency_ms_p50"] > 0
    assert st["latency_ms_p95"] >= st["latency_ms_p50"]
    assert st["mean_coalesced_batch"] >= 1
    assert st["queue_depth"] == 0 and st["inflight_batches"] == 0
    assert not st["closed"]


def test_streaming_matches_file_path(service):
    """StreamingEmbedder fed arbitrary-size chunks must reproduce the
    file extraction path row-for-row (embed/stream.py; the reference
    can only embed complete files, reference features.py:256-306)."""
    from l3embedding_tpu.embed import StreamingEmbedder, frame_uniform

    ex = service.extractor
    rng = np.random.RandomState(7)
    audio = (rng.randn(int(3.7 * ex.sr)) * 0.1).astype(np.float32)

    stream = StreamingEmbedder(ex)
    rows = []
    i = 0
    while i < len(audio):
        n = int(rng.randint(1000, 60000))
        out = stream.feed(audio[i:i + n])
        assert out.ndim == 2
        rows.append(out)
        i += n
    rows.append(stream.flush())
    got = np.concatenate([r for r in rows if r.size], axis=0)

    want = ex.embed_audio(audio)
    assert got.shape == want.shape == (len(frame_uniform(audio, ex.sr)),
                                       350)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Memory stays bounded at ~1 window regardless of stream length.
    assert len(stream._buf) <= stream.frame_length
    assert stream.windows_emitted == len(want)


def test_streaming_short_and_empty_streams(service):
    """Streams shorter than one window emit their single centered
    zero-padded window at flush() — including the empty stream, which
    the reference framing maps to one all-zeros window."""
    from l3embedding_tpu.embed import StreamingEmbedder

    ex = service.extractor
    rng = np.random.RandomState(8)
    short = (rng.randn(ex.sr // 2) * 0.1).astype(np.float32)

    stream = StreamingEmbedder(ex)
    assert stream.feed(short).shape == (0, 0)  # dim unknown pre-emit
    got = stream.flush()
    np.testing.assert_allclose(
        got, ex.embed_audio(short), rtol=1e-5, atol=1e-6
    )
    assert stream.flush().shape == (0, 350)  # idempotent once sealed

    empty = StreamingEmbedder(ex)
    np.testing.assert_allclose(
        empty.flush(), ex.embed_audio(np.zeros(0, np.float32)),
        rtol=1e-5, atol=1e-6,
    )


def test_streaming_hop_larger_than_window(service):
    """hop > window length (sparse sampling, e.g. one window every 2 s)
    must reproduce the file path's window starts. Regression: the
    buffer-drop arithmetic consumed samples that were never fed
    (_consumed desynced past _total), silently shifting every window
    after the first."""
    from l3embedding_tpu.embed import StreamingEmbedder

    ex = service.extractor
    rng = np.random.RandomState(9)
    audio = (rng.randn(int(5.3 * ex.sr)) * 0.1).astype(np.float32)

    stream = StreamingEmbedder(ex, hop_size=2.0)
    rows, i = [], 0
    while i < len(audio):
        n = int(rng.randint(1000, 90000))
        rows.append(stream.feed(audio[i:i + n]))
        i += n
    rows.append(stream.flush())
    got = np.concatenate([r for r in rows if r.size], axis=0)

    want = ex.embed_audio(audio, hop_size=2.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Memory still bounded even though most samples are skipped.
    assert len(stream._buf) <= stream.frame_length


def test_streaming_int_pcm_and_errors(service):
    """Integer PCM converts like the training pipeline (pcm2float);
    sealed or malformed streams fail loudly."""
    from l3embedding_tpu.embed import StreamingEmbedder

    ex = service.extractor
    rng = np.random.RandomState(9)
    pcm = (rng.randn(ex.sr + 100) * 8000).astype(np.int16)

    s_int = StreamingEmbedder(ex)
    got = s_int.feed(pcm)
    from l3embedding_tpu.data.audio_io import pcm2float

    s_f = StreamingEmbedder(ex)
    want = s_f.feed(pcm2float(pcm))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    s_int.flush()
    with pytest.raises(RuntimeError):
        s_int.feed(pcm)
    with pytest.raises(ValueError):
        StreamingEmbedder(ex).feed(np.zeros((2, 100), np.float32))
    with pytest.raises(ValueError):
        StreamingEmbedder(ex, hop_size=0.0)


def test_export_embedding_model_roundtrip(tmp_path, monkeypatch):
    """tools/export_embedding_model.py slices the audio tower out of an
    AVC checkpoint; load_exported_embedding must reproduce the original
    extractor's embeddings exactly (reference
    notebooks/extract_embedding_models_from_avc_models.ipynb role)."""
    import subprocess
    import sys

    import jax
    import numpy as np

    from l3embedding_tpu.embed.extract import (
        EmbeddingExtractor,
        load_exported_embedding,
    )
    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.training import checkpoints

    spec = build_model("tiny_L3")
    model = spec.module()
    rng = np.random.RandomState(0)
    variables = model.init(
        jax.random.PRNGKey(3),
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 1, 48000), np.float32),
        train=False,
    )
    ckpt = str(tmp_path / "model_latest.ckpt")
    checkpoints.save_variables(
        ckpt, variables["params"], variables["batch_stats"]
    )

    prefix = str(tmp_path / "exported_audio")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "export_embedding_model.py"),
         ckpt, "--model-type", "tiny_L3", "--embedding", "audio",
         "--pooling", "short", "--output", prefix],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "L3_FORCE_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(prefix + ".ckpt")
    assert os.path.exists(prefix + ".json")

    windows = (rng.randn(3, 48000) * 0.1).astype(np.float32)
    direct = EmbeddingExtractor(ckpt, "tiny_L3", "short")
    exported = load_exported_embedding(prefix)
    np.testing.assert_array_equal(
        direct.embed_windows(windows), exported.embed_windows(windows)
    )

    # Front-end export: descriptor only, no weights.
    fe_prefix = str(tmp_path / "exported_frontend")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "export_embedding_model.py"),
         ckpt, "--model-type", "tiny_L3", "--embedding", "frontend",
         "--output", fe_prefix],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "L3_FORCE_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(fe_prefix + ".json")
    assert not os.path.exists(fe_prefix + ".ckpt")


def test_extractor_fast_path_cosine():
    """fast=True (the 05 --fast flag) must produce embeddings within the
    documented cosine of the f32 parity path."""
    import numpy as np

    rng = np.random.RandomState(5)
    windows = (rng.randn(4, 48000) * 0.1).astype(np.float32)
    slow = EmbeddingExtractor(None, "tiny_L3", "short")
    # Same weights, fast tower.
    fast = EmbeddingExtractor(None, "tiny_L3", "short", fast=True)
    fast.variables = slow.variables
    a = slow.embed_windows(windows)
    b = fast.embed_windows(windows)
    assert a.shape == b.shape
    for x, y in zip(a, b):
        cos = (x @ y) / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12)
        assert cos > 0.999, cos


def test_extractor_sharded_over_mesh():
    """mesh-sharded extraction (v5e-8 serving config): identical
    embeddings to the single-device extractor, windows sharded over the
    'data' axis of the 8-device mesh."""
    import numpy as np

    from l3embedding_tpu.parallel import create_mesh

    rng = np.random.RandomState(6)
    windows = (rng.randn(20, 48000) * 0.1).astype(np.float32)

    single = EmbeddingExtractor(None, "tiny_L3", "short")
    mesh = create_mesh(jax.devices()[:8], model_axis=1)
    sharded = EmbeddingExtractor(None, "tiny_L3", "short", mesh=mesh)
    # Same weights (inits share the seed, but be explicit).
    sharded_vars = jax.device_get(single.variables)
    from l3embedding_tpu.parallel import replicate

    sharded.variables = replicate(sharded_vars, mesh)

    a = single.embed_windows(windows)
    b = sharded.embed_windows(windows)
    assert a.shape == b.shape == (20, a.shape[1])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestHTTPServing:
    """stdlib HTTP front over the micro-batching service
    (embed/http_serve.py)."""

    @pytest.fixture(scope="class")
    def server(self):
        from l3embedding_tpu.embed.http_serve import (
            make_server,
            serve_forever_in_thread,
        )

        ex = EmbeddingExtractor(None, "tiny_L3", "original")
        srv = make_server(ex, host="127.0.0.1", port=0, max_latency_ms=20)
        serve_forever_in_thread(srv)
        yield srv, ex
        srv.shutdown()
        srv.l3_service.close()

    def _url(self, srv, path):
        host, port = srv.server_address
        return f"http://{host}:{port}{path}"

    def test_healthz(self, server):
        import json
        import urllib.request

        srv, _ = server
        with urllib.request.urlopen(self._url(srv, "/healthz")) as r:
            body = json.load(r)
        assert body["status"] == "ok"
        assert body["model_type"] == "tiny_L3"
        assert body["dim"] == 350
        assert body["sr"] == 48000

    def test_embed_json_matches_direct(self, server):
        import json
        import urllib.request

        srv, ex = server
        rng = np.random.RandomState(7)
        audio = (rng.randn(48000 * 2) * 0.1).astype(np.float32)
        req = urllib.request.Request(
            self._url(srv, "/v1/embed"),
            data=json.dumps(
                {"audio": audio.tolist(), "hop": 0.5}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.load(r)
        got = np.asarray(body["embeddings"], np.float32)

        from l3embedding_tpu.embed.extract import frame_uniform

        direct = ex.embed_windows(frame_uniform(audio, hop_size=0.5))
        assert body["dim"] == direct.shape[1]
        assert got.shape == direct.shape
        np.testing.assert_allclose(got, direct, rtol=1e-4, atol=1e-5)

    def test_embed_windows_raw_roundtrip(self, server):
        import urllib.request

        srv, ex = server
        rng = np.random.RandomState(8)
        w = (rng.randn(3, 48000) * 0.1).astype(np.float32)
        req = urllib.request.Request(
            self._url(srv, "/v1/embed_windows"),
            data=w.astype("<f4").tobytes(),
            headers={
                "Content-Type": "application/octet-stream",
                "X-Num-Windows": "3",
            },
        )
        with urllib.request.urlopen(req) as r:
            dim = int(r.headers["X-Embedding-Dim"])
            blob = r.read()
        got = np.frombuffer(blob, "<f4").reshape(3, dim)
        direct = ex.embed_windows(w)
        np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-6)

    def _post(self, srv, path, data=b"", headers=None):
        import urllib.request

        req = urllib.request.Request(
            self._url(srv, path), data=data, headers=headers or {}
        )
        return urllib.request.urlopen(req)

    def test_stream_session_matches_file_path(self, server):
        """/v1/stream/{open,feed,flush}: feeding a finite stream chunk
        by chunk over HTTP yields the same rows as /v1/embed on the
        whole clip (embed/stream.py semantics)."""
        import json

        srv, ex = server
        rng = np.random.RandomState(11)
        audio = (rng.randn(int(2.3 * 48000)) * 0.1).astype(np.float32)

        with self._post(srv, "/v1/stream/open",
                        json.dumps({"hop": 0.5}).encode()) as r:
            opened = json.load(r)
        sid = opened["stream_id"]
        assert opened["dim"] == 350 and opened["sr"] == 48000

        rows, i = [], 0
        while i < len(audio):
            n = int(rng.randint(5000, 50000))
            with self._post(srv, f"/v1/stream/{sid}/feed",
                            audio[i:i + n].astype("<f4").tobytes()) as r:
                k = int(r.headers["X-Num-Windows"])
                blob = r.read()
            rows.append(np.frombuffer(blob, "<f4").reshape(k, -1)
                        if blob else np.zeros((0, 350), np.float32))
            assert k == rows[-1].shape[0]
            i += n
        with self._post(srv, f"/v1/stream/{sid}/flush") as r:
            blob = r.read()
            if blob:
                rows.append(np.frombuffer(blob, "<f4").reshape(
                    int(r.headers["X-Num-Windows"]), -1))
        got = np.concatenate([r for r in rows if r.size], axis=0)

        from l3embedding_tpu.embed.extract import frame_uniform

        want = ex.embed_windows(frame_uniform(audio, hop_size=0.5))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        # The session is gone after flush: further feeds are 404.
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(srv, f"/v1/stream/{sid}/feed", b"\x00" * 8)
        assert ei.value.code == 404

    def test_stream_unknown_id_and_bad_body(self, server):
        import urllib.error

        srv, _ = server
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(srv, "/v1/stream/nope/feed", b"\x00" * 8)
        assert ei.value.code == 404

        with self._post(srv, "/v1/stream/open") as r:  # empty body: ok
            import json

            sid = json.load(r)["stream_id"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(srv, f"/v1/stream/{sid}/feed", b"\x00" * 7)
        assert ei.value.code == 400  # not a multiple of 4
        with self._post(srv, f"/v1/stream/{sid}/flush") as r:
            assert int(r.headers["X-Num-Windows"]) == 1  # empty stream

    def test_stream_robustness_empty_feed_flush_body_and_bad_hop(
            self, server):
        """Protocol edge cases on one keep-alive connection: an empty
        feed chunk is a no-op (silence gap from a live-capture client),
        a flush sent with a non-empty body must not desync the
        connection (the body is drained before replying), and a
        non-finite hop is a 400 client error — not a 503, which a load
        balancer would read as backend-unhealthy."""
        import http.client
        import json

        srv, _ = server
        host, port = srv.server_address
        conn = http.client.HTTPConnection(host, port, timeout=30)
        try:
            conn.request("POST", "/v1/stream/open", b"",
                         {"Content-Length": "0"})
            r = conn.getresponse()
            assert r.status == 200
            sid = json.loads(r.read())["stream_id"]

            # Empty chunk: 200 with zero windows, session stays open.
            conn.request("POST", f"/v1/stream/{sid}/feed", b"",
                         {"Content-Length": "0"})
            r = conn.getresponse()
            assert r.status == 200
            assert int(r.headers["X-Num-Windows"]) == 0
            assert r.read() == b""

            # Flush WITH a (mistaken) body: the server must drain it,
            # or the next request on this connection reads PCM bytes as
            # a request line.
            stray = np.zeros(1000, "<f4").tobytes()
            conn.request("POST", f"/v1/stream/{sid}/flush", stray)
            r = conn.getresponse()
            assert r.status == 200
            r.read()

            # Same connection still usable: keep-alive not desynced.
            conn.request("GET", "/healthz")
            r = conn.getresponse()
            assert r.status == 200
            assert json.loads(r.read())["status"] == "ok"
        finally:
            conn.close()

        # Infinite hop (JSON 1e999 → inf): 400, not 503/500.
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(srv, "/v1/stream/open", b'{"hop": 1e999}')
        assert ei.value.code == 400

        # Oversized open body: rejected by the shared size cap, not
        # buffered into memory.
        import http.client as hc

        conn = hc.HTTPConnection(host, port, timeout=30)
        try:
            conn.putrequest("POST", "/v1/stream/open")
            conn.putheader("Content-Length", str((1 << 30) + 1))
            conn.endheaders()
            r = conn.getresponse()
            assert r.status == 400
        finally:
            conn.close()

    def test_concurrent_streams_coalesce(self, server):
        """Two interleaved sessions stay independent (and their windows
        ride the same micro-batching service as one-shot requests)."""
        import json

        srv, ex = server
        rng = np.random.RandomState(12)
        clips = [(rng.randn(48000 + 4800 * 3) * 0.1).astype(np.float32)
                 for _ in range(2)]
        sids = []
        for _ in clips:
            with self._post(srv, "/v1/stream/open") as r:
                sids.append(json.load(r)["stream_id"])
        rows = [[], []]
        for start in range(0, len(clips[0]), 9600):
            for j, sid in enumerate(sids):
                chunk = clips[j][start:start + 9600]
                with self._post(srv, f"/v1/stream/{sid}/feed",
                                chunk.astype("<f4").tobytes()) as r:
                    k = int(r.headers["X-Num-Windows"])
                    if k:
                        rows[j].append(
                            np.frombuffer(r.read(), "<f4").reshape(k, -1)
                        )
        for j, sid in enumerate(sids):
            with self._post(srv, f"/v1/stream/{sid}/flush"):
                pass
            got = np.concatenate(rows[j], axis=0)
            want = ex.embed_audio(clips[j])
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_concurrent_http_clients(self, server):
        import json
        import urllib.request

        srv, ex = server
        rng = np.random.RandomState(9)
        audios = [(rng.randn(48000) * 0.1).astype(np.float32)
                  for _ in range(6)]
        results = [None] * len(audios)

        def worker(i):
            req = urllib.request.Request(
                self._url(srv, "/v1/embed"),
                data=json.dumps({"audio": audios[i].tolist()}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                results[i] = np.asarray(
                    json.load(r)["embeddings"], np.float32
                )

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(audios))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, audio in enumerate(audios):
            from l3embedding_tpu.embed.extract import frame_uniform

            direct = ex.embed_windows(frame_uniform(audio))
            np.testing.assert_allclose(
                results[i], direct, rtol=1e-4, atol=1e-5
            )

    def test_concurrent_burst_no_connection_resets(self, server):
        """A 32-client simultaneous connect burst must not shed
        connections: socketserver's default listen backlog is 5, which
        reset clients under exactly the load micro-batched serving
        exists for (make_server pins request_queue_size=128)."""
        import urllib.request

        srv, ex = server
        n = 32
        payload = np.zeros((1, 48000), np.float32).tobytes()
        errors = []
        start = threading.Barrier(n)

        def worker(i):
            start.wait()
            req = urllib.request.Request(
                self._url(srv, "/v1/embed_windows"),
                data=payload,
                headers={"Content-Type": "application/octet-stream",
                         "X-Num-Windows": "1"},
            )
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()
            except Exception as e:
                errors.append(repr(e))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:5]

    def test_get_with_body_drains_on_keepalive(self, server):
        """A GET carrying a body on a keep-alive connection must not
        leave unread bytes to be parsed as the next request line
        (_read_body's invariant now holds for GETs too)."""
        import http.client

        srv, ex = server
        host, port = srv.server_address[0], srv.server_address[1]
        conn = http.client.HTTPConnection(host, port, timeout=120)
        try:
            conn.request("GET", "/healthz", body=b"{\"stray\": 1}")
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
            # The next request on the SAME connection must parse cleanly.
            conn.request("GET", "/statz")
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
        finally:
            conn.close()

    def test_http11_keepalive_connection_reuse(self, server):
        """The server speaks HTTP/1.1 with Content-Length on every
        reply, so one TCP connection serves many requests (closed-loop
        clients would otherwise pay a reconnect per clip)."""
        import http.client

        srv, ex = server
        host, port = srv.server_address[0], srv.server_address[1]
        conn = http.client.HTTPConnection(host, port, timeout=120)
        payload = np.zeros((1, 48000), np.float32).tobytes()
        try:
            for _ in range(3):
                conn.request(
                    "POST", "/v1/embed_windows", body=payload,
                    headers={"Content-Type": "application/octet-stream",
                             "X-Num-Windows": "1"},
                )
                resp = conn.getresponse()
                assert resp.status == 200
                assert resp.version == 11
                body = resp.read()
                assert len(body) == int(resp.headers["Content-Length"])
        finally:
            conn.close()

    def test_error_reply_closes_keepalive_connection(self, server):
        """ADVICE r3: an error reply sent before the request body was
        consumed (here: X-Num-Windows <= 0 raises before _read_body)
        leaves unread body bytes on a keep-alive connection; the next
        request would parse those bytes as a request line. The server
        must announce+perform a connection close on every error reply,
        and a fresh connection must work normally afterwards."""
        import http.client

        srv, _ = server
        host, port = srv.server_address[0], srv.server_address[1]
        payload = np.zeros((1, 48000), np.float32).tobytes()
        conn = http.client.HTTPConnection(host, port, timeout=120)
        try:
            conn.request(
                "POST", "/v1/embed_windows", body=payload,
                headers={"Content-Type": "application/octet-stream",
                         "X-Num-Windows": "0"},  # error BEFORE body read
            )
            resp = conn.getresponse()
            assert resp.status == 400
            assert resp.headers.get("Connection", "").lower() == "close"
            resp.read()
            # The server hung up: reusing the connection must fail (the
            # stdlib client auto-reconnects, so probe the raw socket).
            with pytest.raises(
                (http.client.HTTPException, ConnectionError, OSError)
            ):
                conn.send(b"GET /healthz HTTP/1.1\r\n")
                conn.sock.settimeout(5)
                if conn.sock.recv(1) == b"":
                    raise ConnectionError("server closed the connection")
        finally:
            conn.close()
        # And a new connection still round-trips a good request.
        conn = http.client.HTTPConnection(host, port, timeout=120)
        try:
            conn.request(
                "POST", "/v1/embed_windows", body=payload,
                headers={"Content-Type": "application/octet-stream",
                         "X-Num-Windows": "1"},
            )
            assert conn.getresponse().status == 200
        finally:
            conn.close()

    def test_statz_endpoint(self, server):
        """GET /statz reports the service's live counters + latency
        percentiles (serving observability; the reference has none)."""
        import json
        import urllib.request

        srv, _ = server
        # Ensure at least one served request before reading stats.
        payload = np.zeros((2, 48000), np.float32).tobytes()
        req = urllib.request.Request(
            self._url(srv, "/v1/embed_windows"), data=payload,
            headers={"Content-Type": "application/octet-stream",
                     "X-Num-Windows": "2"},
        )
        with urllib.request.urlopen(req) as r:
            r.read()
        with urllib.request.urlopen(self._url(srv, "/statz")) as r:
            st = json.load(r)
        assert st["requests"] >= 1
        assert st["windows"] >= 2
        assert st["device_batches"] >= 1
        assert st["latency_ms_p50"] > 0
        assert st["pipeline_depth"] >= 1
        assert st["closed"] is False

    def test_error_paths(self, server):
        import urllib.error
        import urllib.request

        srv, _ = server
        # Bad JSON → 400 with an error body, not a dead thread.
        req = urllib.request.Request(
            self._url(srv, "/v1/embed"),
            data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        # Wrong byte count on the raw endpoint.
        req = urllib.request.Request(
            self._url(srv, "/v1/embed_windows"),
            data=b"\x00" * 16,
            headers={"X-Num-Windows": "2"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        # Unknown path → 404.
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(self._url(srv, "/nope"))
        assert ei.value.code == 404


def test_closed_service_fails_requests_instead_of_hanging():
    """submit() after close, and items still queued at close, must
    resolve with an error — their callers are blocked in
    Future.result() and would otherwise hang forever."""
    from concurrent.futures import Future

    ex = EmbeddingExtractor(None, "tiny_L3", "original")
    svc = EmbeddingService(ex, max_batch_size=4, max_latency_ms=5)
    svc.close()

    fut = svc.submit(np.zeros((1, 48000), np.float32))
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=5)

    # An orphaned queued item (enqueued concurrently with close) is
    # failed by the close-side drain rather than left pending.
    orphan = Future()
    svc._q.put((np.zeros((1, 48000), np.float32), orphan))
    svc.close()
    with pytest.raises(RuntimeError, match="closed before serving"):
        orphan.result(timeout=5)


def test_submit_close_race_every_future_resolves():
    """Stress the submit()/close() window: with the submit lock, every
    future returned by submit() must resolve (result OR error) — no
    caller may be left blocked forever on an enqueued-after-drain
    request (the pre-fix race)."""
    import threading

    ex = EmbeddingExtractor(None, "tiny_L3", "original")
    for _ in range(5):
        svc = EmbeddingService(ex, max_batch_size=8, max_latency_ms=1)
        futures = []
        flock = threading.Lock()
        start = threading.Barrier(5)

        def spam():
            start.wait()
            for _ in range(20):
                f = svc.submit(np.zeros((1, 48000), np.float32))
                with flock:
                    futures.append(f)

        threads = [threading.Thread(target=spam) for _ in range(4)]
        for t in threads:
            t.start()
        start.wait()
        svc.close()
        for t in threads:
            t.join()
        for f in futures:
            # Either served or failed-with-closed — never hanging.
            try:
                f.result(timeout=10)
            except RuntimeError:
                pass


def test_http_serve_cli_sigterm_graceful_shutdown(tmp_path):
    """The serving CLI drains and exits 0 on SIGTERM (what an
    orchestrator sends before SIGKILL), mirroring the training loop's
    preemption handling."""
    import signal
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    # Pick a free port.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "L3_FORCE_PLATFORM": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, "-m", "l3embedding_tpu.embed.http_serve",
         "--model-type", "tiny_L3", "--pooling", "short",
         "--port", str(port), "--max-latency-ms", "5"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        deadline = time.time() + 300
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server died early:\n{proc.stdout.read()[-2000:]}"
                )
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    up = r.status == 200
                    break
            except Exception:
                time.sleep(1.0)
        assert up, "server never came up"
        # One real request so shutdown stats are non-trivial.
        w = np.zeros((1, 48000), np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embed_windows", data=w.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Num-Windows": "1"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            r.read()

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out[-2000:]
        assert "shutdown complete" in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_service_extractor_failure_fails_futures_not_threads():
    """A raising extractor (device error, bad input) must fail that
    batch's futures — in the dispatch path AND in the collect path —
    while later requests keep being served and /statz counts the
    errors."""

    class FlakyExtractor:
        """Duck-typed extractor: async handle whose materialization can
        fail (collect-path error) or whose dispatch fails outright."""

        sr = 48000

        def __init__(self):
            self.fail_dispatch = False
            self.fail_collect = False

        def embed_windows_async(self, windows):
            if self.fail_dispatch:
                raise RuntimeError("boom at dispatch")
            n = windows.shape[0]
            fail = self.fail_collect

            class Handle:
                shape = (n, 4)

                def __array__(self, dtype=None, copy=None):
                    if fail:
                        raise RuntimeError("boom at collect")
                    return np.ones((n, 4), np.float32)

            return Handle()

    ex = FlakyExtractor()
    with EmbeddingService(ex, max_batch_size=4, max_latency_ms=2,
                          pipeline_depth=2) as svc:
        w = np.zeros((1, 48000), np.float32)
        # Healthy request round-trips.
        assert svc.embed(w).shape == (1, 4)

        ex.fail_dispatch = True
        with pytest.raises(RuntimeError, match="boom at dispatch"):
            svc.submit(w).result(timeout=30)
        ex.fail_dispatch = False

        ex.fail_collect = True
        with pytest.raises(RuntimeError, match="boom at collect"):
            svc.submit(w).result(timeout=30)
        ex.fail_collect = False

        # The worker/collector survived both failures.
        assert svc.embed(w).shape == (1, 4)
        assert svc.drain(timeout=30)
        st = svc.stats_snapshot()
    assert st["errors"] == 2
    assert st["requests"] == 4


def test_mixed_width_submits_fail_batch_not_thread(service):
    """Mismatched window widths coalesced into one batch must fail THOSE
    futures (np.concatenate raises) and leave the dispatcher alive for
    every later request — previously the ValueError killed the
    dispatcher thread and all subsequent submits hung forever."""
    sr = service.extractor.sr
    futs = [
        service.submit(np.zeros((1, sr), np.float32)),
        service.submit(np.zeros((1, sr // 2), np.float32)),
    ]
    # At least the mismatched one fails; depending on coalescing both may.
    outcomes = []
    for f in futs:
        try:
            outcomes.append(("ok", f.result(timeout=30).shape))
        except ValueError as e:
            outcomes.append(("err", str(e)[:40]))
    assert any(kind == "err" for kind, _ in outcomes), outcomes
    # The service must still work after the failed batch.
    emb = service.embed(np.zeros((2, sr), np.float32))
    assert emb.shape[0] == 2


def test_cancelled_future_does_not_poison_batch(service):
    """A caller cancelling its future mid-flight must not make the
    collector's set_result raise into the batch-wide error path and
    fail the OTHER requests coalesced with it."""
    sr = service.extractor.sr
    n_ok = 0
    for _ in range(5):  # several rounds to land a cancel in a shared batch
        futs = [service.submit(np.zeros((1, sr), np.float32))
                for _ in range(6)]
        futs[0].cancel()
        for f in futs[1:]:
            out = f.result(timeout=30)  # raises if poisoned
            assert out.shape[0] == 1
            n_ok += 1
    assert n_ok == 25
