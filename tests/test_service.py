"""Micro-batching embedding service: concurrent requests coalesce into
device batches and results scatter back correctly."""

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
