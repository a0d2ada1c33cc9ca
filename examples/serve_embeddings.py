#!/usr/bin/env python
"""Example: run the HTTP embedding service and query it.

Starts the micro-batching embedding server in-process (tiny_L3 with
random weights by default so it runs anywhere; pass a checkpoint +
model type for the real thing), then sends a few concurrent requests
and prints the embedding shapes plus client-side throughput.

    python examples/serve_embeddings.py                      # smoke
    python examples/serve_embeddings.py model.ckpt cnn_L3_melspec2
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("model_type", nargs="?", default="tiny_L3")
    p.add_argument("--pooling", default="original")
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--clips-per-client", type=int, default=3)
    p.add_argument("--fast", action="store_true")
    args = p.parse_args()

    from l3embedding_tpu.embed.extract import EmbeddingExtractor
    from l3embedding_tpu.embed.http_serve import (
        make_server,
        serve_forever_in_thread,
    )

    extractor = EmbeddingExtractor(
        args.checkpoint, args.model_type, args.pooling, fast=args.fast
    )
    server = make_server(extractor, host="127.0.0.1", port=0)
    serve_forever_in_thread(server)
    host, port = server.server_address
    base = f"http://{host}:{port}"

    with urllib.request.urlopen(f"{base}/healthz") as r:
        print("healthz:", json.load(r))

    results = [None] * args.clients

    def client(i):
        rng = np.random.RandomState(i)  # RandomState is not thread-safe
        shapes = []
        try:
            for _ in range(args.clips_per_client):
                audio = (rng.randn(48000 * 2) * 0.1).astype(np.float32)
                req = urllib.request.Request(
                    f"{base}/v1/embed",
                    data=json.dumps({"audio": audio.tolist()}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req) as r:
                    body = json.load(r)
                shapes.append((body["num_windows"], body["dim"]))
            results[i] = shapes
        except Exception as e:  # noqa: BLE001 — report, don't mask
            results[i] = e

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(i,))
        for i in range(args.clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0

    failures = [
        (i, r) for i, r in enumerate(results) if not isinstance(r, list)
    ]
    for i, err in failures:
        print(f"  client {i} FAILED: {err!r}")
    ok = [r for r in results if isinstance(r, list)]
    total_windows = sum(n for shapes in ok for n, _ in shapes)
    print(
        f"{args.clients} concurrent clients x {args.clips_per_client} "
        f"2s clips -> {total_windows} windows in {dt:.2f}s "
        f"({total_windows / dt:.0f} windows/s through HTTP + "
        "micro-batching)"
    )
    for i, shapes in enumerate(results):
        if isinstance(shapes, list):
            print(f"  client {i}: embeddings {shapes}")

    server.shutdown()
    server.l3_service.close()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
