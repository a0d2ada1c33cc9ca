#!/usr/bin/env python
"""Serving SLOs: p50/p95 latency + aggregate clips/sec of the HTTP
embedding service under N concurrent clients (VERDICT r2 #8).

Starts embed/http_serve in-process with a resident extractor, fires N
closed-loop clients at /v1/embed_windows (raw float32, one 1 s clip per
request by default), and sweeps N to find where micro-batching saturates
the chip vs the batch-128 extraction ceiling (bench.py --mode extract).
This is the serving replacement for the reference's per-file
predict/session pattern (reference data/usc/features.py:166-221).

    python tools/bench_serving.py --clients 1,4,16,64 --requests 50
    python tools/bench_serving.py --fast          # bf16 tower

Numbers land in docs/DESIGN.md. On this dev image, request payloads ride
the ~30 MB/s tunnel relay (192 KB/clip ≈ 6 ms), so absolute latencies
carry a transfer floor a production host does not have; the saturation
shape and aggregate-throughput numbers are the meaningful part.

--loopback (VERDICT r3 #4) bypasses HTTP entirely: N in-process producer
threads drive `EmbeddingService.submit` directly with pre-staged
windows, so the sweep measures the service stack's true ceiling (queue +
micro-batching + resident extractor) with ingress excluded, and reports
the observed coalesced device-batch sizes. --int8 runs the sweep on the
quantized tower (synthetic amax calibration — throughput shape only).

    python tools/bench_serving.py --loopback --clients 1,8,64,128
    python tools/bench_serving.py --loopback --int8 --clients 64,128

--staged-device (implies --loopback) additionally excludes the per-batch
relay bytes this dev image suffers (window upload rides a ~30 MB/s
tunnel — 24.6 MB per 128-batch ≈ 0.8 s, two orders above the compute; a
production PCIe host moves it in ~2 ms): each coalesced batch's windows
are swapped for a pre-staged device-resident buffer of the same bucket
size and results sync with a 4-byte scalar fetch. What remains measured
is exactly the service stack — queue, coalescing decisions, host concat,
dispatch, device compute, pipelining — i.e. whether the machinery can
saturate the chip when transport isn't the limit.

    python tools/bench_serving.py --staged-device --int8 \\
        --max-batch-size 512 --windows-per-request 32 --clients 4,16,64
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _ScalarSynced:
    """Lazy result handle for --staged-device: materialization waits for
    the device batch with a 4-byte scalar fetch (the tunnel-safe sync —
    jax.block_until_ready is unreliable through the relay) instead of
    pulling the full embedding buffer through the ~30 MB/s relay, then
    hands back correctly-shaped placeholder rows."""

    def __init__(self, emb, n):
        self._emb = emb
        self._n = n

    def __array__(self, dtype=None, copy=None):
        float(self._emb.ravel()[0])  # device-side slice: 4-byte sync
        out = np.zeros((self._n, int(self._emb.shape[-1])), np.float32)
        return out if dtype is None else out.astype(dtype)


class _BatchRecorder:
    """Extractor proxy that records every device-batch size the service
    worker coalesces (before the extractor's own bucket padding), so the
    loopback sweep can report how close micro-batching gets to
    max_batch under load.

    staged=True swaps each batch's windows for a pre-staged
    device-resident buffer of the same bucket size (uploaded once) and
    returns _ScalarSynced handles, excluding the dev tunnel's per-batch
    relay bytes from the measurement (see module docstring)."""

    def __init__(self, extractor, staged=False):
        self._extractor = extractor
        self.sizes = []
        self._staged = {} if staged else None
        self._rng = np.random.RandomState(123)

    def __getattr__(self, name):
        return getattr(self._extractor, name)

    def _staged_input(self, bucket):
        import jax

        dev = self._staged.get(bucket)
        if dev is None:
            quantized = hasattr(self._extractor, "q")
            shape = ((bucket, self._extractor.sr) if quantized
                     else (bucket, 1, self._extractor.sr))
            dev = self._staged[bucket] = jax.device_put(
                (self._rng.randn(*shape) * 0.1).astype(np.float32)
            )
        return dev

    def _embed_async(self, windows):
        if self._staged is None:
            return self._extractor.embed_windows_async(windows)
        from l3embedding_tpu.embed.extract import _bucket

        n = int(windows.shape[0])
        ex = self._extractor
        dev = self._staged_input(_bucket(n))
        if hasattr(ex, "q"):  # quantized tower: direct jitted call
            emb = ex.q._embed_fn(ex.q._act_scales, dev)
        else:
            emb = ex._fn(ex.variables, dev)
        return _ScalarSynced(emb, n)

    def embed_windows_async(self, windows):
        self.sizes.append(int(windows.shape[0]))
        return self._embed_async(windows)

    def embed_windows(self, windows):
        self.sizes.append(int(windows.shape[0]))
        return np.asarray(self._embed_async(windows))

    def snapshot(self):
        sizes, self.sizes = self.sizes, []
        return sizes


def run_load_loopback(service, recorder, n_clients, n_requests,
                      windows_per_req, window_samples, rng):
    """Closed-loop producers against EmbeddingService.submit — no HTTP,
    no sockets, no tunnel ingress. Latency is submit→result per request;
    aggregate clips/s is total clips over the wall time of the whole
    sweep."""
    payloads = [
        np.ascontiguousarray(
            rng.randn(windows_per_req, window_samples).astype(np.float32)
            * 0.1
        )
        for _ in range(4)
    ]
    latencies = [[] for _ in range(n_clients)]
    errors = []
    start = threading.Barrier(n_clients + 1)

    def client(idx):
        start.wait()
        for i in range(n_requests):
            t0 = time.perf_counter()
            try:
                service.submit(payloads[(idx + i) % len(payloads)]).result()
            except Exception as e:  # pragma: no cover
                errors.append(repr(e))
                return
            latencies[idx].append(time.perf_counter() - t0)

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    for t in threads:
        t.start()
    recorder.snapshot()  # drop warmup-era batch sizes
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    if errors:
        raise RuntimeError(f"{len(errors)} client errors: {errors[:3]}")
    lat = np.concatenate([np.asarray(l) for l in latencies])
    total_clips = n_clients * n_requests * windows_per_req
    batches = recorder.snapshot()
    return {
        "clients": n_clients,
        "requests_per_client": n_requests,
        "windows_per_request": windows_per_req,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "aggregate_clips_per_sec": round(total_clips / wall, 2),
        "device_batches": len(batches),
        "mean_coalesced_batch": round(float(np.mean(batches)), 1)
        if batches else 0,
        "max_coalesced_batch": max(batches) if batches else 0,
    }


def run_load(port, n_clients, n_requests, windows_per_req, window_samples,
             rng):
    url = f"http://127.0.0.1:{port}/v1/embed_windows"
    payloads = [
        np.ascontiguousarray(
            rng.randn(windows_per_req, window_samples).astype(np.float32)
            * 0.1
        ).tobytes()
        for _ in range(4)
    ]
    latencies = [[] for _ in range(n_clients)]
    errors = []
    start = threading.Barrier(n_clients + 1)

    def client(idx):
        start.wait()
        for i in range(n_requests):
            req = urllib.request.Request(
                url,
                data=payloads[(idx + i) % len(payloads)],
                headers={
                    "Content-Type": "application/octet-stream",
                    "X-Num-Windows": str(windows_per_req),
                },
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()
            except Exception as e:  # pragma: no cover
                errors.append(repr(e))
                return
            latencies[idx].append(time.perf_counter() - t0)

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    if errors:
        raise RuntimeError(f"{len(errors)} client errors: {errors[:3]}")
    lat = np.concatenate([np.asarray(l) for l in latencies])
    total_clips = n_clients * n_requests * windows_per_req
    return {
        "clients": n_clients,
        "requests_per_client": n_requests,
        "windows_per_request": windows_per_req,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "aggregate_clips_per_sec": round(total_clips / wall, 2),
    }


def _measure_ceiling(recorder, batch, steps=20, warmup=3):
    """Raw extraction rate of the SAME extractor/session the sweep used:
    pre-staged device-resident input at `batch`, jitted fn called
    directly (no service), scalar-fetch sync (tunnel-safe), dispatch
    amortized over `steps` calls. This is the denominator for the
    service-stack ratio — measuring it here removes the run-to-run
    spread of comparing against a ceiling from another session
    (ADVICE r4 #1)."""
    ex = recorder._extractor
    # Borrow the staged-input helper without flipping a non-staged
    # recorder into staged mode for good (that would silently reroute
    # any later _embed_async through the placeholder path).
    saved = recorder._staged
    if recorder._staged is None:  # --ceiling without --staged-device
        recorder._staged = {}
    try:
        dev = recorder._staged_input(batch)
    finally:
        recorder._staged = saved
    if hasattr(ex, "q"):
        import jax

        scales = jax.device_put(ex.q._act_scales)
        fn = lambda x: ex.q._embed_fn(scales, x)  # noqa: E731
    else:
        fn = lambda x: ex._fn(ex.variables, x)  # noqa: E731
    out = None
    for _ in range(warmup):
        out = fn(dev)
    float(np.asarray(out.ravel()[0], np.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(dev)
    float(np.asarray(out.ravel()[0], np.float32))
    dt = (time.perf_counter() - t0) / steps
    return {"batch": batch, "ms": round(dt * 1e3, 2),
            "clips_per_sec": round(batch / dt, 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-type", default="cnn_L3_melspec2")
    p.add_argument("--pooling", default="short")
    p.add_argument("--fast", action="store_true", help="bf16 tower")
    p.add_argument("--int8", action="store_true",
                   help="int8 quantized tower, synthetic amax calibration "
                        "(throughput shape only — real deployments "
                        "calibrate on representative audio and gate on "
                        "the measured cosine)")
    p.add_argument("--loopback", action="store_true",
                   help="drive EmbeddingService.submit in-process "
                        "(no HTTP/ingress): the service stack's true "
                        "ceiling (VERDICT r3 #4)")
    p.add_argument("--staged-device", action="store_true",
                   help="loopback with per-batch relay bytes excluded: "
                        "coalesced batches run on pre-staged "
                        "device-resident windows and sync via a 4-byte "
                        "scalar fetch (see module docstring); implies "
                        "--loopback")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="service pipeline depth (device batches in "
                        "flight; 1 = synchronous)")
    p.add_argument("--clients", default="1,2,4,8,16,32,64")
    p.add_argument("--requests", type=int, default=30)
    p.add_argument("--windows-per-request", type=int, default=1)
    p.add_argument("--max-batch-size", type=int, default=128)
    p.add_argument("--max-latency-ms", type=float, default=5.0)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--json", dest="json_out", default=None,
                   help="write the sweep (mode + all rows + optional "
                        "same-session extraction ceiling) as one JSON "
                        "artifact, e.g. SERVING_r05.json")
    p.add_argument("--ceiling", action="store_true",
                   help="also measure the raw extraction ceiling on the "
                        "SAME extractor/session (pre-staged device input "
                        "at max-batch-size, scalar-fetch sync), so the "
                        "service/ceiling ratio is internally consistent")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))

    from l3embedding_tpu.embed.http_serve import make_server
    from l3embedding_tpu.embed.service import EmbeddingService

    if args.int8:
        from l3embedding_tpu.embed.quantized import (
            QuantizedEmbeddingExtractor,
        )

        extractor = QuantizedEmbeddingExtractor(
            None, args.model_type, args.pooling
        )
        calib_rng = np.random.RandomState(7)
        extractor.q.calibrate(
            (calib_rng.randn(48, extractor.sr) * 0.1).astype(np.float32)
        )
    else:
        from l3embedding_tpu.embed.extract import EmbeddingExtractor

        extractor = EmbeddingExtractor(
            None, args.model_type, args.pooling, fast=args.fast
        )

    if args.staged_device:
        args.loopback = True
    recorder = _BatchRecorder(extractor, staged=args.staged_device)
    server = None
    if args.loopback:
        service = EmbeddingService(
            recorder,
            max_batch_size=args.max_batch_size,
            max_latency_ms=args.max_latency_ms,
            pipeline_depth=args.pipeline_depth,
        )
    else:
        server = make_server(
            recorder, "127.0.0.1", args.port,
            max_batch_size=args.max_batch_size,
            max_latency_ms=args.max_latency_ms,
            pipeline_depth=args.pipeline_depth,
        )
        service = server.l3_service
        port = server.server_address[1]
        srv_thread = threading.Thread(target=server.serve_forever,
                                      daemon=True)
        srv_thread.start()

    rng = np.random.RandomState(0)
    mode = dict(
        model_type=args.model_type, pooling=args.pooling,
        dtype="int8" if args.int8 else ("bf16" if args.fast else "f32"),
        loopback=bool(args.loopback),
        staged_device=bool(args.staged_device),
        pipeline_depth=args.pipeline_depth,
        max_batch_size=args.max_batch_size,
    )
    try:
        # Warm every shape bucket the sweep can coalesce into (powers of
        # two up to max clients × windows, capped by max batch) by
        # driving the extractor directly — cold remote compiles take
        # minutes and would otherwise land inside a client's timed
        # request.
        max_batch = min(
            args.max_batch_size,
            max(int(x) for x in args.clients.split(","))
            * args.windows_per_request,
        )
        b = 1
        while True:
            extractor.embed_windows(
                np.zeros((b, extractor.sr), np.float32)
            )
            print(f"warmed bucket {b}", file=sys.stderr)
            if b >= max_batch:
                break
            b *= 2

        def measure(n, n_requests):
            if args.loopback:
                return run_load_loopback(
                    service, recorder, n, n_requests,
                    args.windows_per_request, extractor.sr, rng,
                )
            return run_load(port, n, n_requests,
                            args.windows_per_request, extractor.sr, rng)

        rows = []
        for n in sorted({int(x) for x in args.clients.split(",")}):
            measure(n, 3)
        for n in (int(x) for x in args.clients.split(",")):
            res = measure(n, args.requests)
            res.update(mode)
            rows.append(res)
            print(json.dumps(res), flush=True)

        artifact = dict(mode)
        artifact["rows"] = rows
        if args.ceiling:
            ceiling = _measure_ceiling(recorder, args.max_batch_size)
            ceiling.update(
                ratio_best=round(
                    max(r["aggregate_clips_per_sec"] for r in rows)
                    / ceiling["clips_per_sec"], 4,
                )
            )
            artifact["extraction_ceiling"] = ceiling
            print(json.dumps({"probe": "extraction_ceiling", **ceiling}),
                  flush=True)
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(artifact, f, indent=1)
            print(f"wrote {args.json_out}", file=sys.stderr)
    finally:
        if server is not None:
            server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
