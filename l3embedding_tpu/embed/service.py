"""In-process embedding service with request micro-batching.

The reference's closest analog is per-file Keras predict inside the
feature-generation loop; for production serving a TPU wants batched
work. `EmbeddingService` accepts concurrent single-clip (or multi-clip)
requests from any number of threads, coalesces them into device batches
(up to max_batch_size, waiting at most max_latency_ms for stragglers),
runs the resident jitted extractor, and scatters results back to the
callers' futures. Shape bucketing in the extractor keeps compilation
bounded regardless of arrival pattern.

The execution path is pipelined: a dispatcher thread coalesces requests
and *dispatches* each device batch without waiting for its results
(extractors expose `embed_windows_async`, returning a lazy device
array), and a collector thread materializes results and resolves
futures in dispatch order. With `pipeline_depth` batches in flight the
device never idles while batch k's embeddings transfer back to the
host — device→host readback overlaps batch k+1's compute. Extractors
without an async path (duck-typed stand-ins) degrade to synchronous
dispatch with unchanged semantics.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

from .extract import EmbeddingExtractor

_SENTINEL = object()


class EmbeddingService:
    def __init__(
        self,
        extractor: EmbeddingExtractor,
        max_batch_size: int = 128,
        max_latency_ms: float = 5.0,
        pipeline_depth: int = 2,
    ):
        """pipeline_depth: max device batches in flight (dispatched but
        not yet collected). 1 = fully synchronous (batch k+1 waits for
        batch k's readback); 2+ overlaps readback with compute. Each
        in-flight batch holds one result buffer on device."""
        self.extractor = extractor
        self.max_batch_size = max_batch_size
        self.max_latency = max_latency_ms / 1000.0
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._q: queue.Queue = queue.Queue()
        # Dispatched-but-uncollected batches; the bounded size is the
        # pipeline's backpressure (a full queue stalls the dispatcher,
        # not the device).
        self._results: queue.Queue = queue.Queue(maxsize=self.pipeline_depth)
        self._stop = threading.Event()
        # Serializes the stop-check+enqueue in submit() against close()
        # setting the flag: without it a thread could pass the check,
        # close() could set+drain, and the late put would enqueue a
        # future nobody ever resolves (its caller blocks forever in
        # Future.result()).
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._collector = threading.Thread(target=self._collect_loop,
                                           daemon=True)
        self._worker.start()
        self._collector.start()

    def submit(self, windows: np.ndarray) -> Future:
        """(N, 48000) float32 windows → Future[(N, dim) embeddings]."""
        windows = np.ascontiguousarray(windows, dtype=np.float32)
        if windows.ndim == 1:
            windows = windows[None, :]
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                fut.set_exception(RuntimeError("EmbeddingService is closed"))
                return fut
            self._q.put((windows, fut))
        return fut

    def embed(self, windows: np.ndarray) -> np.ndarray:
        return self.submit(windows).result()

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            count = first[0].shape[0]
            deadline = self.max_latency
            t0 = time.perf_counter()
            while count < self.max_batch_size:
                remaining = deadline - (time.perf_counter() - t0)
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                batch.append(item)
                count += item[0].shape[0]

            windows = np.concatenate([w for w, _ in batch])
            try:
                # Async dispatch: the returned handle is a lazy device
                # array (np.asarray materializes it). Stand-in extractors
                # without the async method run synchronously here — the
                # collector's np.asarray is then a no-op. Resolved per
                # batch: tests/benches swap self.extractor at runtime.
                embed_async = getattr(self.extractor, "embed_windows_async",
                                      None)
                emb = (embed_async(windows) if embed_async is not None
                       else self.extractor.embed_windows(windows))
            except Exception as e:  # pragma: no cover
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            # Bounded put: with pipeline_depth batches awaiting
            # collection this blocks, stalling coalescing rather than
            # piling uncollected results onto the device.
            self._results.put((emb, batch))

    def _collect_loop(self):
        while True:
            item = self._results.get()
            if item is _SENTINEL:
                return
            emb, batch = item
            try:
                arr = np.asarray(emb)
                start = 0
                for w, fut in batch:
                    fut.set_result(arr[start : start + w.shape[0]])
                    start += w.shape[0]
            except Exception as e:  # pragma: no cover
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def close(self):
        with self._submit_lock:
            # Under the lock: every submit() has either fully enqueued
            # (drained below) or will observe the flag and fail fast.
            self._stop.set()
        self._worker.join(timeout=10)
        self._results.put(_SENTINEL)
        self._collector.join(timeout=10)
        # Fail any dispatched-but-uncollected batches (possible only if
        # the collector died or timed out above).
        while True:
            try:
                item = self._results.get_nowait()
            except queue.Empty:
                break
            if item is _SENTINEL:
                continue
            _, batch = item
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(
                        RuntimeError("EmbeddingService closed before "
                                     "serving this request")
                    )
        # Fail any requests still queued (enqueued just before close, or
        # orphaned by a dead worker): their callers are blocked in
        # Future.result() and would otherwise hang forever.
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(
                    RuntimeError("EmbeddingService closed before serving "
                                 "this request")
                )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
