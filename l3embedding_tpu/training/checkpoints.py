"""Checkpointing: topology-independent pytree snapshots + run artifacts.

The reference keeps 4 Keras weight files per run (latest / best-val-acc /
best-val-loss / periodic; reference l3embedding/train.py:316-355). We
keep the same four roles with the same filenames (`.ckpt` instead of
`.h5`) so the CLI surface and resume logic carry over. Snapshots are
flax msgpack pytrees written atomically (tmp + rename); they restore
onto any mesh because sharding is applied at load time, not bake time.
"""

from __future__ import annotations

import os
import queue
import threading

import flax.serialization
import jax
import numpy as np

LATEST = "model_latest.ckpt"
BEST_VALID_ACC = "model_best_valid_accuracy.ckpt"
BEST_VALID_LOSS = "model_best_valid_loss.ckpt"
PERIODIC_FMT = "model_checkpoint.{epoch:02d}.ckpt"
# Mid-epoch preemption snapshots get their own file so LATEST always
# holds epoch-boundary state: a hard kill between the snapshot write and
# the preempt.json marker write must leave resume on clean epoch-boundary
# semantics, never on unmarked mid-epoch state.
PREEMPT = "model_preempt.ckpt"


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def _state_payload(state):
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def _write_atomic(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def save_state(path: str, state) -> None:
    """Atomically serialize {step, params, batch_stats, opt_state}."""
    blob = flax.serialization.to_bytes(_to_host(_state_payload(state)))
    _write_atomic(path, blob)


class AsyncCheckpointWriter:
    """Overlaps checkpoint serialization + disk writes with training.

    save() snapshots the state to host memory synchronously — this is
    required for correctness, not just latency: the train step donates
    its input state buffers, so the device arrays captured at epoch N
    are invalidated the moment step N+1 dispatches — then hands the
    msgpack encode + atomic write to a background thread. Writes are
    applied in submission order (one worker), so `model_latest.ckpt`
    never goes backwards; each file appears atomically via tmp+rename.
    A failed write re-raises on the next save()/close() rather than
    being swallowed. Use as a context manager or call close() to drain.
    """

    def __init__(self, max_pending: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._exc: BaseException | None = None
        self._closed = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                path, host_tree = item
                try:
                    _write_atomic(
                        path, flax.serialization.to_bytes(host_tree)
                    )
                except BaseException as e:  # surfaced on next save/close
                    self._exc = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def save(self, path: str, state) -> None:
        if self._closed:
            raise RuntimeError("AsyncCheckpointWriter is closed")
        self._check()
        # Synchronous device→host fetch (see class docstring), async
        # encode+write. np.asarray also decouples the snapshot from any
        # later in-place mutation of host-side leaves.
        self._q.put((path, _to_host(_state_payload(state))))

    def flush(self) -> None:
        """Block until every enqueued write is durably on disk.

        Call before publishing metadata that implies the checkpoint
        exists (e.g. the epoch's history row, removing preempt.json):
        resume reads `last history epoch` and loads model_latest.ckpt,
        so the row must never be visible while the matching LATEST write
        is still queued — a hard kill in that window would otherwise
        leave metadata pointing past the state on disk.
        """
        self._q.join()
        self._check()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._q.put(None)
        self._thread.join()
        self._check()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        # Don't mask an in-flight exception with a write error.
        if exc and exc[0] is not None:
            try:
                self.close()
            except Exception:
                pass
            return False
        self.close()
        return False


def load_state(path: str, state):
    """Restore into a template AVCTrainState (created by
    create_train_state); returns the updated state."""
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = flax.serialization.from_bytes(_to_host(template), blob)
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def save_variables(path: str, params, batch_stats) -> None:
    """Weights-only snapshot (for embedding extraction / export)."""
    blob = flax.serialization.to_bytes(
        _to_host({"params": params, "batch_stats": batch_stats})
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_variables(path: str, template_variables):
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "params": template_variables["params"],
        "batch_stats": template_variables["batch_stats"],
    }
    restored = flax.serialization.from_bytes(_to_host(template), blob)
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
