"""AVC training orchestration — the `03_train_embedding` entry point.

Same experiment-management surface as the reference train()
(reference l3embedding/train.py:218-421): model_id derived from the data
dir name, timestamped run dir, config.json with full param capture,
history_csvlog.csv, loss-history pickles, 4-role checkpoints, and
deterministic resume via --continue-model-dir.

TPU-native core: one jitted train step under pjit data parallelism on a
('data','model') mesh; BN stats sync over ICI; donated state buffers;
async host pipeline (HDF5 reads on a background thread, storage-dtype
transfer, on-device float conversion).

The `gpus` knob is accepted for CLI compatibility but is advisory only:
parallelism follows the physical device mesh (SURVEY.md §2.6).
"""

from __future__ import annotations

import collections
import contextlib
import csv
import datetime
import getpass
import json
import logging
import os
import pickle
import signal
import subprocess
import threading
import time

import jax
import numpy as np

from ..models import build_model
from ..parallel import create_mesh, replicate, shard_batch_local
from ..utils.log import init_console_logger, init_file_logger
from ..utils.tracker import JSONLTracker, NullTracker
from . import checkpoints
from .data import AsyncBatchPipeline, data_generator, single_epoch_data_generator
from .state import create_train_state
from .steps import make_eval_step, make_train_step

LOGGER = logging.getLogger("l3embedding_tpu")
LOGGER.setLevel(logging.DEBUG)

HISTORY_CSV_FIELDS = ["epoch", "acc", "loss", "val_acc", "val_loss"]

PREEMPT_FILE = "preempt.json"


def _clear_preempt_files(model_dir: str) -> None:
    """Remove the preemption marker and its snapshot, marker FIRST: the
    marker is the source of truth that a mid-epoch snapshot exists, so a
    kill between the two removals leaves no marker → safe epoch-boundary
    resume, never a marker pointing at a deleted/stale snapshot."""
    for stale in (
        os.path.join(model_dir, PREEMPT_FILE),
        os.path.join(model_dir, checkpoints.PREEMPT),
    ):
        try:
            os.remove(stale)
        except OSError:
            pass


class _PreemptionGuard:
    """SIGTERM/SIGINT → checkpoint-and-exit-cleanly flag.

    Cloud TPU workers get a SIGTERM grace window on preemption/
    maintenance; the reference's only recovery story is manual
    epoch-level resume (reference train.py:263-265 + sbatch resume
    scripts). The guard converts the signal into a step-boundary flag
    the training loop polls, so the loop saves an exact-step snapshot
    and exits 0. Handlers are installed only in the main thread (signal
    module restriction) and restored on exit.
    """

    def __init__(self, enabled: bool = True):
        self.requested = False
        self._installed: list[tuple[int, object]] = []
        if not enabled or threading.current_thread() is not threading.main_thread():
            return
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev = signal.signal(sig, self._handler)
                self._installed.append((sig, prev))
            except (ValueError, OSError):  # non-main thread / exotic env
                pass

    def _handler(self, signum, frame):
        if self.requested:
            # Second signal: the operator (or scheduler) insists — fall
            # back to the previous disposition (default: terminate).
            # Also bounds the blast radius if an early exception ever
            # skipped restore(): the handler de-installs itself here.
            self.restore()
            signal.raise_signal(signum)
            return
        LOGGER.warning(
            "Received signal %d — will checkpoint and exit at the next "
            "step boundary.", signum,
        )
        self.requested = True

    def restore(self):
        for sig, prev in self._installed:
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._installed.clear()


class _PreemptionSync:
    """Turns the process-local preemption flag into a decision every
    process takes at the SAME loop iteration.

    On a pod, SIGTERM delivery skew means one process's guard can flip
    before its step-K poll while another's flips after: breaking on the
    local flag alone would leave the late process blocked inside the
    next step's gradient psum forever (its peer never arrives), so no
    snapshot gets written at all. Instead every poll contributes the
    local flag to a one-element cross-device max (a jitted reduction
    over a ('data','model')-sharded array — XLA lowers it to an
    all-reduce), and the result is read back with a fixed lag, exactly
    like the loop's metric backpressure: by the time a value is popped
    it has long been computed, so the host sync is free, and because
    the collective gives every process the identical value sequence,
    all processes observe the first positive flag at the same poll
    index and break together. Single-process runs skip all of it and
    read the guard directly.
    """

    def __init__(self, guard, mesh, lag: int):
        self.guard = guard
        self.lag = max(1, lag)
        self._pending: collections.deque = collections.deque()
        self._mesh = None
        if mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            self._mesh = mesh
            self._sharding = NamedSharding(
                mesh, PartitionSpec(("data", "model"))
            )
            self._reduce = jax.jit(
                jax.numpy.max,
                out_shardings=NamedSharding(mesh, PartitionSpec()),
            )
            self._local = jax.local_device_count()

    def poll(self) -> bool:
        """Call at every train/eval step; True means stop NOW (all
        processes return True at the same call index)."""
        if self._mesh is None:
            return self.guard.requested
        flag = np.full(
            (self._local,), 1.0 if self.guard.requested else 0.0, np.float32
        )
        arr = jax.make_array_from_process_local_data(self._sharding, flag)
        self._pending.append(self._reduce(arr))
        if len(self._pending) > self.lag:
            return bool(float(self._pending.popleft()) > 0.0)
        return False


def get_git_commit() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=10,
            )
            .stdout.decode()
            .strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


def get_restart_info(history_path):
    """(last_epoch, last_val_acc, last_val_loss) from the history CSV
    (reference train.py:208-215)."""
    last = None
    with open(history_path) as f:
        for row in csv.DictReader(f):
            last = row
    if last is None:
        # Header-only or empty CSV (a kill/disk-full before the first
        # epoch's row landed): nothing to restore — resume degrades to a
        # fresh start instead of crashing, like every other corrupt-
        # artifact case in this loop.
        return None
    return int(last["epoch"]), float(last["val_acc"]), float(last["val_loss"])


def _resolve_run_dir(output_dir, model_id):
    """Collision-safe timestamped run dir, agreed across processes.

    Single process: the reference sleeps a random 0-10 s so parallel
    SLURM tasks don't collide on the same timestamp (reference
    classifier/train.py:523-524); we append the pid instead of sleeping.
    Multi-host: every process must agree on ONE run dir (second-boundary
    clock skew, or the collision fallback firing on some hosts, would
    otherwise scatter artifacts across dirs and make the resume hint on
    non-chief processes point at the wrong path) — the chief resolves
    the name and broadcasts it.
    """
    base = os.path.join(
        output_dir,
        "embedding",
        model_id,
        datetime.datetime.now().strftime("%Y%m%d%H%M%S"),
    )
    model_dir = base
    if jax.process_index() == 0:
        try:
            os.makedirs(model_dir)
        except FileExistsError:
            model_dir = f"{base}-{os.getpid()}"
            os.makedirs(model_dir, exist_ok=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        buf = np.zeros(4096, np.uint8)
        enc = model_dir.encode()
        buf[: len(enc)] = np.frombuffer(enc, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        model_dir = bytes(buf[buf != 0]).decode()
        os.makedirs(model_dir, exist_ok=True)
    return model_dir


def _append_history_row(path, row):
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=HISTORY_CSV_FIELDS)
        if not exists:
            w.writeheader()
        w.writerow(row)


def train(
    train_data_dir,
    validation_data_dir,
    output_dir,
    num_epochs=150,
    train_epoch_size=512,
    validation_epoch_size=1024,
    train_batch_size=64,
    validation_batch_size=64,
    model_type="cnn_L3_orig",
    random_state=20180123,
    learning_rate=1e-4,
    verbose=False,
    checkpoint_interval=10,
    log_path=None,
    disable_logging=False,
    gpus=1,
    continue_model_dir=None,
    gsheet_id=None,
    google_dev_app_name=None,
    # TPU-native extras (additive; defaults preserve reference behavior)
    prefetch_batches=4,
    use_mesh=True,
    profile_steps=0,
    compute_dtype="float32",
    accum_steps=1,
    db_batch_global=False,
    bn_mode="sync",
    async_checkpoints=True,
    handle_preemption=True,
    preempt_after_steps=None,
):
    """See module docstring. TPU-native extras beyond the reference:

    async_checkpoints: hand checkpoint serialization+writes to a
      background thread (the device→host snapshot stays synchronous —
      required, since the jitted step donates state buffers).
    handle_preemption: install SIGTERM/SIGINT handlers that save an
      exact-step snapshot + preempt.json and exit cleanly; the next
      --continue-model-dir run resumes mid-epoch at that exact batch
      (the reference can only resume at epoch boundaries).
    preempt_after_steps: fault injection — behave as if SIGTERM arrived
      after N train steps of this run (deterministic preemption tests).
    """
    params = dict(locals())  # exactly the call arguments — nothing else yet
    # Handlers are installed before ANY other work and restored on every
    # exit path: an exception during setup (bad preempt.json, missing
    # checkpoint, batch-divisibility error) must not leave SIGTERM/SIGINT
    # pointing at a flag nothing polls. A SIGTERM landing during model
    # build / first compile (minutes on a cold cache) is converted into
    # the checkpoint-at-next-step-boundary flag, not the default kill.
    guard = _PreemptionGuard(enabled=handle_preemption)
    try:
        return _train_impl(guard=guard, **params)
    finally:
        guard.restore()


def _train_impl(
    guard,
    train_data_dir,
    validation_data_dir,
    output_dir,
    num_epochs=150,
    train_epoch_size=512,
    validation_epoch_size=1024,
    train_batch_size=64,
    validation_batch_size=64,
    model_type="cnn_L3_orig",
    random_state=20180123,
    learning_rate=1e-4,
    verbose=False,
    checkpoint_interval=10,
    log_path=None,
    disable_logging=False,
    gpus=1,
    continue_model_dir=None,
    gsheet_id=None,
    google_dev_app_name=None,
    # TPU-native extras (additive; defaults preserve reference behavior)
    prefetch_batches=4,
    use_mesh=True,
    profile_steps=0,
    compute_dtype="float32",
    accum_steps=1,
    db_batch_global=False,
    bn_mode="sync",
    async_checkpoints=True,
    handle_preemption=True,
    preempt_after_steps=None,
):
    """Body of train(); `guard` is owned (installed/restored) by the
    train() wrapper so signal handlers never outlive the call."""
    if not LOGGER.handlers:
        init_console_logger(LOGGER, verbose=verbose)
        if not disable_logging:
            init_file_logger(LOGGER, log_path=log_path)
    LOGGER.debug("Initialized logging.")

    # Model id from data dir name (reference train.py:231-234).
    data_subset_name = os.path.basename(os.path.normpath(train_data_dir))
    if "_" in data_subset_name:
        data_subset_name = data_subset_name[: data_subset_name.rindex("_")]
    model_id = os.path.join(data_subset_name, model_type)

    param_dict = {
        "username": getpass.getuser(),
        "train_data_dir": train_data_dir,
        "validation_data_dir": validation_data_dir,
        "model_id": model_id,
        "output_dir": output_dir,
        "num_epochs": num_epochs,
        "train_epoch_size": train_epoch_size,
        "validation_epoch_size": validation_epoch_size,
        "train_batch_size": train_batch_size,
        "validation_batch_size": validation_batch_size,
        "model_type": model_type,
        "random_state": random_state,
        "learning_rate": learning_rate,
        "verbose": verbose,
        "checkpoint_interval": checkpoint_interval,
        "log_path": log_path,
        "disable_logging": disable_logging,
        "gpus": gpus,
        "continue_model_dir": continue_model_dir,
        "git_commit": get_git_commit(),
        "gsheet_id": gsheet_id,
        "google_dev_app_name": google_dev_app_name,
        "backend": "jax-tpu",
        "num_devices": jax.device_count(),
    }
    LOGGER.info("Training with the following arguments: %s", param_dict)

    spec = build_model(model_type)
    import jax.numpy as jnp

    model = spec.module(
        compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
        db_batch_global=db_batch_global,
    )

    if continue_model_dir:
        model_dir = continue_model_dir
        os.makedirs(model_dir, exist_ok=True)
    else:
        model_dir = _resolve_run_dir(output_dir, model_id)
    param_dict["model_dir"] = model_dir

    # Multi-host: one writer. Non-chief processes compute everything
    # (their devices hold batch shards; collectives need them) but only
    # process 0 writes run artifacts — the reference is single-process
    # so every write was implicitly "chief".
    is_chief = jax.process_index() == 0

    if is_chief:
        with open(os.path.join(model_dir, "config.json"), "w") as fd:
            json.dump(param_dict, fd, indent=2)
    # Architecture descriptor (replaces the Keras pickled spec,
    # reference train.py:306-314): everything needed to rebuild.
    if is_chief:
        with open(os.path.join(model_dir, "model.json"), "w") as fd:
            json.dump(
                {
                    "framework": "l3embedding_tpu",
                    "model_type": model_type,
                    "audio_input_shape": list(spec.audio_input_shape),
                    "video_input_shape": list(spec.video_input_shape),
                    "audio_embedding_pooling": {
                        k: list(v)
                        for k, v in spec.audio_embedding_pooling.items()
                    },
                },
                fd,
                indent=2,
            )

    # --- State ---
    mesh = create_mesh() if use_mesh else None
    state = create_train_state(
        model,
        jax.random.PRNGKey(random_state),
        spec.video_input_shape,
        spec.audio_input_shape,
        learning_rate,
    )

    initial_epoch = 0
    resume_step_in_epoch = 0
    best_val_acc = float("-inf")
    best_val_loss = float("inf")
    best_train_acc = float("-inf")
    best_train_loss = float("inf")
    if continue_model_dir is not None:
        hist_path = os.path.join(continue_model_dir, "history_csvlog.csv")
        if os.path.exists(hist_path):
            restart = get_restart_info(hist_path)
            if restart is None:
                LOGGER.warning(
                    "history CSV %s has no data rows; resuming from "
                    "epoch 0", hist_path,
                )
            else:
                last_epoch_idx, last_val_acc, last_val_loss = restart
                initial_epoch = last_epoch_idx + 1
                best_val_acc = last_val_acc
                best_val_loss = last_val_loss
        preempt_path = os.path.join(continue_model_dir, PREEMPT_FILE)
        if os.path.exists(preempt_path):
            # Mid-epoch preemption snapshot: re-enter the interrupted
            # epoch at the exact next batch (the seeded generator replays
            # deterministically; start_batch_idx fast-forwards past
            # everything the saved state already consumed).
            try:
                with open(preempt_path) as f:
                    preempt_info = json.load(f)
                int(preempt_info["epoch"])
                int(preempt_info["steps_done_in_epoch"])
            except (ValueError, KeyError, TypeError) as e:
                # Truncated/corrupt marker (e.g. a kill mid-write before
                # this code wrote markers atomically): fall back to
                # epoch-boundary resume — LATEST only ever holds
                # epoch-boundary state, so that is always safe.
                LOGGER.warning(
                    "Ignoring unparsable %s (%s); resuming at the last "
                    "completed epoch boundary.", PREEMPT_FILE, e,
                )
                _clear_preempt_files(continue_model_dir)
                preempt_info = None
            if preempt_info is not None and int(preempt_info["epoch"]) < initial_epoch:
                # Stale marker: the history CSV already records this (or
                # a later) epoch as COMPLETE — a hard kill landed in the
                # window between appending the row and removing the
                # marker. Trusting it would replay part of a finished
                # epoch onto state that already contains it. The history
                # row is only ever written after the checkpoint writes
                # are flushed, so history is the authority here.
                LOGGER.warning(
                    "Ignoring stale %s (epoch %d < next epoch %d from "
                    "history); removing it.",
                    PREEMPT_FILE, int(preempt_info["epoch"]), initial_epoch,
                )
                _clear_preempt_files(continue_model_dir)
                preempt_info = None
        else:
            preempt_info = None
        resume_ckpt = checkpoints.LATEST
        if preempt_info is not None:
            # Missing snapshot first: if the state the marker points at
            # is gone (manual cleanup), geometry mismatches are moot —
            # degrade to the safe epoch-boundary resume instead of
            # raising an error the user cannot act on.
            marker_ckpt = preempt_info.get("checkpoint", checkpoints.LATEST)
            if not os.path.exists(
                os.path.join(continue_model_dir, marker_ckpt)
            ):
                LOGGER.warning(
                    "%s references missing snapshot %s; resuming at the "
                    "last completed epoch boundary instead.",
                    PREEMPT_FILE, marker_ckpt,
                )
                _clear_preempt_files(continue_model_dir)
                preempt_info = None
        if preempt_info is not None:
            # steps_done is a PER-PROCESS batch count over a
            # process-count-specific shard layout and a specific
            # batch/epoch geometry: resuming with ANY of these changed
            # would silently misalign the start_batch_idx fast-forward
            # (replaying or skipping samples). Validate all three.
            saved_procs = int(preempt_info.get("process_count", 1))
            if saved_procs != jax.process_count():
                raise ValueError(
                    f"{PREEMPT_FILE} was written by a {saved_procs}-process"
                    f" run; resuming on {jax.process_count()} processes "
                    "would misalign the per-shard data fast-forward. "
                    "Resume on the same process count (or complete the "
                    "epoch there first)."
                )
            cur_pp_bs = train_batch_size // jax.process_count()
            saved_pp_bs = int(
                preempt_info.get("per_process_batch_size", cur_pp_bs)
            )
            if saved_pp_bs != cur_pp_bs:
                raise ValueError(
                    f"{PREEMPT_FILE} was written with per-process batch "
                    f"size {saved_pp_bs}; resuming with {cur_pp_bs} would "
                    "misalign the data fast-forward. Resume with the same "
                    "train_batch_size (or complete the epoch there first)."
                )
            saved_epoch_size = int(
                preempt_info.get("train_epoch_size", train_epoch_size)
            )
            if saved_epoch_size != train_epoch_size:
                raise ValueError(
                    f"{PREEMPT_FILE} was written with train_epoch_size "
                    f"{saved_epoch_size}; resuming with {train_epoch_size} "
                    "would misalign the data fast-forward. Resume with the "
                    "same train_epoch_size (or complete the epoch there "
                    "first)."
                )
            resume_ckpt = marker_ckpt
            initial_epoch = int(preempt_info["epoch"])
            resume_step_in_epoch = int(preempt_info["steps_done_in_epoch"])
            LOGGER.info(
                "Found %s: resuming mid-epoch %d at step %d from %s",
                PREEMPT_FILE, initial_epoch, resume_step_in_epoch,
                resume_ckpt,
            )
        state = checkpoints.load_state(
            os.path.join(continue_model_dir, resume_ckpt), state
        )
        LOGGER.info("Resuming from epoch %d", initial_epoch)

    if mesh is not None:
        state = replicate(state, mesh)

    train_step = make_train_step(
        model, accum_steps=accum_steps, bn_mode=bn_mode, mesh=mesh
    )
    eval_step = make_eval_step(model)

    if gsheet_id and is_chief:
        # Chief-only like every other artifact write: experiments.jsonl
        # and its .state.json sidecar are read-modify-write on a shared
        # filesystem — N processes appending would interleave/corrupt.
        tracker = JSONLTracker(os.path.join(model_dir, "experiments.jsonl"))
        tracker.upsert(dict(param_dict))
    else:
        tracker = NullTracker()

    # --- Data ---
    if continue_model_dir is not None:
        train_start_batch_idx = (
            train_epoch_size * initial_epoch + resume_step_in_epoch
        )
    else:
        train_start_batch_idx = None

    # Multi-host pods: each process streams a disjoint file shard of the
    # corpus and feeds only its local slice of the global batch;
    # shard_batch_local assembles the globally-sharded array. On a
    # single process (incl. v5e-8) this is exactly the reference's
    # single-stream semantics.
    proc_count = jax.process_count()
    proc_index = jax.process_index()
    if train_batch_size % proc_count:
        raise ValueError(
            f"train_batch_size {train_batch_size} not divisible by "
            f"process_count {proc_count}"
        )
    if validation_batch_size % proc_count:
        raise ValueError(
            f"validation_batch_size {validation_batch_size} not divisible "
            f"by process_count {proc_count}"
        )
    shard_kwargs = dict(shard_index=proc_index, shard_count=proc_count)

    train_gen = data_generator(
        train_data_dir,
        batch_size=train_batch_size // proc_count,
        random_state=random_state,
        start_batch_idx=train_start_batch_idx,
        **shard_kwargs,
    )

    history = {"acc": [], "loss": [], "val_acc": [], "val_loss": []}
    epoch_times, batch_times = [], []
    history_csv = os.path.join(model_dir, "history_csvlog.csv")
    history_checkpoint = os.path.join(model_dir, "history_checkpoint.pkl")

    def put(batch):
        return shard_batch_local(batch, mesh) if mesh is not None else batch

    def staged(gen):
        # Device placement inside the pipeline thread: host→device
        # transfer of batch k+1..k+prefetch overlaps the device compute
        # of batch k (jax device transfers are thread-safe and async).
        for b in gen:
            yield put(b)

    # Optional on-device profiling of the first profile_steps train steps
    # (trace lands in <model_dir>/profile; view with TensorBoard/XProf).
    profile_remaining = int(profile_steps)
    if profile_remaining > 0:
        jax.profiler.start_trace(os.path.join(model_dir, "profile"))

    saver = (
        checkpoints.AsyncCheckpointWriter()
        if (async_checkpoints and is_chief)
        else None
    )

    def save_ckpt(filename):
        if not is_chief:
            return
        path = os.path.join(model_dir, filename)
        if saver is not None:
            saver.save(path, state)
        else:
            checkpoints.save_state(path, state)

    def save_preempt_snapshot(epoch, steps_done_in_epoch):
        """Synchronous exact-step snapshot + marker, then drain.

        Crash-consistent ordering: the mid-epoch state goes to its OWN
        file (model_preempt.ckpt), and only then does the marker — the
        single source of truth that a mid-epoch snapshot exists — appear
        atomically (tmp+os.replace, via _write_atomic). LATEST is never
        overwritten here, so a SIGKILL at any point in this sequence
        leaves either (a) no marker → clean epoch-boundary resume from
        LATEST, or (b) a complete marker → exact-step resume from the
        snapshot it references. There is no window where LATEST holds
        unmarked mid-epoch state or the marker is truncated.
        """
        if saver is not None:
            saver.close()  # drain pending writes first so LATEST is last
        if is_chief:
            # Re-preemption (a marker from the previous grace window can
            # still be on disk mid-resumed-epoch): retract it BEFORE
            # overwriting the snapshot it references, or a kill between
            # the snapshot overwrite and the new marker write would
            # leave the OLD marker pointing at the NEW state — resume
            # would then fast-forward the data stream short of the
            # weights. No marker → epoch-boundary resume, always safe.
            try:
                os.remove(os.path.join(model_dir, PREEMPT_FILE))
            except OSError:
                pass
            checkpoints.save_state(
                os.path.join(model_dir, checkpoints.PREEMPT), state
            )
            marker = {
                "epoch": epoch,
                "steps_done_in_epoch": steps_done_in_epoch,
                "global_batch_idx": epoch * train_epoch_size
                + steps_done_in_epoch,
                "process_count": proc_count,
                "per_process_batch_size": train_batch_size // proc_count,
                "train_epoch_size": train_epoch_size,
                "checkpoint": checkpoints.PREEMPT,
            }
            checkpoints._write_atomic(
                os.path.join(model_dir, PREEMPT_FILE),
                json.dumps(marker).encode(),
            )
        LOGGER.warning(
            "Preempted: saved %s at epoch %d step %d; rerun with "
            "--continue-model-dir %s to resume at this exact batch.",
            checkpoints.PREEMPT, epoch, steps_done_in_epoch, model_dir,
        )

    steps_run_total = 0
    preempted = False
    # With preemption handling disabled the flag can never flip — skip
    # the per-step cross-device reduce entirely (pass mesh=None).
    psync = _PreemptionSync(
        guard,
        mesh if handle_preemption else None,
        lag=max(2, 2 * prefetch_batches),
    )

    @contextlib.contextmanager
    def _training_cleanup():
        # guard.restore() is owned by the train() wrapper's finally, so
        # handlers are released even on exceptions raised before this
        # context exists.
        try:
            yield
        finally:
            if saver is not None:
                # Idempotent: preempted runs already drained the writer
                # inside the snapshot.
                saver.close()

    with _training_cleanup(), AsyncBatchPipeline(
        staged(train_gen), prefetch=prefetch_batches
    ) as train_pipe:
        for epoch in range(initial_epoch, num_epochs):
            epoch_start = time.time()
            epoch_step_offset = (
                resume_step_in_epoch if epoch == initial_epoch else 0
            )
            steps_this_epoch = train_epoch_size - epoch_step_offset
            # Metric accumulation stays ON DEVICE: per-step device_get
            # would serialize host and device every step (the reference's
            # Keras loop pays the same sync, train.py:408-414). The tiny
            # adds below dispatch asynchronously; the only host sync per
            # epoch is the scalar fetch after the last step.
            tr_loss_sum = tr_acc_sum = None
            # Backpressure on async dispatch: without the old per-step
            # device_get, the host could enqueue the whole epoch, pinning
            # every queued batch in device memory. Holding a short window
            # of per-step losses and fetching the oldest (a scalar, long
            # since computed) bounds in-flight steps without serializing.
            inflight = collections.deque()
            max_inflight = max(2, 2 * prefetch_batches)
            for step_in_epoch in range(steps_this_epoch):
                t0 = time.perf_counter()
                batch = next(train_pipe)
                state, metrics = train_step(state, batch)
                step_loss = metrics["loss"] + metrics["reg_loss"]
                if tr_loss_sum is None:
                    tr_loss_sum, tr_acc_sum = step_loss, metrics["acc"]
                else:
                    tr_loss_sum = tr_loss_sum + step_loss
                    tr_acc_sum = tr_acc_sum + metrics["acc"]
                inflight.append(metrics["loss"])
                if len(inflight) > max_inflight:
                    float(inflight.popleft())
                # Dispatch interval, not device time: steps are async.
                batch_times.append(time.perf_counter() - t0)
                if profile_remaining > 0:
                    profile_remaining -= 1
                    if profile_remaining == 0:
                        # Sync before stopping: dispatch is async, so the
                        # profiled steps must actually execute inside the
                        # trace window.
                        float(metrics["loss"])
                        jax.profiler.stop_trace()
                        LOGGER.info(
                            "Profiler trace written to %s",
                            os.path.join(model_dir, "profile"),
                        )
                steps_run_total += 1
                if psync.poll() or (
                    preempt_after_steps is not None
                    and steps_run_total >= preempt_after_steps
                ):
                    # Sync: the async dispatches up to and including this
                    # step must have executed before the state snapshot.
                    float(metrics["loss"])
                    inflight.clear()
                    save_preempt_snapshot(
                        epoch, epoch_step_offset + step_in_epoch + 1
                    )
                    preempted = True
                    break
            if preempted:
                break
            inflight.clear()
            # Partial first epoch after a mid-epoch resume: means cover
            # the steps this process actually ran (the pre-preemption
            # portion's metrics were reported by the preempted run's
            # log). A preemption that landed exactly on the epoch's last
            # step (or during validation) leaves zero train steps on
            # resume: the train metrics for that epoch's row are then
            # unrecoverable — record NaN rather than crash or fake them.
            if steps_this_epoch > 0:
                tr_loss_mean = float(tr_loss_sum) / steps_this_epoch
                tr_acc_mean = float(tr_acc_sum) / steps_this_epoch
            else:
                tr_loss_mean = tr_acc_mean = float("nan")

            # Validation: fresh identically-seeded stream every epoch
            # (reference train.py:198-205, 391-395). The preemption flag
            # is polled here too: the default recipe spends ~half its
            # wall time validating, and a grace window missed there
            # would lose the whole epoch. steps_done == train_epoch_size
            # marks "train phase complete, validation pending" — resume
            # re-enters the epoch with zero train steps and re-runs
            # validation from scratch.
            val_gen = single_epoch_data_generator(
                validation_data_dir,
                validation_epoch_size,
                batch_size=validation_batch_size // proc_count,
                random_state=random_state,
                **shard_kwargs,
            )
            va_loss_sum = va_acc_sum = None
            with AsyncBatchPipeline(
                staged(val_gen), prefetch=prefetch_batches
            ) as val_pipe:
                for _ in range(validation_epoch_size):
                    metrics = eval_step(state, next(val_pipe))
                    if va_loss_sum is None:
                        va_loss_sum = metrics["loss"]
                        va_acc_sum = metrics["acc"]
                    else:
                        va_loss_sum = va_loss_sum + metrics["loss"]
                        va_acc_sum = va_acc_sum + metrics["acc"]
                    if psync.poll():
                        float(metrics["loss"])
                        save_preempt_snapshot(epoch, train_epoch_size)
                        preempted = True
                        break
            if preempted:
                break
            va_loss_mean = float(va_loss_sum) / validation_epoch_size
            va_acc_mean = float(va_acc_sum) / validation_epoch_size

            epoch_time = time.time() - epoch_start
            epoch_times.append(epoch_time)

            row = {
                "epoch": epoch,
                "acc": tr_acc_mean,
                "loss": tr_loss_mean,
                "val_acc": va_acc_mean,
                "val_loss": va_loss_mean,
            }
            LOGGER.info(
                "Epoch %d: loss=%.4f acc=%.4f val_loss=%.4f val_acc=%.4f "
                "(%.1fs, %.1f pairs/s)",
                epoch,
                row["loss"],
                row["acc"],
                row["val_loss"],
                row["val_acc"],
                epoch_time,
                train_epoch_size * train_batch_size / max(epoch_time, 1e-9),
            )

            # Checkpoint roles (reference train.py:326-355); writes are
            # serialization+disk on a background thread when
            # async_checkpoints (the device→host snapshot is taken here,
            # synchronously — see AsyncCheckpointWriter).
            save_ckpt(checkpoints.LATEST)
            if row["val_acc"] > best_val_acc:
                best_val_acc = row["val_acc"]
                save_ckpt(checkpoints.BEST_VALID_ACC)
            if row["val_loss"] < best_val_loss:
                best_val_loss = row["val_loss"]
                save_ckpt(checkpoints.BEST_VALID_LOSS)
            if (epoch + 1) % checkpoint_interval == 0:
                save_ckpt(checkpoints.PERIODIC_FMT.format(epoch=epoch))
            if saver is not None:
                # Durability barrier: the history row (and the removal of
                # any preempt marker below) is resume metadata implying
                # "LATEST holds end-of-epoch state" — it must never hit
                # disk while that write is still queued, or a hard kill
                # in the window leaves resume pointing past the state.
                # The worker's encode+write of each role overlaps the
                # device→host snapshot fetch of the next; this wait is
                # only the tail of the last file.
                saver.flush()

            # History artifacts (reference train.py:29-53, 363-365).
            for k in ("acc", "loss", "val_acc", "val_loss"):
                history[k].append(row[k])
            if is_chief:
                _append_history_row(history_csv, row)
                with open(history_checkpoint, "wb") as fp:
                    pickle.dump(
                        {
                            "loss": history["loss"],
                            "val_loss": history["val_loss"],
                        },
                        fp,
                    )

            # A completed epoch supersedes any mid-epoch snapshot marker
            # (the history row above now points resume at epoch+1).
            if is_chief and epoch == initial_epoch and resume_step_in_epoch:
                _clear_preempt_files(model_dir)

            best_train_acc = max(best_train_acc, row["acc"])
            best_train_loss = min(best_train_loss, row["loss"])
            tracker.update(
                model_dir,
                {
                    "latest_epoch": epoch,
                    "latest_train_loss": row["loss"],
                    "latest_validation_loss": row["val_loss"],
                    "latest_train_acc": row["acc"],
                    "latest_validation_acc": row["val_acc"],
                    "best_train_loss": best_train_loss,
                    "best_validation_loss": best_val_loss,
                    "best_train_acc": best_train_acc,
                    "best_validation_acc": best_val_acc,
                },
            )

    if preempted:
        LOGGER.info("Exiting cleanly after preemption snapshot.")
        return model_dir, history

    LOGGER.info("Done training. Saving results to disk...")
    history["epoch_times"] = epoch_times
    history["batch_times"] = batch_times
    if is_chief:
        with open(os.path.join(model_dir, "history.pkl"), "wb") as fd:
            pickle.dump(history, fd)
    LOGGER.info("Done!")
    return model_dir, history
