"""End-to-end tiny_L3 AVC training tests: the cheap full-pipeline fixture
(the reference's substitute for integration tests, SURVEY.md §4), plus
data-generator determinism and checkpoint-resume parity."""

import json
import os
import pickle

import h5py
import numpy as np
import pytest

from l3embedding_tpu.training.data import data_generator


def make_synthetic_corpus(path, num_blobs=3, blob_size=24, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    for i in range(num_blobs):
        with h5py.File(os.path.join(path, f"blob_{i}.h5"), "w") as f:
            labels = rng.randint(0, 2, size=blob_size)
            f.create_dataset(
                "audio",
                data=(rng.randn(blob_size, 1, 48000) * 3000).astype(np.int16),
                compression="gzip",
            )
            f.create_dataset(
                "video",
                data=rng.randint(0, 256, size=(blob_size, 224, 224, 3)).astype(
                    np.uint8
                ),
                compression="gzip",
            )
            f.create_dataset(
                "label",
                data=np.stack([labels, 1 - labels], axis=1).astype(np.float32),
                compression="gzip",
            )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    train_dir = tmp_path_factory.mktemp("avc") / "train_h5"
    valid_dir = tmp_path_factory.mktemp("avc") / "valid_h5"
    make_synthetic_corpus(str(train_dir), num_blobs=3, blob_size=24, seed=0)
    make_synthetic_corpus(str(valid_dir), num_blobs=1, blob_size=16, seed=1)
    return str(train_dir), str(valid_dir)


class TestDataGenerator:
    def test_batch_assembly_across_blobs(self, corpus):
        train_dir, _ = corpus
        gen = data_generator(train_dir, batch_size=10, random_state=7)
        batches = [next(gen) for _ in range(8)]
        for b in batches:
            assert b["audio"].shape == (10, 1, 48000)
            assert b["audio"].dtype == np.int16
            assert b["video"].shape == (10, 224, 224, 3)
            assert b["video"].dtype == np.uint8
            assert b["label"].shape == (10, 2)

    def test_determinism_same_seed(self, corpus):
        train_dir, _ = corpus
        g1 = data_generator(train_dir, batch_size=8, random_state=42)
        g2 = data_generator(train_dir, batch_size=8, random_state=42)
        for _ in range(6):
            b1, b2 = next(g1), next(g2)
            np.testing.assert_array_equal(b1["audio"], b2["audio"])
            np.testing.assert_array_equal(b1["label"], b2["label"])

    def test_start_batch_idx_fast_forward(self, corpus):
        # Resume contract (reference train.py:166-195): skipping k batches
        # yields exactly the stream from batch k onward.
        train_dir, _ = corpus
        full = data_generator(train_dir, batch_size=8, random_state=42)
        for _ in range(4):
            next(full)
        expected = next(full)
        resumed = data_generator(
            train_dir, batch_size=8, random_state=42, start_batch_idx=4
        )
        got = next(resumed)
        np.testing.assert_array_equal(got["audio"], expected["audio"])
        np.testing.assert_array_equal(got["video"], expected["video"])


class TestTrainLoop:
    @pytest.fixture(scope="class")
    def run(self, corpus, tmp_path_factory):
        from l3embedding_tpu.training.loop import train

        train_dir, valid_dir = corpus
        out = str(tmp_path_factory.mktemp("runs"))
        model_dir, history = train(
            train_dir,
            valid_dir,
            out,
            num_epochs=2,
            train_epoch_size=3,
            validation_epoch_size=2,
            train_batch_size=8,
            validation_batch_size=8,
            model_type="tiny_L3",
            random_state=11,
            learning_rate=1e-4,
            checkpoint_interval=2,
            disable_logging=True,
        )
        return model_dir, history

    def test_artifacts(self, run):
        model_dir, history = run
        for fname in (
            "config.json",
            "model.json",
            "history_csvlog.csv",
            "history_checkpoint.pkl",
            "history.pkl",
            "model_latest.ckpt",
            "model_best_valid_accuracy.ckpt",
            "model_best_valid_loss.ckpt",
            "model_checkpoint.01.ckpt",
        ):
            assert os.path.exists(os.path.join(model_dir, fname)), fname
        assert len(history["loss"]) == 2
        assert all(np.isfinite(history["loss"]))
        with open(os.path.join(model_dir, "history.pkl"), "rb") as f:
            saved = pickle.load(f)
        assert saved["val_acc"] == history["val_acc"]

    def test_resume(self, run, corpus):
        from l3embedding_tpu.training.loop import get_restart_info, train

        model_dir, _ = run
        train_dir, valid_dir = corpus
        epoch, val_acc, val_loss = get_restart_info(
            os.path.join(model_dir, "history_csvlog.csv")
        )
        assert epoch == 1
        _, history = train(
            train_dir,
            valid_dir,
            "unused",
            num_epochs=3,
            train_epoch_size=3,
            validation_epoch_size=2,
            train_batch_size=8,
            validation_batch_size=8,
            model_type="tiny_L3",
            random_state=11,
            learning_rate=1e-4,
            checkpoint_interval=2,
            disable_logging=True,
            continue_model_dir=model_dir,
        )
        # One more epoch ran; CSV now has 3 rows.
        import csv

        with open(os.path.join(model_dir, "history_csvlog.csv")) as f:
            rows = list(csv.DictReader(f))
        assert [int(r["epoch"]) for r in rows] == [0, 1, 2]
        assert len(history["loss"]) == 1


class TestGradientAccumulation:
    def test_accum_step_runs_and_learns(self, corpus):
        import jax

        from l3embedding_tpu.models import build_model
        from l3embedding_tpu.training.data import data_generator
        from l3embedding_tpu.training.state import create_train_state
        from l3embedding_tpu.training.steps import make_train_step

        train_dir, _ = corpus
        spec = build_model("tiny_L3")
        model = spec.module()
        state = create_train_state(
            model, jax.random.PRNGKey(0), spec.video_input_shape,
            spec.audio_input_shape, 1e-4,
        )
        step = make_train_step(model, donate=False, accum_steps=4)
        gen = data_generator(train_dir, batch_size=16, random_state=3)
        batch = next(gen)
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_accum_matches_plain_grads_when_bn_frozen(self, corpus):
        """With identical per-micro batches, accumulated gradients equal
        the plain step's gradients (BN sees the same data each micro)."""
        import jax

        from l3embedding_tpu.models import build_model
        from l3embedding_tpu.training.data import data_generator
        from l3embedding_tpu.training.state import create_train_state
        from l3embedding_tpu.training.steps import make_train_step

        train_dir, _ = corpus
        spec = build_model("tiny_L3")
        model = spec.module()
        state = create_train_state(
            model, jax.random.PRNGKey(0), spec.video_input_shape,
            spec.audio_input_shape, 1e-4,
        )
        gen = data_generator(train_dir, batch_size=8, random_state=4)
        micro = next(gen)
        # Duplicate the microbatch 2x: accumulated grads == plain grads
        # on the microbatch, so the updated params must match.
        dup = {k: np.concatenate([v, v]) for k, v in micro.items()}

        plain = make_train_step(model, donate=False)
        accum = make_train_step(model, donate=False, accum_steps=2)
        s_plain, m_plain = plain(state, micro)
        s_accum, m_accum = accum(state, dup)
        np.testing.assert_allclose(
            float(m_plain["loss"]), float(m_accum["loss"]), rtol=1e-5
        )
        for a, b in zip(jax.tree.leaves(s_plain.params),
                        jax.tree.leaves(s_accum.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestDataDirHygiene:
    def test_stray_files_ignored(self, tmp_path):
        import h5py

        d = tmp_path / "h5"
        d.mkdir()
        with h5py.File(d / "blob_000.h5", "w") as f:
            f.create_dataset("audio", data=np.zeros((4, 1, 8), np.int16))
            f.create_dataset("video", data=np.zeros((4, 2, 2, 3), np.uint8))
            f.create_dataset("label", data=np.zeros((4, 2), np.float32))
        (d / "README.txt").write_text("not a batch")
        from l3embedding_tpu.training.data import data_generator

        batch = next(data_generator(str(d), batch_size=4))
        assert batch["label"].shape == (4, 2)

    def test_empty_dir_fails_fast(self, tmp_path):
        from l3embedding_tpu.training.data import data_generator

        d = tmp_path / "empty"
        d.mkdir()
        with pytest.raises(ValueError, match="no .h5"):
            next(data_generator(str(d), batch_size=4))


class TestAsyncPipelineProtocol:
    def test_exhaustion_is_sticky(self):
        from l3embedding_tpu.training.data import AsyncBatchPipeline

        with AsyncBatchPipeline(iter([1, 2]), prefetch=1) as pipe:
            assert list(pipe) == [1, 2]
            # Second exhaustion must raise StopIteration again, not hang.
            with pytest.raises(StopIteration):
                next(pipe)

    def test_close_is_prompt_with_prefetch_one(self):
        import itertools
        import time as _time

        from l3embedding_tpu.training.data import AsyncBatchPipeline

        pipe = AsyncBatchPipeline(itertools.count(), prefetch=1)
        assert next(pipe) == 0
        t0 = _time.perf_counter()
        pipe.close()
        assert _time.perf_counter() - t0 < 5.0
        assert not pipe._thread.is_alive()

    def test_worker_exception_surfaces_and_stays(self):
        from l3embedding_tpu.training.data import AsyncBatchPipeline

        def gen():
            yield 1
            raise RuntimeError("boom")

        with AsyncBatchPipeline(gen(), prefetch=2) as pipe:
            assert next(pipe) == 1
            with pytest.raises(RuntimeError, match="boom"):
                next(pipe)
            with pytest.raises(RuntimeError, match="boom"):
                next(pipe)


def test_flattened_optimizer_equivalence():
    """make_optimizer(flatten=True) — one fused Adam over the raveled
    params (the launch-bound per-leaf updates cost ~5 ms/step on the
    profiled melspec2 step) — must produce bit-identical updates to the
    per-leaf optimizer."""
    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.training.state import make_optimizer

    params = {
        "conv": {"kernel": jnp.arange(12.0).reshape(3, 4) / 7.0,
                 "bias": jnp.ones((4,)) * 0.3},
        "bn": {"scale": jnp.linspace(0.5, 1.5, 6)},
    }
    grads = jax.tree.map(lambda p: jnp.cos(p) * 0.01, params)

    outs = []
    for flatten in (False, True):
        tx = make_optimizer(1e-3, flatten=flatten)
        opt_state = tx.init(params)
        p = params
        for _ in range(3):
            updates, opt_state = tx.update(grads, opt_state, p)
            import optax

            p = optax.apply_updates(p, updates)
        outs.append(p)

    flat0 = jax.tree_util.tree_leaves(outs[0])
    flat1 = jax.tree_util.tree_leaves(outs[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShardedDataGenerator:
    """Multi-host corpus sharding: files[shard_index::shard_count] per
    process, per-shard seed offset (training/data.py)."""

    @pytest.fixture()
    def fingerprint_corpus(self, tmp_path):
        # Each blob's audio is a constant = blob index, so any batch row
        # can be attributed to its source file.
        d = tmp_path / "shard_corpus"
        os.makedirs(d)
        for i in range(3):
            with h5py.File(d / f"blob_{i}.h5", "w") as f:
                f.create_dataset(
                    "audio", data=np.full((6, 1, 48000), i, np.int16)
                )
                f.create_dataset(
                    "video",
                    data=np.full((6, 224, 224, 3), i, np.uint8),
                )
                f.create_dataset(
                    "label", data=np.tile([[1.0, 0.0]], (6, 1)).astype(np.float32)
                )
        return str(d)

    def test_shards_are_disjoint_and_cover(self, fingerprint_corpus):
        seen = {0: set(), 1: set()}
        for shard in (0, 1):
            gen = data_generator(
                fingerprint_corpus,
                batch_size=4,
                random_state=3,
                shard_index=shard,
                shard_count=2,
            )
            for _ in range(6):
                batch = next(gen)
                seen[shard].update(
                    int(v) for v in batch["audio"][:, 0, 0].tolist()
                )
        # sorted files blob_0,1,2 → shard0 = {0,2}, shard1 = {1}
        assert seen[0] == {0, 2}
        assert seen[1] == {1}

    def test_shard_determinism_and_fast_forward(self, fingerprint_corpus):
        kw = dict(batch_size=4, random_state=9, shard_index=0, shard_count=2)
        a = data_generator(fingerprint_corpus, **kw)
        b = data_generator(fingerprint_corpus, **kw)
        batches_a = [next(a) for _ in range(5)]
        batches_b = [next(b) for _ in range(5)]
        for x, y in zip(batches_a, batches_b):
            np.testing.assert_array_equal(x["audio"], y["audio"])
        ff = data_generator(
            fingerprint_corpus, start_batch_idx=3, **kw
        )
        np.testing.assert_array_equal(
            next(ff)["audio"], batches_a[3]["audio"]
        )

    def test_shard_validation(self, fingerprint_corpus):
        with pytest.raises(ValueError, match="shard_index"):
            next(data_generator(
                fingerprint_corpus, shard_index=2, shard_count=2))
        with pytest.raises(ValueError, match="fewer .h5 files"):
            next(data_generator(
                fingerprint_corpus, shard_index=3, shard_count=4))


class TestAsyncCheckpointWriter:
    def _mini_state(self):
        import jax
        import jax.numpy as jnp

        from l3embedding_tpu.training.state import AVCTrainState, make_optimizer

        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        tx = make_optimizer(1e-3)
        return AVCTrainState(
            step=jnp.int32(5),
            params=params,
            batch_stats={"mean": jnp.ones((3,))},
            opt_state=tx.init(params),
            tx=tx,
        )

    def test_bytes_identical_to_sync(self, tmp_path):
        from l3embedding_tpu.training import checkpoints

        state = self._mini_state()
        sync_path = str(tmp_path / "sync.ckpt")
        async_path = str(tmp_path / "async.ckpt")
        checkpoints.save_state(sync_path, state)
        with checkpoints.AsyncCheckpointWriter() as w:
            w.save(async_path, state)
        with open(sync_path, "rb") as f1, open(async_path, "rb") as f2:
            assert f1.read() == f2.read()
        # And it round-trips through load_state.
        restored = checkpoints.load_state(async_path, self._mini_state())
        assert int(restored.step) == 5

    def test_last_write_wins_in_order(self, tmp_path):
        from l3embedding_tpu.training import checkpoints

        path = str(tmp_path / "latest.ckpt")
        s1 = self._mini_state()
        s2 = s1.replace(step=s1.step + 10)
        with checkpoints.AsyncCheckpointWriter() as w:
            w.save(path, s1)
            w.save(path, s2)
        restored = checkpoints.load_state(path, self._mini_state())
        assert int(restored.step) == 15

    def test_write_error_surfaces(self, tmp_path):
        from l3embedding_tpu.training import checkpoints

        w = checkpoints.AsyncCheckpointWriter()
        w.save(str(tmp_path / "missing_dir" / "x.ckpt"), self._mini_state())
        with pytest.raises(OSError):
            w.close()
        # close() is idempotent afterwards.
        w.close()

    def test_save_after_close_raises(self, tmp_path):
        from l3embedding_tpu.training import checkpoints

        w = checkpoints.AsyncCheckpointWriter()
        w.close()
        with pytest.raises(RuntimeError):
            w.save(str(tmp_path / "x.ckpt"), self._mini_state())


class TestPreemptionRecovery:
    """SIGTERM-style preemption → exact-step snapshot → mid-epoch resume
    reproduces the uninterrupted run bit-for-bit (training/loop.py)."""

    ARGS = dict(
        num_epochs=2,
        train_epoch_size=3,
        validation_epoch_size=2,
        train_batch_size=8,
        validation_batch_size=8,
        model_type="tiny_L3",
        random_state=11,
        learning_rate=1e-4,
        checkpoint_interval=10,
        disable_logging=True,
    )

    def test_preempt_resume_matches_uninterrupted(
        self, corpus, tmp_path_factory
    ):
        from l3embedding_tpu.training.loop import PREEMPT_FILE, train

        train_dir, valid_dir = corpus

        # Reference run: uninterrupted.
        out_a = str(tmp_path_factory.mktemp("uninterrupted"))
        dir_a, _ = train(train_dir, valid_dir, out_a, **self.ARGS)

        # Preempted run: injected fault after 4 global steps = mid
        # epoch 1 (epoch 0 has 3 steps).
        out_b = str(tmp_path_factory.mktemp("preempted"))
        dir_b, _ = train(
            train_dir, valid_dir, out_b,
            preempt_after_steps=4, **self.ARGS,
        )
        marker = os.path.join(dir_b, PREEMPT_FILE)
        assert os.path.exists(marker)
        with open(marker) as f:
            info = json.load(f)
        assert info["epoch"] == 1
        assert info["steps_done_in_epoch"] == 1
        assert info["global_batch_idx"] == 4
        assert info["process_count"] == 1
        assert info["checkpoint"] == "model_preempt.ckpt"
        # The mid-epoch state lives in its OWN file; LATEST still holds
        # the epoch-0 boundary state (crash consistency: a kill between
        # snapshot and marker writes must leave LATEST clean).
        assert os.path.exists(os.path.join(dir_b, "model_preempt.ckpt"))
        assert os.path.exists(os.path.join(dir_b, "model_latest.ckpt"))
        with open(os.path.join(dir_b, "model_preempt.ckpt"), "rb") as fp, \
                open(os.path.join(dir_b, "model_latest.ckpt"), "rb") as fl:
            assert fp.read() != fl.read()

        # Resume: finishes epoch 1 from step 1 and clears the marker
        # (and the now-stale snapshot file).
        _, hist = train(
            train_dir, valid_dir, "unused",
            continue_model_dir=dir_b, **self.ARGS,
        )
        assert not os.path.exists(marker)
        assert not os.path.exists(os.path.join(dir_b, "model_preempt.ckpt"))
        assert len(hist["loss"]) == 1  # the one completed (resumed) epoch

        with open(os.path.join(dir_a, "model_latest.ckpt"), "rb") as fa:
            blob_a = fa.read()
        with open(os.path.join(dir_b, "model_latest.ckpt"), "rb") as fb:
            blob_b = fb.read()
        assert blob_a == blob_b, (
            "resumed final state differs from uninterrupted run"
        )


def test_sigterm_preemption_e2e(corpus, tmp_path):
    """Real-signal path: SIGTERM to a running `03` process produces an
    exact-step snapshot + preempt.json and a CLEAN exit (rc 0) — the
    cloud-preemption contract (training/loop._PreemptionGuard)."""
    import signal
    import subprocess
    import sys
    import time

    train_dir, valid_dir = corpus
    out = str(tmp_path / "runs")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Force the CPU backend inside the subprocess: this image's
    # sitecustomize re-pins JAX_PLATFORMS at interpreter start, so the
    # env var alone is not enough (same recipe as __graft_entry__'s
    # virtual-mesh re-exec).
    cli = os.path.join(repo_root, "03_train_embedding.py")
    wrapper = (
        "import os, sys, runpy; "
        "os.environ['JAX_PLATFORMS'] = 'cpu'; "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv[0] = {cli!r}; runpy.run_path({cli!r}, run_name='__main__')"
    )
    proc = subprocess.Popen(
        [
            sys.executable, "-c", wrapper,
            "-e", "50", "-tes", "3", "-ves", "2", "-tbs", "8", "-vbs", "8",
            "-mt", "tiny_L3", "-r", "11", "-nl",
            train_dir, valid_dir, out,
        ],
        cwd=repo_root,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    # Wait for the run dir (created before training starts), then give
    # the loop time to enter its first steps before signalling.
    deadline = time.time() + 240
    model_dir = None
    try:
        while time.time() < deadline and model_dir is None:
            if proc.poll() is not None:
                break
            for root, _, files in os.walk(out):
                if "config.json" in files:
                    model_dir = root
                    break
            time.sleep(0.5)
        assert model_dir, "run dir never appeared"
        time.sleep(10)  # let the first train steps dispatch
        assert proc.poll() is None, "training exited before the signal"
        proc.send_signal(signal.SIGTERM)
        out_text, _ = proc.communicate(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, f"rc={proc.returncode}\n{out_text[-3000:]}"
    from l3embedding_tpu.training.loop import PREEMPT_FILE

    assert os.path.exists(os.path.join(model_dir, PREEMPT_FILE)), (
        out_text[-3000:]
    )
    assert os.path.exists(os.path.join(model_dir, "model_preempt.ckpt"))
    with open(os.path.join(model_dir, PREEMPT_FILE)) as f:
        info = json.load(f)
    assert info["steps_done_in_epoch"] >= 1
    assert info["checkpoint"] == "model_preempt.ckpt"


def test_preempt_on_epoch_boundary_resumes(corpus, tmp_path_factory):
    """Preemption on an epoch's LAST train step (steps_done ==
    train_epoch_size) must resume cleanly: the epoch re-enters with zero
    train steps, re-runs validation, records NaN train metrics for the
    unrecoverable row, and ends byte-identical to an uninterrupted run."""
    import csv
    import math

    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)

    out_a = str(tmp_path_factory.mktemp("boundary_ref"))
    dir_a, _ = train(train_dir, valid_dir, out_a, **args)

    out_b = str(tmp_path_factory.mktemp("boundary_pre"))
    dir_b, _ = train(
        train_dir, valid_dir, out_b, preempt_after_steps=3, **args
    )
    with open(os.path.join(dir_b, PREEMPT_FILE)) as f:
        info = json.load(f)
    assert info["epoch"] == 0
    assert info["steps_done_in_epoch"] == 3  # == train_epoch_size
    assert info["process_count"] == 1

    _, hist = train(
        train_dir, valid_dir, "unused", continue_model_dir=dir_b, **args
    )
    assert not os.path.exists(os.path.join(dir_b, PREEMPT_FILE))
    with open(os.path.join(dir_b, "history_csvlog.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [int(r["epoch"]) for r in rows] == [0, 1]
    # Epoch 0's train metrics were lost to the preemption: NaN, not fake.
    assert math.isnan(float(rows[0]["acc"]))
    assert math.isnan(float(rows[0]["loss"]))
    assert not math.isnan(float(rows[0]["val_acc"]))
    assert not math.isnan(float(rows[1]["acc"]))

    with open(os.path.join(dir_a, "model_latest.ckpt"), "rb") as fa, \
            open(os.path.join(dir_b, "model_latest.ckpt"), "rb") as fb:
        assert fa.read() == fb.read()


def test_preempt_process_count_mismatch_rejected(corpus, tmp_path_factory):
    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)
    out = str(tmp_path_factory.mktemp("pc_mismatch"))
    model_dir, _ = train(
        train_dir, valid_dir, out, preempt_after_steps=2, **args
    )
    marker = os.path.join(model_dir, PREEMPT_FILE)
    with open(marker) as f:
        info = json.load(f)
    info["process_count"] = 4
    with open(marker, "w") as f:
        json.dump(info, f)
    with pytest.raises(ValueError, match="4-process"):
        train(
            train_dir, valid_dir, "unused",
            continue_model_dir=model_dir, **args,
        )


def test_async_writer_flush_is_durable(tmp_path):
    from l3embedding_tpu.training import checkpoints

    state = TestAsyncCheckpointWriter()._mini_state()
    path = str(tmp_path / "latest.ckpt")
    with checkpoints.AsyncCheckpointWriter() as w:
        w.save(path, state)
        w.flush()
        assert os.path.exists(path)  # durable BEFORE close
        restored = checkpoints.load_state(
            path, TestAsyncCheckpointWriter()._mini_state()
        )
        assert int(restored.step) == 5


def test_stale_preempt_marker_ignored(corpus, tmp_path_factory):
    """A preempt.json whose epoch the history CSV already records as
    complete (hard kill between row append and marker removal) must be
    ignored and removed — trusting it would replay part of a finished
    epoch onto state that already contains it."""
    import csv

    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)
    out = str(tmp_path_factory.mktemp("stale"))
    model_dir, _ = train(train_dir, valid_dir, out, **args)  # epochs 0,1

    marker = os.path.join(model_dir, PREEMPT_FILE)
    with open(marker, "w") as f:
        json.dump(
            {
                "epoch": 0,
                "steps_done_in_epoch": 2,
                "global_batch_idx": 2,
                "process_count": 1,
            },
            f,
        )

    args3 = dict(args, num_epochs=3)
    _, hist = train(
        train_dir, valid_dir, "unused", continue_model_dir=model_dir, **args3
    )
    assert not os.path.exists(marker)
    with open(os.path.join(model_dir, "history_csvlog.csv")) as f:
        rows = list(csv.DictReader(f))
    # One NEW epoch (2) ran — not a replay of epoch 0.
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2]
    assert len(hist["loss"]) == 1
    assert np.isfinite(float(rows[2]["acc"]))


def test_truncated_preempt_marker_falls_back_to_epoch_boundary(
    corpus, tmp_path_factory
):
    """A truncated/corrupt preempt.json (pre-atomic-writer artifact, or
    disk-full) must not crash resume: fall back to epoch-boundary
    semantics from the history CSV and remove the bad marker."""
    import csv

    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)
    out = str(tmp_path_factory.mktemp("truncated"))
    model_dir, _ = train(train_dir, valid_dir, out, **args)  # epochs 0,1

    marker = os.path.join(model_dir, PREEMPT_FILE)
    with open(marker, "w") as f:
        f.write('{"epoch": 1, "steps_do')  # kill mid-write

    args3 = dict(args, num_epochs=3)
    _, hist = train(
        train_dir, valid_dir, "unused", continue_model_dir=model_dir, **args3
    )
    assert not os.path.exists(marker)
    with open(os.path.join(model_dir, "history_csvlog.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2]
    assert len(hist["loss"]) == 1


def test_preempt_marker_missing_snapshot_falls_back(corpus, tmp_path_factory):
    """A valid marker whose referenced snapshot file is gone (manual
    cleanup) resumes at the last completed epoch boundary from LATEST —
    and, because the seeded stream replays deterministically, still ends
    byte-identical to an uninterrupted run."""
    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)

    out_a = str(tmp_path_factory.mktemp("nosnap_ref"))
    dir_a, _ = train(train_dir, valid_dir, out_a, **args)

    out_b = str(tmp_path_factory.mktemp("nosnap_pre"))
    dir_b, _ = train(
        train_dir, valid_dir, out_b, preempt_after_steps=4, **args
    )
    os.remove(os.path.join(dir_b, "model_preempt.ckpt"))

    _, hist = train(
        train_dir, valid_dir, "unused", continue_model_dir=dir_b, **args
    )
    # Epoch 1 replayed in full from the epoch-0 boundary in LATEST.
    assert len(hist["loss"]) == 1
    assert not os.path.exists(os.path.join(dir_b, PREEMPT_FILE))
    with open(os.path.join(dir_a, "model_latest.ckpt"), "rb") as fa, \
            open(os.path.join(dir_b, "model_latest.ckpt"), "rb") as fb:
        assert fa.read() == fb.read()


@pytest.mark.parametrize(
    "field,bad_value,match",
    [
        ("per_process_batch_size", 4, "per-process batch"),
        ("train_epoch_size", 7, "train_epoch_size"),
    ],
)
def test_preempt_geometry_mismatch_rejected(
    corpus, tmp_path_factory, field, bad_value, match
):
    """Resuming a mid-epoch snapshot with a different batch/epoch
    geometry would silently misalign the data fast-forward — reject."""
    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)
    out = str(tmp_path_factory.mktemp(f"geom_{field}"))
    model_dir, _ = train(
        train_dir, valid_dir, out, preempt_after_steps=2, **args
    )
    marker = os.path.join(model_dir, PREEMPT_FILE)
    with open(marker) as f:
        info = json.load(f)
    info[field] = bad_value
    with open(marker, "w") as f:
        json.dump(info, f)
    with pytest.raises(ValueError, match=match):
        train(
            train_dir, valid_dir, "unused",
            continue_model_dir=model_dir, **args,
        )


def test_double_preemption_resumes_byte_identical(corpus, tmp_path_factory):
    """A resumed run preempted AGAIN mid-epoch must retract the old
    marker before overwriting the snapshot (loop.save_preempt_snapshot)
    and still converge, over two resumes, to a final state byte-identical
    to an uninterrupted run."""
    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)

    out_a = str(tmp_path_factory.mktemp("dbl_ref"))
    dir_a, _ = train(train_dir, valid_dir, out_a, **args)

    out_b = str(tmp_path_factory.mktemp("dbl_pre"))
    dir_b, _ = train(
        train_dir, valid_dir, out_b, preempt_after_steps=2, **args
    )
    with open(os.path.join(dir_b, PREEMPT_FILE)) as f:
        assert json.load(f)["epoch"] == 0

    # Second preemption: 1 remaining epoch-0 train step, then epoch 1
    # step 1 trips the injected fault — a fresh marker+snapshot pair.
    train(
        train_dir, valid_dir, "unused",
        continue_model_dir=dir_b, preempt_after_steps=2, **args,
    )
    with open(os.path.join(dir_b, PREEMPT_FILE)) as f:
        info = json.load(f)
    assert info["epoch"] == 1
    assert info["steps_done_in_epoch"] == 1
    assert os.path.exists(os.path.join(dir_b, "model_preempt.ckpt"))

    _, hist = train(
        train_dir, valid_dir, "unused", continue_model_dir=dir_b, **args
    )
    assert not os.path.exists(os.path.join(dir_b, PREEMPT_FILE))
    with open(os.path.join(dir_a, "model_latest.ckpt"), "rb") as fa, \
            open(os.path.join(dir_b, "model_latest.ckpt"), "rb") as fb:
        assert fa.read() == fb.read()


def test_preempt_missing_snapshot_beats_geometry_mismatch(
    corpus, tmp_path_factory
):
    """Marker whose snapshot is gone AND whose geometry mismatches must
    degrade to epoch-boundary resume (the geometry error would demand a
    retry that cannot succeed — the snapshot no longer exists)."""
    from l3embedding_tpu.training.loop import PREEMPT_FILE, train

    train_dir, valid_dir = corpus
    args = dict(TestPreemptionRecovery.ARGS)
    out = str(tmp_path_factory.mktemp("nosnap_geom"))
    model_dir, _ = train(
        train_dir, valid_dir, out, preempt_after_steps=4, **args
    )
    os.remove(os.path.join(model_dir, "model_preempt.ckpt"))
    marker = os.path.join(model_dir, PREEMPT_FILE)
    with open(marker) as f:
        info = json.load(f)
    info["train_epoch_size"] = 999  # would raise if validated first
    with open(marker, "w") as f:
        json.dump(info, f)

    _, hist = train(
        train_dir, valid_dir, "unused", continue_model_dir=model_dir, **args
    )
    assert len(hist["loss"]) == 1  # epoch 1 replayed from the boundary
    assert not os.path.exists(marker)
