"""End-to-end tiny_L3 AVC training tests: the cheap full-pipeline fixture
(the reference's substitute for integration tests, SURVEY.md §4), plus
data-generator determinism and checkpoint-resume parity."""

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
