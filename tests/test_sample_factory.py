"""AVC sample-factory tests: sampling semantics, augmentation bounds,
mux behavior, HDF5 schema — against synthetic pre-decoded corpora."""

import glob
import os
import random
import warnings

import h5py
import numpy as np
import pytest

from l3embedding_tpu.data import sample as S
from l3embedding_tpu.data.audio_io import write_wav
from l3embedding_tpu.ops import image as I


def make_corpus(root, n_videos=4, seed=0, duration_s=3, fps=30, sr=48000):
    """Synthetic corpus in the pre-decoded .npy format + wav audio."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    os.makedirs(os.path.join(root, "video"), exist_ok=True)
    rows = []
    for i in range(n_videos):
        name = f"vid{i:02d}_000_010"
        video = rng.randint(0, 256, size=(duration_s * fps, 256, 320, 3)).astype(
            np.uint8
        )
        vpath = os.path.join(root, "video", name + ".npy")
        np.save(vpath, video)
        audio = (rng.randn(duration_s * sr) * 3000).astype(np.int16)
        apath = os.path.join(root, "audio", name + ".wav")
        write_wav(apath, audio, sr)
        rows.append(
            {"ytid": f"vid{i:02d}", "audio_filepath": apath, "video_filepath": vpath}
        )
    return rows


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("avc_corpus"))
    rows = make_corpus(root)
    subset_csv = os.path.join(root, "subset_train.csv")
    import csv

    with open(subset_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["ytid", "audio_filepath", "video_filepath"])
        w.writeheader()
        w.writerows(rows)
    return root, subset_csv, rows


def test_hsv_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.rand(16, 16, 3)
    np.testing.assert_allclose(I.hsv_to_rgb(I.rgb_to_hsv(img)), img, atol=1e-10)


def test_adjust_saturation_bounds():
    rng = np.random.RandomState(4)
    img = rng.rand(8, 8, 3)
    out = I.adjust_saturation(img, 1.5)
    assert out.min() >= 0 and out.max() <= 1
    # factor=1 is identity
    np.testing.assert_allclose(I.adjust_saturation(img, 1.0), img, atol=1e-10)


def test_sample_one_second():
    random.seed(0)
    sr = 48000
    audio = (np.random.RandomState(0).randn(3 * sr) * 1000).astype(np.int16)
    for _ in range(5):
        window, start, aug = sample_window = S.sample_one_second(audio, sr)
        assert window.shape == (sr,)
        assert 0 <= start <= 2.0
        assert aug == {}
    # Augmented gain stays in the reference's asserted bounds.
    for _ in range(5):
        window, _, aug = S.sample_one_second(audio, sr, augment=True)
        assert 0.9 <= aug["gain"] <= 1.1
        assert window.dtype == np.int16


def test_sample_one_second_pads_short_audio():
    random.seed(0)
    sr = 48000
    short = np.ones(sr // 2, dtype=np.int16)
    with pytest.warns(UserWarning):
        window, start, _ = S.sample_one_second(short, sr)
    assert window.shape == (sr,)
    assert start == 0.0
    assert (window[sr // 2 :] == 0).all()


def test_generate_sample_label_semantics(corpus):
    _, _, rows = corpus
    random.seed(123)
    sr = 48000
    a1 = (np.random.randn(2 * sr) * 500).astype(np.int16)
    a2 = (np.random.randn(2 * sr) * 500).astype(np.int16)
    v1 = np.random.randint(0, 256, (60, 256, 320, 3)).astype(np.uint8)
    v2 = np.random.randint(0, 256, (60, 256, 320, 3)).astype(np.uint8)
    labels = set()
    for _ in range(20):
        s = S.generate_sample("a1", a1, "a2", a2, "v1", v1, "v2", v2, sr)
        assert s["video"].shape == (224, 224, 3)
        assert s["video"].dtype == np.uint8
        assert s["audio"].shape == (1, sr)
        assert tuple(s["label"]) in {(0, 1), (1, 0)}
        labels.add(tuple(s["label"]))
    assert len(labels) == 2  # both match and mismatch occur


def test_stream_mux_replaces_dead_streamers():
    calls = []

    def good_factory():
        def gen():
            while True:
                yield {"x": 1}

        calls.append("good")
        return gen()

    def dead_factory():
        def gen():
            raise S.StreamerDead("nope")
            yield  # pragma: no cover

        calls.append("dead")
        return gen()

    mux = S.StreamMux([dead_factory, good_factory], k=1, rate=4, random_state=0)
    out = [next(mux) for _ in range(10)]
    assert all(s == {"x": 1} for s in out)
    assert "good" in calls


def test_sample_and_save_h5_schema(corpus, tmp_path):
    _, subset_csv, _ = corpus
    out_dir = str(tmp_path / "batches")
    S.sample_and_save(
        0,
        subset_csv,
        num_batches=2,
        output_dir=out_dir,
        num_streamers=2,
        batch_size=6,
        random_state=101,
        augment=True,
        include_metadata=True,
    )
    files = sorted(glob.glob(os.path.join(out_dir, "*.h5")))
    assert len(files) == 2
    assert os.path.basename(files[0]) == "101_0_0.h5"
    with h5py.File(files[0], "r") as f:
        assert f["audio"].shape == (6, 1, 48000)
        assert f["audio"].dtype == np.int16
        assert f["video"].shape == (6, 224, 224, 3)
        assert f["video"].dtype == np.uint8
        assert f["label"].shape == (6, 2)
        # metadata keys present
        assert "audio_file" in f and "video_gain" not in f
        assert "audio_gain" in f
        assert "video_saturation_factor" in f


def test_factory_batches_feed_training_reader(corpus, tmp_path):
    """The 02→03 contract: factory output must stream through the
    training data_generator unchanged."""
    _, subset_csv, _ = corpus
    out_dir = str(tmp_path / "train_h5")
    S.sample_and_save(
        0, subset_csv, num_batches=3, output_dir=out_dir,
        num_streamers=2, batch_size=4, random_state=7,
    )
    from l3embedding_tpu.training.data import data_generator

    gen = data_generator(out_dir, batch_size=6, random_state=1)
    batch = next(gen)
    assert batch["audio"].shape == (6, 1, 48000)
    assert batch["video"].shape == (6, 224, 224, 3)


def test_sample_and_save_is_reproducible(corpus, tmp_path):
    """Same seed → byte-identical batch files (reproducibility contract
    the resume/repair tooling depends on)."""
    _, subset_csv, _ = corpus
    outs = []
    for run in ("a", "b"):
        out_dir = str(tmp_path / run)
        S.sample_and_save(
            0, subset_csv, num_batches=2, output_dir=out_dir,
            num_streamers=2, batch_size=4, random_state=99, augment=True,
        )
        outs.append(out_dir)
    for fname in sorted(os.listdir(outs[0])):
        with h5py.File(os.path.join(outs[0], fname)) as fa, \
             h5py.File(os.path.join(outs[1], fname)) as fb:
            for key in ("audio", "video", "label"):
                np.testing.assert_array_equal(fa[key][...], fb[key][...])


def test_small_frame_streamer_replaced_not_fatal(tmp_path):
    """A clip whose frames are smaller than the 224x224 crop must kill
    only its streamer (skip-and-replace semantics), not the factory —
    the reference crashes outright there (sample.py:182)."""
    import csv

    root = str(tmp_path / "corpus")
    rows = make_corpus(root, n_videos=3, seed=3)
    # Corrupt one clip: 200x200 frames.
    bad = np.random.RandomState(0).randint(
        0, 256, size=(30, 200, 200, 3)
    ).astype(np.uint8)
    np.save(rows[1]["video_filepath"], bad)
    subset = os.path.join(root, "subset.csv")
    with open(subset, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["ytid", "audio_filepath", "video_filepath"]
        )
        w.writeheader()
        w.writerows(rows)

    from l3embedding_tpu.data.sample import data_generator

    gen = data_generator(subset, batch_size=8, random_state=5, k=4,
                         augment=False, rate=2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        batch = next(gen)
    assert batch["video"].shape == (8, 224, 224, 3)


def test_exact_224_frame_is_valid(tmp_path):
    """A 224-sided frame has exactly one crop position and must work."""
    from l3embedding_tpu.data.sample import sample_cropped_frame

    frame = np.zeros((224, 240, 3), np.uint8)
    crop, bbox = sample_cropped_frame(frame)
    assert crop.shape == (224, 224, 3)
    assert bbox["start_x"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="smaller"):
        sample_cropped_frame(np.zeros((200, 240, 3), np.uint8))


def test_single_video_subset_raises(tmp_path):
    """Distractor sampling needs >= 2 videos; the reference spins
    forever on a 1-row subset — we fail fast."""
    import csv

    import pytest as _pytest

    root = str(tmp_path / "corpus")
    rows = make_corpus(root, n_videos=1, seed=4)
    subset = os.path.join(root, "subset.csv")
    with open(subset, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["ytid", "audio_filepath", "video_filepath"]
        )
        w.writeheader()
        w.writerows(rows)

    from l3embedding_tpu.data.sample import data_generator

    with _pytest.raises(ValueError, match="2"):
        data_generator(subset, batch_size=4, random_state=1, k=2)
