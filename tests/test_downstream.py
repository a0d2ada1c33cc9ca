"""Downstream stack tests: folds, preprocessing, classifiers, metrics,
and the embedding extractor."""

import os
import pickle

import numpy as np
import pytest

from l3embedding_tpu.classifier.metrics import aggregate_metrics, compute_metrics
from l3embedding_tpu.data.usc.folds import get_split, get_valid_fold_idx
from l3embedding_tpu.embed.extract import frame_uniform


def make_features_dir(root, dataset="us8k", num_folds=10, files_per_fold=10,
                      frames=20, dim=32, n_classes=10, seed=0):
    rng = np.random.RandomState(seed)
    feat_dir = os.path.join(root, "features", dataset, "l3", "melspec2", "short")
    for fold in range(1, num_folds + 1):
        fold_dir = os.path.join(feat_dir, f"fold{fold}")
        os.makedirs(fold_dir, exist_ok=True)
        for i in range(files_per_fold):
            y = i % n_classes
            # Class-separable synthetic embeddings.
            X = rng.randn(frames, dim).astype(np.float32) + 3.0 * y
            np.savez_compressed(
                os.path.join(fold_dir, f"file{fold}-{y}-0-{i}.npz"), X=X, y=y
            )
    return feat_dir


@pytest.fixture(scope="module")
def features_dir(tmp_path_factory):
    return make_features_dir(str(tmp_path_factory.mktemp("ds")))


def test_metrics():
    y = [0, 0, 1, 1, 2, 2]
    pred = [0, 1, 1, 1, 2, 0]
    m = compute_metrics(y, pred, num_classes=3)
    assert m["accuracy"] == pytest.approx(4 / 6)
    assert m["class_accuracy"][1] == pytest.approx(1.0)
    agg = aggregate_metrics(
        [{"accuracy": 0.5}, {"accuracy": 0.7}, {"accuracy": 0.9}]
    )
    assert agg["accuracy"]["mean"] == pytest.approx(0.7)
    assert agg["accuracy"]["max"] == pytest.approx(0.9)


def test_get_split_structure(features_dir):
    train, valid, test = get_split(features_dir, 0, "us8k")
    assert get_valid_fold_idx(0, 10) == 9
    # 8 train folds x 10 files x 20 frames
    assert train["features"].shape == (8 * 10 * 20, 32)
    assert valid["features"].shape == (10 * 20, 32)
    assert test["features"].shape == (10 * 20, 32)
    assert train["file_idxs"].shape == (80, 2)
    # file_idxs spans are contiguous and global
    assert train["file_idxs"][0][0] == 0
    assert train["file_idxs"][-1][-1] == train["features"].shape[0]


@pytest.mark.parametrize("model_type", ["svm", "mlp"])
def test_classifier_end_to_end(features_dir, tmp_path, model_type):
    from l3embedding_tpu.classifier.train import train

    out = str(tmp_path / f"cls_{model_type}")
    model_dir, results = train(
        features_dir,
        out,
        fold_num=1,
        model_type=model_type,
        feature_mode="framewise",
        random_state=5,
        num_epochs=60,
        learning_rate=1e-3,
    ) if model_type == "mlp" else train(
        features_dir, out, fold_num=1, model_type=model_type,
        feature_mode="framewise", random_state=5,
    )
    assert os.path.exists(os.path.join(model_dir, "config.json"))
    assert os.path.exists(os.path.join(model_dir, "results.pkl"))
    assert os.path.exists(os.path.join(model_dir, "stdizer.pkl"))
    with open(os.path.join(model_dir, "results.pkl"), "rb") as f:
        saved = pickle.load(f)
    # Synthetic classes are linearly separable — expect near-perfect test acc.
    assert saved["test"]["accuracy"] > 0.9
    assert "average_class_accuracy" in saved["test"]


def test_classifier_stats_mode(features_dir, tmp_path):
    from l3embedding_tpu.classifier.train import train

    model_dir, results = train(
        features_dir, str(tmp_path / "cls_stats"), fold_num=2,
        model_type="svm", feature_mode="stats", random_state=5,
    )
    assert results["test"]["accuracy"] >= 0.8


def test_frame_uniform_matches_reference_formula():
    sr = 48000
    # 2.5 s audio, hop 0.1 s → windows cover all samples with centering
    audio = np.random.RandomState(0).randn(int(2.5 * sr)).astype(np.float32)
    frames = frame_uniform(audio, sr=sr, hop_size=0.1)
    assert frames.shape[1] == sr
    hop = int(0.1 * sr)
    # Reference pad formula (features.py:283-293)
    audio_length = len(audio)
    pad_length = int(np.ceil(audio_length - sr) / hop) * hop - (audio_length - sr)
    expected_n = (audio_length + pad_length - sr) // hop + 1
    assert frames.shape[0] == expected_n
    # Short audio gets one centered window.
    short = np.ones(1000, dtype=np.float32)
    frames = frame_uniform(short, sr=sr)
    assert frames.shape == (1, sr)
    assert frames.sum() == pytest.approx(1000.0)


def test_embedding_extractor_tiny(tmp_path):
    from l3embedding_tpu.embed.extract import EmbeddingExtractor
    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.training import checkpoints

    import jax

    # Save tiny_L3 variables, reload through the extractor, embed audio.
    spec = build_model("tiny_L3")
    model = spec.module()
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 1, 48000), np.float32),
        train=False,
    )
    path = str(tmp_path / "tiny.ckpt")
    checkpoints.save_variables(path, variables["params"], variables["batch_stats"])

    ex = EmbeddingExtractor(path, "tiny_L3", "original")
    audio = np.random.RandomState(1).randn(96000).astype(np.float32) * 0.1
    emb = ex.embed_audio(audio, hop_size=0.5)
    assert emb.ndim == 2
    assert emb.shape[1] == 350  # tiny audio tower flatten dim (7*5*10)
    assert np.all(np.isfinite(emb))
    # Determinism: same audio → same embeddings.
    np.testing.assert_array_equal(emb, ex.embed_audio(audio, hop_size=0.5))


def test_device_framing_matches_host_framing():
    """device_framing uploads the file's PCM once and slices windows on
    device (extract.py _framed_fn; SURVEY §5.7 framing-as-gather). Rows
    must match the host frame_uniform path to f32 tolerance at every
    alignment case: hop-aligned, dropped non-aligned tail (the
    reference's ceil-on-the-difference quirk), exactly one window, and
    the short-audio fallback (which takes the host path for its
    centered padding)."""
    from l3embedding_tpu.embed.extract import EmbeddingExtractor

    ex = EmbeddingExtractor(None, "tiny_L3", "original",
                            device_framing=True)
    rng = np.random.RandomState(3)
    sr = ex.sr
    for length, hop in ((int(2.5 * sr), 0.5), (int(2.5 * sr) + 777, 0.5),
                        (sr, 0.1), (sr // 3, 0.1)):
        audio = (rng.randn(length) * 0.1).astype(np.float32)
        got = ex.embed_audio(audio, hop_size=hop)
        want = ex.embed_audio(audio, hop_size=hop, device_framing=False)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_device_framing_db_batch_global_padding_rows():
    """Bucket-padding rows in the device-framed batch must be exactly
    zero, like the host path's zero-pad windows. Under the kapre
    batch-global dB quirk the dB reference is a max over the WHOLE
    batch; the staged device buffer's padding windows overlap the
    clip's trailing PCM — including a loud non-hop-aligned tail that
    the reference framing drops from every real window — so unmasked
    padding rows silently shift every real embedding."""
    from l3embedding_tpu.embed.extract import EmbeddingExtractor

    ex = EmbeddingExtractor(None, "tiny_L3", "original",
                            db_batch_global=True, device_framing=True)
    rng = np.random.RandomState(4)
    sr = ex.sr
    # 4 real windows at hop 0.5 s (bucket 16 → 12 padding rows); the
    # dropped 7777-sample tail is much louder than any real window.
    audio = (rng.randn(int(2.5 * sr) + 7777) * 0.05).astype(np.float32)
    audio[-7777:] = 0.95
    got = ex.embed_audio(audio, hop_size=0.5)
    want = ex.embed_audio(audio, hop_size=0.5, device_framing=False)
    assert got.shape == want.shape == (4, 350)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fold_generation_write_behind_matches_serial(tmp_path):
    """The datasets' write-behind loop (_PendingWriter + deferred
    device handles) must produce byte-identical npz contents to the
    serial per-file path, land every pending file at loop end, and
    keep the idempotent skip behavior."""
    from l3embedding_tpu.data.audio_io import write_wav
    from l3embedding_tpu.data.usc import datasets
    from l3embedding_tpu.embed import EmbeddingExtractor

    sr = 48000
    rng = np.random.RandomState(0)
    audio_dir = tmp_path / "audio" / "fold1"
    audio_dir.mkdir(parents=True)
    names = ["bus01", "bus02", "park01", "park02", "tube01"]
    clips = {}
    for i, stem in enumerate(names):
        x = (rng.randn(int((1.2 + 0.4 * i) * sr)) * 0.1).astype(np.float32)
        clips[stem] = x
        write_wav(str(audio_dir / f"{stem}.wav"), x, sr)

    ex = EmbeddingExtractor(None, "tiny_L3", "short")
    out_dir = str(tmp_path / "features")
    datasets.generate_dcase2013_fold_data(
        str(tmp_path / "audio"), 0, out_dir, l3embedding_model=ex,
        features="l3", hop_size=0.5,
    )

    fold_out = os.path.join(out_dir, "fold1")
    got_files = sorted(os.listdir(fold_out))
    assert got_files == [f"{s}.npz" for s in sorted(names)]
    from l3embedding_tpu.data.audio_io import load_audio

    for stem in names:
        with np.load(os.path.join(fold_out, f"{stem}.npz")) as z:
            # Compare against the serial path on the SAME decoded PCM
            # (the wav round-trip quantizes to int16).
            decoded = load_audio(str(audio_dir / f"{stem}.wav"), sr)
            want_X = ex.embed_audio(decoded, hop_size=0.5)
            np.testing.assert_array_equal(z["X"], want_X)
            assert int(z["y"]) == datasets.DCASE2013_CLASS_TO_INT[stem[:-2]]

    # Idempotency: a rerun skips every existing file (mtimes unchanged).
    mtimes = {f: os.path.getmtime(os.path.join(fold_out, f))
              for f in got_files}
    datasets.generate_dcase2013_fold_data(
        str(tmp_path / "audio"), 0, out_dir, l3embedding_model=ex,
        features="l3", hop_size=0.5,
    )
    assert mtimes == {f: os.path.getmtime(os.path.join(fold_out, f))
                      for f in got_files}


def test_preprocess_features_applies_without_refitting(tmp_path):
    """preprocess_features must APPLY previously-fitted scalers. The
    reference's version (features.py:152-163, dead code there) called
    min_max_scaler.fit_transform — refitting on the new data and
    silently applying min-max even when training skipped it."""
    from sklearn.preprocessing import MinMaxScaler, StandardScaler

    from l3embedding_tpu.data.usc.features import preprocess_features

    rng = np.random.RandomState(0)
    train = rng.randn(50, 4) * 3.0 + 1.0
    mm = MinMaxScaler().fit(train)
    sd = StandardScaler().fit(mm.transform(train))

    new = rng.randn(8, 4) * 10.0 - 5.0  # different range than train
    data = {"features": new.copy(), "labels": np.zeros(8, int),
            "file_idxs": np.array([[0, 8]])}
    preprocess_features(data, mm, sd, feature_mode="framewise")
    want = sd.transform(mm.transform(new))
    np.testing.assert_allclose(data["features"], want, rtol=1e-12)
    # Scaler params unchanged (no refit on the new data).
    np.testing.assert_array_equal(mm.data_min_, train.min(axis=0))

    # An UNFITTED min-max scaler (training ran use_min_max=False) is
    # skipped, not silently fitted.
    data2 = {"features": new.copy(), "labels": np.zeros(8, int),
             "file_idxs": np.array([[0, 8]])}
    preprocess_features(data2, MinMaxScaler(), sd, feature_mode="framewise")
    np.testing.assert_allclose(data2["features"], sd.transform(new))


def test_augment_skip_keyed_on_dataset_name(tmp_path):
    """get_split(dataset_name='us8k') must skip augmented variants
    ('_'-suffixed files) in valid/test folds even when the feature
    directory path does not contain 'us8k' (the reference keyed the
    skip on the path substring only, reference folds.py:35-36)."""
    from l3embedding_tpu.data.usc.folds import get_fold, get_split

    feat_dir = tmp_path / "urbansound_features"  # no 'us8k' in the path
    for fold in range(1, 11):
        d = feat_dir / f"fold{fold}"
        d.mkdir(parents=True)
        np.savez(d / "100032-3-0-0.npz", X=np.full((2, 5), fold, float),
                 y=3)
        np.savez(d / "100032-3-0-0_aug1.npz",
                 X=np.full((3, 5), -fold, float), y=3)

    train, valid, test = get_split(str(feat_dir), 0, "us8k")
    # Test fold: augmented variant skipped -> 2 rows from one file.
    assert test["features"].shape == (2, 5)
    assert valid["features"].shape == (2, 5)
    # Train folds keep augmented variants (augment=True): 8 folds x 5.
    assert train["features"].shape == (8 * 5, 5)
    # Direct get_fold without dataset_name falls back to the reference's
    # path heuristic (keeps everything here since the path lacks 'us8k').
    raw = get_fold(str(feat_dir), 0)
    assert raw["features"].shape == (5, 5)


def test_get_restart_info_header_only_csv(tmp_path):
    """A kill/disk-full before the first history row leaves a header-only
    CSV; resume must degrade to fresh-start instead of crashing."""
    from l3embedding_tpu.training.loop import HISTORY_CSV_FIELDS, get_restart_info

    p = tmp_path / "history_csvlog.csv"
    p.write_text(",".join(HISTORY_CSV_FIELDS) + "\n")
    assert get_restart_info(str(p)) is None
    p.write_text("")  # fully empty file
    assert get_restart_info(str(p)) is None
