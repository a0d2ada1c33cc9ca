"""Cross-stage integration: trained checkpoint → 05 embedding extraction
over real WAV files (CLI, with model-path layout inference) → 06
classifier training on the generated features. Uses tiny_L3 and the
dcase2013 layout (smallest: 2 folds, filename-prefix labels)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from l3embedding_tpu.data.audio_io import write_wav
from l3embedding_tpu.models import build_model
from l3embedding_tpu.training import checkpoints

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    # The env var alone cannot keep a subprocess off the axon TPU
    # tunnel (sitecustomize registers the plugin at interpreter start;
    # during an outage the first backend lookup hangs on it);
    # L3_FORCE_PLATFORM makes l3embedding_tpu pin the config at import.
    L3_FORCE_PLATFORM="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)

CLASSES = [
    "bus", "busystreet", "office", "openairmarket", "park", "quietstreet",
    "restaurant", "supermarket", "tube", "tubestation",
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")

    # 1. A tiny_L3 "trained" checkpoint in the reference directory layout
    #    (05 infers model_type + output layout from the path string).
    model_dir = root / "out" / "embedding" / "subset" / "tiny_L3" / "20240101"
    model_dir.mkdir(parents=True)
    spec = build_model("tiny_L3")
    model = spec.module()
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 1, 48000), np.float32),
        train=False,
    )
    ckpt = model_dir / "model_best_valid_accuracy.ckpt"
    checkpoints.save_variables(
        str(ckpt), variables["params"], variables["batch_stats"]
    )

    # 2. dcase2013-layout audio: fold{1,2}/<class><idx>.wav, per-class
    #    tones so embeddings are class-separable even with random weights.
    rng = np.random.RandomState(0)
    sr = 48000
    audio_dir = root / "dcase_audio"
    for fold in (1, 2):
        d = audio_dir / f"fold{fold}"
        d.mkdir(parents=True)
        for ci, cls in enumerate(CLASSES):
            for idx in range(2):
                f0 = 500.0 + 2300.0 * ci
                t = np.arange(int(2.5 * sr)) / sr
                x = 0.4 * np.sin(2 * np.pi * f0 * t)
                x += rng.randn(len(t)) * 0.01
                write_wav(str(d / f"{cls}{fold}{idx}.wav"), x, sr)

    return root, str(ckpt), str(audio_dir)


def test_05_then_06(setup):
    root, ckpt, audio_dir = setup
    out_dir = str(root / "featout")

    # Stage 05 via the CLI (exercises path-inference + extractor).
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "05_generate_embedding_samples.py"),
            "-lmp", ckpt, "-lpt", "original", "-hs", "0.5",
            "dcase2013", audio_dir, out_dir,
        ],
        # Contention margin: observed passing in ~280 s solo on this
        # 1-core image but timing out at 600 when run alongside other
        # compiling tests (same pattern as test_03_cli_functional).
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    features_dir = os.path.join(
        out_dir, "features", "dcase2013", "l3", "original", "subset", "tiny_L3"
    )
    assert os.path.isdir(features_dir), res.stdout + res.stderr
    for fold in (1, 2):
        fold_dir = os.path.join(features_dir, f"fold{fold}")
        files = sorted(os.listdir(fold_dir))
        assert len(files) == len(CLASSES) * 2
        data = np.load(os.path.join(fold_dir, files[0]))
        assert data["X"].ndim == 2 and data["X"].shape[1] == 350
        assert data["X"].shape[0] >= 1

    # Stage 06: dcase2013 has 2 folds, so validation comes from a
    # stratified split of train (parameter search without valid fold,
    # the reference's dcase configuration).
    from l3embedding_tpu.classifier.train import train

    model_dir, results = train(
        features_dir,
        str(root / "results"),
        fold_num=1,
        model_type="svm",
        feature_mode="framewise",
        parameter_search=True,
        parameter_search_valid_fold=False,
        parameter_search_train_with_valid=True,
        random_state=3,
    )
    assert os.path.exists(os.path.join(model_dir, "results.pkl"))
    assert "accuracy" in results["test"]
    # Tone classes are trivially separable even through random conv
    # features — expect strong file-level accuracy.
    assert results["test"]["accuracy"] >= 0.4


def test_05_mesh_matches_single_device(setup):
    """`05 --mesh` shards window batches over the (virtual 8-CPU-device)
    mesh from the CLI; rows must match single-device extraction. Runs
    one fold at a coarse hop to bound cost."""
    root, ckpt, audio_dir = setup
    out_dir = str(root / "featout_mesh")

    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "05_generate_embedding_samples.py"),
            "-lmp", ckpt, "-lpt", "original", "-hs", "0.5",
            "--mesh", "--fold", "1",
            "dcase2013", audio_dir, out_dir,
        ],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    fold_dir = os.path.join(
        out_dir, "features", "dcase2013", "l3", "original", "subset",
        "tiny_L3", "fold1",
    )
    files = sorted(os.listdir(fold_dir))
    assert len(files) == len(CLASSES) * 2

    from l3embedding_tpu.data.audio_io import load_audio
    from l3embedding_tpu.embed.extract import EmbeddingExtractor

    ex = EmbeddingExtractor(ckpt, "tiny_L3", "original")
    for name in files[::7]:  # spot-check a spread of files
        got = np.load(os.path.join(fold_dir, name))["X"]
        cls_file = os.path.splitext(name)[0] + ".wav"
        audio = load_audio(
            os.path.join(audio_dir, "fold1", cls_file), ex.sr
        )
        want = ex.embed_audio(audio, hop_size=0.5)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
