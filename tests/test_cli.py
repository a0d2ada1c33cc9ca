"""CLI surface tests: every numbered stage parses the reference's flags;
functional smoke tests for the host-side stages (01, 02, 04, reporting).
"""

import csv
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

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


def run_cli(script, *args, check=True):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300,
    )
    if check and out.returncode != 0:
        raise AssertionError(
            f"{script} failed ({out.returncode}):\n{out.stdout}\n{out.stderr}"
        )
    return out


@pytest.mark.parametrize(
    "script",
    [
        "01_create_subsets.py",
        "02_generate_samples.py",
        "03_train_embedding.py",
        "04_plot_training_history.py",
        "05_generate_embedding_samples.py",
        "06_train_classifier.py",
        "recompute_batch_audio.py",
        "generate_plots_and_sig_tests.py",
    ],
)
def test_cli_help(script):
    out = run_cli(script, "--help")
    assert "usage" in out.stdout.lower()


def test_01_create_subsets_functional(tmp_path):
    # Paired audio/video corpus (contents unused by the split logic).
    data_dir = tmp_path / "corpus"
    (data_dir / "audio").mkdir(parents=True)
    (data_dir / "video").mkdir()
    for i in range(10):
        name = f"vid{i:02d}_000_010"
        (data_dir / "audio" / f"{name}.wav").write_bytes(b"")
        (data_dir / "video" / f"{name}.npy").write_bytes(b"")
    out_dir = tmp_path / "subsets"
    run_cli("01_create_subsets.py", str(data_dir), str(out_dir), "testset")
    for split, expected in (("train", 8), ("valid", 1), ("test", 1)):
        path = out_dir / f"testset_{split}.csv"
        assert path.exists()
        with open(path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == expected
        assert set(rows[0]) == {"ytid", "audio_filepath", "video_filepath"}


def test_04_plot_functional(tmp_path):
    run_dir = tmp_path / "model_id" / "20240101000000"
    run_dir.mkdir(parents=True)
    csv_path = run_dir / "history_csvlog.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["epoch", "acc", "loss", "val_acc",
                                          "val_loss"])
        w.writeheader()
        for e in range(3):
            w.writerow({"epoch": e, "acc": 0.5 + e * 0.1, "loss": 1 - e * 0.1,
                        "val_acc": 0.4 + e * 0.1, "val_loss": 1.1 - e * 0.1})
    out_png = tmp_path / "plot.png"
    run_cli("04_plot_training_history.py", str(csv_path), "-hd",
            "-o", str(out_png))
    assert out_png.exists() and out_png.stat().st_size > 0


def test_sig_tests_functional(tmp_path):
    # Fake results tree: two representations x 4 folds on one dataset.
    rng = np.random.RandomState(0)
    for rep, base in (("us8k/l3/short/melspec2/mlp", 0.8),
                      ("us8k/vggish/mlp", 0.7)):
        for fold in range(1, 5):
            d = tmp_path / "classifier" / rep / f"fold{fold}" / "20240101"
            d.mkdir(parents=True)
            with open(d / "results.pkl", "wb") as f:
                pickle.dump(
                    {"test": {"accuracy": base + rng.rand() * 0.05,
                              "average_class_accuracy": base}},
                    f,
                )
    out_dir = tmp_path / "report"
    out = run_cli("generate_plots_and_sig_tests.py", str(tmp_path),
                  str(out_dir))
    assert "pairwise tests" in out.stdout
    with open(out_dir / "sig_tests.json") as f:
        tests = json.load(f)
    assert len(tests) == 1
    assert tests[0]["n_folds"] == 4
    assert (out_dir / "us8k_test_acc.png").exists()


def test_02_generate_samples_functional(tmp_path):
    from tests.test_sample_factory import make_corpus

    root = str(tmp_path / "corpus")
    rows = make_corpus(root, n_videos=3)
    subset_csv = os.path.join(root, "subset.csv")
    with open(subset_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["ytid", "audio_filepath",
                                          "video_filepath"])
        w.writeheader()
        w.writerows(rows)
    out_dir = str(tmp_path / "h5")
    out = run_cli(
        "02_generate_samples.py", "-bs", "4", "-ns", "2", "-n", "2",
        "-a", "-r", "77", subset_csv, "16", out_dir,
    )
    import glob as _glob

    import h5py

    files = sorted(_glob.glob(os.path.join(out_dir, "*.h5")))
    # 16 samples / (2 workers x 4 batch) = 2 batches per worker.
    assert len(files) == 4
    with h5py.File(files[0], "r") as f:
        assert f["audio"].shape == (4, 1, 48000)
        assert f["video"].shape == (4, 224, 224, 3)


def test_sig_tests_grouped_report(tmp_path):
    """Reference-depth reporting: per-variable grouped Wilcoxon tests,
    Holm-adjusted p-values, best-score table, grouped boxplots
    (reference generate_plots_and_sig_tests.py:274-466)."""
    rng = np.random.RandomState(1)
    layouts = []
    for dataset, n_folds in (("us8k", 4), ("esc50", 5)):
        for subset in ("music", "environmental"):
            for rep, base in (("melspec2", 0.80), ("melspec1", 0.70)):
                layouts.append((dataset, subset, rep, base, n_folds))
    for dataset, subset, rep, base, n_folds in layouts:
        rep_id = (f"{dataset}/l3/original/{subset}_train/"
                  f"cnn_L3_{rep}/20240101/framewise/overlap/no-min-max/mlp")
        for fold in range(1, n_folds + 1):
            d = tmp_path / "classifier" / rep_id / f"fold{fold}" / "t0"
            d.mkdir(parents=True)
            class_acc = (base + rng.rand(10) * 0.05).tolist()
            with open(d / "results.pkl", "wb") as f:
                pickle.dump(
                    {"test": {
                        "accuracy": float(np.mean(class_acc)),
                        "average_class_accuracy": float(np.mean(class_acc)),
                        "class_accuracy": class_acc,
                    }},
                    f,
                )
    out_dir = tmp_path / "report"
    out = run_cli("generate_plots_and_sig_tests.py", str(tmp_path),
                  str(out_dir))
    # Reference-style 'better than' lines for the representation grouping.
    assert "Input Representation" in out.stdout
    assert "better than" in out.stdout
    assert "best" in out.stdout  # best-average-score table

    with open(out_dir / "sig_tests_grouped.json") as f:
        grouped = json.load(f)
    groupings = {t["grouping"] for t in grouped}
    assert {"embedding_model_type", "audioset_subset",
            "full_identity"} <= groupings
    assert all("p_holm" in t for t in grouped)
    # M256 dominates M128 by construction → significant under Holm too.
    rep_tests = [t for t in grouped
                 if t["grouping"] == "embedding_model_type"]
    assert any(t["significant_holm"] for t in rep_tests)

    with open(out_dir / "best_scores.json") as f:
        best = json.load(f)
    assert best["us8k"]["best"].endswith("4_mel2")

    for fig in ("boxplot_by_embedding_model_type.png",
                "boxplot_by_audioset_subset.png",
                "us8k_test_acc.png", "esc50_test_acc.png"):
        assert (out_dir / fig).exists(), fig
