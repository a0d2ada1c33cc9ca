"""Functional tests for the repair tool and the 03 CLI surface."""

import csv
import glob
import os
import subprocess
import sys

import h5py
import numpy as np

from l3embedding_tpu.data import sample as S
from tests.test_sample_factory import make_corpus

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


def test_recompute_batch_audio(tmp_path):
    # Factory batches with metadata, then recompute the audio in place.
    root = str(tmp_path / "corpus")
    rows = make_corpus(root, n_videos=3)
    subset_csv = os.path.join(root, "subset.csv")
    with open(subset_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["ytid", "audio_filepath",
                                          "video_filepath"])
        w.writeheader()
        w.writerows(rows)
    batch_dir = str(tmp_path / "batches")
    S.sample_and_save(0, subset_csv, num_batches=2, output_dir=batch_dir,
                      num_streamers=2, batch_size=4, random_state=55,
                      augment=True, include_metadata=True)

    with h5py.File(glob.glob(batch_dir + "/*.h5")[0], "r") as f:
        before = np.asarray(f["audio"])

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "recompute_batch_audio.py"),
         batch_dir, subset_csv, "--verbose", "1"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    path = sorted(glob.glob(batch_dir + "/*.h5"))[0]
    with h5py.File(path, "r") as f:
        audio = np.asarray(f["audio"])
        gains = np.asarray(f["audio_gain"])
        starts = [int(x) for x in f["audio_start_sample_idx"]]
        files = [x.decode() for x in f["audio_file"]]
    assert audio.shape == before.shape
    assert np.all((gains >= 0.9) & (gains <= 1.1))
    # Recomputed audio must equal the source slice × new gain.
    from l3embedding_tpu.data.audio_io import read_audio, to_mono_int16

    fname_to_path = {os.path.basename(r["audio_filepath"]): r["audio_filepath"]
                     for r in rows}
    src, _ = read_audio(fname_to_path[files[0]])
    src = to_mono_int16(src).astype(float)
    expected = (src[starts[0]:starts[0] + 48000] * gains[0]).astype(np.int16)
    np.testing.assert_array_equal(audio[0, 0], expected)


def test_03_cli_functional(tmp_path):
    from tests.test_training import make_synthetic_corpus

    train_dir = str(tmp_path / "train_h5")
    valid_dir = str(tmp_path / "valid_h5")
    make_synthetic_corpus(train_dir, num_blobs=2, blob_size=16, seed=0)
    make_synthetic_corpus(valid_dir, num_blobs=1, blob_size=8, seed=1)
    out = str(tmp_path / "out")

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "03_train_embedding.py"),
         "-mt", "tiny_L3", "-e", "1", "-tes", "2", "-ves", "1",
         "-tbs", "8", "-vbs", "8", "-nl",
         train_dir, valid_dir, out],
        # 390 s solo on this 1-core image; 900 leaves margin for suite
        # contention (observed flaky at 600 when run alongside other
        # compiling tests).
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    runs = glob.glob(os.path.join(out, "embedding", "*", "tiny_L3", "*"))
    assert len(runs) == 1
    assert os.path.exists(os.path.join(runs[0], "model_latest.ckpt"))
    assert os.path.exists(os.path.join(runs[0], "history_csvlog.csv"))


def test_bench_input_pipeline_full_loop(tmp_path):
    """--full-loop drives the real h5+pipeline loop against a pre-staged
    device step and reports the loop/step ratio (VERDICT r2 #6); guarded
    on CPU with the tiny model."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wrapper = (
        "import os, sys, runpy; "
        "os.environ['JAX_PLATFORMS'] = 'cpu'; "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['bench_input_pipeline.py', str({str(tmp_path)!r}), "
        "'--full-loop', '--batch-size', '8', '--batches', '4', "
        "'--model-type', 'tiny_L3', '--dtype', 'f32', '--warmup', '1']; "
        "runpy.run_path('tools/bench_input_pipeline.py', run_name='__main__')"
    )
    # Corpus in tmp_path (not /dev/shm) so parallel test runs can't race.
    sys.path.insert(0, repo)
    from tools.bench_input_pipeline import synthesize_corpus

    synthesize_corpus(str(tmp_path), 2, 8)
    res = subprocess.run(
        [sys.executable, "-c", wrapper], cwd=repo,
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["platform"] == "cpu"
    assert out["full_loop_pairs_per_sec"] > 0
    # Contract test only: on a 1-core CPU the tiny-model step is so fast
    # that scheduling noise swamps the ratio (observed 0.97-1.55); the
    # meaningful measurement is the on-chip one in docs/DESIGN.md.
    assert out["loop_over_step_ratio"] > 0


def test_int8_task_delta_tool_f32_leg(tmp_path):
    """tools/int8_task_delta.py plumbing (corpus build → 05-path
    extraction → 06 SVM → JSON report), f32 tower only: the int8 leg is
    minutes-slow on XLA:CPU and its accuracy story is measured on-chip
    (INT8_TASK_DELTA_r05.json)."""
    import json

    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "int8_task_delta.py"),
            "--towers", "f32", "--files-per-class", "1", "--hop-size", "0.25",
            "--workdir", str(tmp_path / "wd"),
        ],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["probe"] == "int8_task_delta"
    assert report["platform"] == "cpu"
    assert 0.0 <= report["test_accuracy"]["f32"] <= 1.0
