"""Smoke tests for the worked examples (examples/ — the replacements for
the reference's ad-hoc notebooks, see examples/README.md). Each runs as
a real subprocess the way a user would, CPU-pinned, on tiny configs."""

import os
import subprocess
import sys
import wave

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ)
    env["L3_FORCE_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def trained_demo(tmp_path_factory):
    """One train_avc run shared by the extract test (the expensive part)."""
    workdir = tmp_path_factory.mktemp("exdemo")
    res = _run(["examples/train_avc.py", str(workdir), "-e", "1"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "val_acc per epoch" in res.stdout
    run_dirs = []
    base = workdir / "out" / "embedding" / "train" / "tiny_L3"
    if base.is_dir():
        run_dirs = sorted(base.iterdir())
    assert run_dirs, res.stdout
    ckpt = run_dirs[-1] / "model_latest.ckpt"
    assert ckpt.exists()
    return workdir, str(ckpt)


def test_train_and_extract_examples(trained_demo):
    workdir, ckpt = trained_demo
    wav = str(workdir / "tone.wav")
    x = (np.sin(2 * np.pi * 440 * np.arange(96000) / 48000) * 16000).astype(
        np.int16
    )
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(x.tobytes())

    out = str(workdir / "emb.npz")
    res = _run(["examples/extract_embeddings.py", ckpt, "tiny_L3", wav,
                "-o", out])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "windows x" in res.stdout
    emb = np.load(out)["embedding"]
    assert emb.shape[0] == 11  # 2s file, 1s windows, 0.1s hop
    assert np.isfinite(emb).all()


def test_stream_example():
    res = _run(["examples/stream_embeddings.py", "--seconds", "1.6"])
    assert res.returncode == 0, res.stderr[-2000:]
    # The example asserts stream rows == whole-clip extraction internally;
    # the printed diffs are the proof the session API matches.
    assert "vs whole-clip extraction" in res.stdout
    assert "max |diff| in-process 0.00e+00" in res.stdout


def test_serve_example():
    res = _run(["examples/serve_embeddings.py", "--clients", "2",
                "--clips-per-client", "2"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "client 0" in res.stdout and "client 1" in res.stdout
