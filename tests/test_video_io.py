"""Host-side video decode (data/video_io.py).

The ffmpeg binary does not exist in this image, so the production
subprocess path is exercised against stub ffmpeg/ffprobe executables
that honor the exact CLI contract the module emits — this pins the
command construction (probe JSON parsing, scale argument, rawvideo
reshape) that a real binary would receive.
"""

import json
import os
import stat

import numpy as np
import pytest

from l3embedding_tpu.data import video_io


def test_scaled_dims_ceil_matches_reference():
    # reference data/avc/sample.py:303-305 uses ceil on both sides.
    assert video_io.scaled_dims(640, 360) == (456, 256)
    assert video_io.scaled_dims(320, 240) == (342, 256)
    assert video_io.scaled_dims(256, 256) == (256, 256)
    # Upscaling small videos is also min-side-256.
    assert video_io.scaled_dims(100, 50) == (512, 256)


def test_read_video_npy_is_memory_mapped(tmp_path):
    path = str(tmp_path / "clip.npy")
    np.save(path, np.zeros((7, 256, 320, 3), np.uint8))
    out = video_io.read_video(path)
    assert out.shape == (7, 256, 320, 3)
    # The mmap contract is what makes the 02 factory fast (measured 93%
    # of factory time was eager whole-clip reads); regression-pin it.
    assert isinstance(out, np.memmap)


def test_read_video_npz(tmp_path):
    path = str(tmp_path / "clip.npz")
    np.savez(path, video=np.full((3, 256, 256, 3), 9, np.uint8))
    out = video_io.read_video(path)
    assert out.shape == (3, 256, 256, 3)
    assert out.max() == 9


@pytest.fixture
def stub_ffmpeg(tmp_path, monkeypatch):
    """Fake ffprobe/ffmpeg honoring the module's CLI contract: probe
    reports 320x240@30fps; ffmpeg parses the -s WxH argument and emits
    2 rawvideo RGB24 frames of that size with a recognizable fill."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    probe_json = json.dumps(
        {"streams": [{"width": 320, "height": 240,
                      "avg_frame_rate": "30/1"}]}
    )
    (bindir / "ffprobe").write_text(
        "#!/bin/sh\ncat <<'EOF'\n%s\nEOF\n" % probe_json
    )
    (bindir / "ffmpeg").write_text(
        """#!/usr/bin/env python3
import sys
args = sys.argv[1:]
size = args[args.index("-s") + 1]
w, h = (int(x) for x in size.split("x"))
sys.stdout.buffer.write(bytes([7]) * (2 * w * h * 3))
"""
    )
    for name in ("ffprobe", "ffmpeg"):
        p = bindir / name
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


def test_read_video_ffmpeg_contract(stub_ffmpeg, tmp_path):
    clip = tmp_path / "clip.mp4"
    clip.write_bytes(b"not really a video")
    out = video_io.read_video(str(clip))
    # 320x240 scaled so min side == 256: ceil(320*256/240) x 256.
    assert out.shape == (2, 256, 342, 3)
    assert out.dtype == np.uint8
    assert (out == 7).all()


def test_probe_video_parses_fps(stub_ffmpeg):
    w, h, fps = video_io.probe_video("whatever.mp4")
    assert (w, h) == (320, 240)
    assert fps == pytest.approx(30.0)


def test_read_video_error_without_any_decoder(tmp_path, monkeypatch):
    # No ffmpeg on PATH (true in this image) and imageio cannot decode a
    # bogus container -> the layered fallback must end in the actionable
    # RuntimeError, not an obscure plugin traceback.
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing executable here
    bogus = tmp_path / "clip.mp4"
    bogus.write_bytes(b"\x00\x01\x02")
    with pytest.raises(RuntimeError, match="pre-decoded"):
        video_io.read_video(str(bogus))
