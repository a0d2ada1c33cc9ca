"""Tests for the one-call OpenL3-style API (l3embedding_tpu/api.py)."""

import numpy as np
import pytest

from l3embedding_tpu import api
from l3embedding_tpu.data.audio_io import write_wav
from l3embedding_tpu.embed.extract import frame_uniform


@pytest.fixture(scope="module")
def tiny_model():
    return api.load_audio_embedding_model(model_type="tiny_L3",
                                          embedding_size=512)


def test_get_audio_embedding_shapes_and_timestamps(tiny_model):
    rng = np.random.RandomState(0)
    audio = rng.uniform(-0.5, 0.5, 72000).astype(np.float32)  # 1.5 s
    emb, ts = api.get_audio_embedding(audio, 48000, model=tiny_model)
    # center=True pads 0.5 s at the front; trailing partial kept:
    # n = 1 + ceil((96000 - 48000) / 4800) = 11.
    assert emb.shape[0] == 11
    assert emb.dtype == np.float32
    np.testing.assert_allclose(ts, np.arange(11) * 0.1)


def test_get_audio_embedding_no_center(tiny_model):
    audio = np.zeros(72000, np.float32)
    emb, ts = api.get_audio_embedding(audio, 48000, model=tiny_model,
                                      center=False)
    # n = 1 + ceil((72000 - 48000) / 4800) = 6.
    assert emb.shape[0] == 6


def test_reference_framing_matches_05_pipeline(tiny_model):
    rng = np.random.RandomState(1)
    audio = rng.uniform(-0.5, 0.5, 60000).astype(np.float32)
    emb, _ = api.get_audio_embedding(audio, 48000, model=tiny_model,
                                     reference_framing=True)
    ref_windows = frame_uniform(audio, 48000, 0.1)
    assert emb.shape[0] == ref_windows.shape[0]
    np.testing.assert_allclose(emb, tiny_model.embed_windows(ref_windows),
                               rtol=1e-5, atol=1e-5)


def test_multichannel_int16_input(tiny_model):
    rng = np.random.RandomState(2)
    stereo = (rng.uniform(-0.3, 0.3, (48000, 2)) * 32767).astype(np.int16)
    emb, ts = api.get_audio_embedding(stereo, 48000, model=tiny_model)
    assert emb.shape[0] == len(ts) >= 1
    assert np.isfinite(emb).all()
    # Int PCM must be scaled to [-1, 1] BEFORE the mono mix — identical
    # to handing in the float mono mix directly.
    from l3embedding_tpu.data.audio_io import pcm2float

    mono = pcm2float(stereo).mean(axis=1).astype(np.float32)
    ref, _ = api.get_audio_embedding(mono, 48000, model=tiny_model)
    np.testing.assert_allclose(emb, ref, rtol=1e-5, atol=1e-5)


def test_resampling_path(tiny_model):
    rng = np.random.RandomState(3)
    audio_16k = rng.uniform(-0.5, 0.5, 24000).astype(np.float32)  # 1.5 s
    emb, _ = api.get_audio_embedding(audio_16k, 16000, model=tiny_model)
    assert emb.shape[0] == 11  # same windows as the 48 kHz 1.5 s clip


def test_get_audio_embedding_list_semantics(tiny_model):
    """openl3 accepts a list of audio arrays sharing one model; the
    result is (embeddings, timestamps) lists, per-input identical to
    the scalar calls."""
    rng = np.random.RandomState(4)
    a1 = rng.uniform(-0.5, 0.5, 72000).astype(np.float32)
    a2 = rng.uniform(-0.5, 0.5, 24000).astype(np.float32)  # 16 kHz, 1.5 s
    embs, tss = api.get_audio_embedding([a1, a2], [48000, 16000],
                                        model=tiny_model)
    assert isinstance(embs, list) and len(embs) == len(tss) == 2
    want1, _ = api.get_audio_embedding(a1, 48000, model=tiny_model)
    want2, _ = api.get_audio_embedding(a2, 16000, model=tiny_model)
    np.testing.assert_allclose(embs[0], want1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(embs[1], want2, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="sample rates"):
        api.get_audio_embedding([a1, a2], [48000], model=tiny_model)


def test_get_image_embedding_list_semantics(image_model):
    rng = np.random.RandomState(6)
    ims = [rng.randint(0, 256, (2, 224, 224, 3), dtype=np.uint8),
           rng.randint(0, 256, (3, 224, 224, 3), dtype=np.uint8)]
    outs = api.get_image_embedding(ims, model=image_model)
    assert isinstance(outs, list) and [o.shape[0] for o in outs] == [2, 3]
    embs, tss = api.get_image_embedding(ims, frame_rate=2.0,
                                        model=image_model)
    assert len(embs) == len(tss) == 2
    np.testing.assert_allclose(tss[1], np.arange(3) / 2.0)


def test_embedding_size_validation():
    with pytest.raises(ValueError, match="embedding_size"):
        api.load_audio_embedding_model(model_type="tiny_L3",
                                       embedding_size=123)
    with pytest.raises(ValueError, match="input_repr"):
        api.load_audio_embedding_model(input_repr="nope")


def test_input_repr_map_covers_full_models():
    from l3embedding_tpu.models.registry import MODELS

    assert set(api.INPUT_REPRS.values()) <= set(MODELS)
    assert api.INPUT_REPRS["mel256"] == "cnn_L3_melspec2"


def test_process_audio_file(tmp_path, tiny_model):
    rng = np.random.RandomState(4)
    audio = rng.uniform(-0.5, 0.5, 52000).astype(np.float32)
    wav = str(tmp_path / "clip.wav")
    write_wav(wav, (audio * 32767).astype(np.int16), 48000)

    out = api.process_audio_file(wav, output_dir=str(tmp_path),
                                 suffix="tiny", model=tiny_model)
    assert out.endswith("clip_tiny.npz")
    data = np.load(out)
    assert set(data.files) == {"embedding", "timestamps"}
    assert data["embedding"].shape[0] == len(data["timestamps"])

    # overwrite=False short-circuits (mtime unchanged).
    import os

    before = os.stat(out).st_mtime_ns
    out2 = api.process_audio_file(wav, output_dir=str(tmp_path),
                                  suffix="tiny", model=tiny_model,
                                  overwrite=False)
    assert out2 == out and os.stat(out).st_mtime_ns == before

    # List input returns a list.
    outs = api.process_audio_file([wav], output_dir=str(tmp_path),
                                  model=tiny_model)
    assert isinstance(outs, list) and outs[0].endswith("clip.npz")


def test_get_image_embedding_tiny():
    model = api.ImageEmbeddingModel(model_type="tiny_L3")
    frames = np.random.RandomState(5).randint(
        0, 256, (2, 224, 224, 3), dtype=np.uint8
    )
    emb = api.get_image_embedding(frames, model=model)
    assert emb.shape[0] == 2
    assert np.isfinite(emb).all()
    # uint8 and equivalent [-1,1] float give identical embeddings.
    as_float = 2.0 * (frames.astype(np.float32) / 255.0) - 1.0
    np.testing.assert_allclose(emb, model.embed_frames(as_float),
                               rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def image_model():
    return api.ImageEmbeddingModel(model_type="tiny_L3")


def test_preprocess_frames_resize_and_crop():
    rng = np.random.RandomState(6)
    frames = rng.randint(0, 256, (2, 120, 160, 3), dtype=np.uint8)
    out = api.preprocess_frames(frames)
    # min side 120 → 256 (scale ceil: 160 → 342), center crop 224.
    assert out.shape == (2, 224, 224, 3)
    assert out.dtype == np.uint8
    # already-224 input passes through untouched.
    ready = rng.randint(0, 256, (1, 224, 224, 3), dtype=np.uint8)
    assert api.preprocess_frames(ready) is ready


def test_get_image_embedding_frame_rate_timestamps(image_model):
    frames = np.random.RandomState(7).randint(
        0, 256, (3, 224, 224, 3), dtype=np.uint8)
    emb, ts = api.get_image_embedding(frames, frame_rate=2.0,
                                      model=image_model)
    assert emb.shape[0] == 3
    np.testing.assert_allclose(ts, [0.0, 0.5, 1.0])


def test_get_image_embedding_arbitrary_size(image_model):
    frame = np.random.RandomState(8).randint(
        0, 256, (300, 400, 3), dtype=np.uint8)
    emb = api.get_image_embedding(frame, model=image_model)
    assert emb.shape[0] == 1 and np.isfinite(emb).all()


def test_process_image_file(tmp_path, image_model):
    from PIL import Image

    rng = np.random.RandomState(9)
    png = str(tmp_path / "img.png")
    Image.fromarray(
        rng.randint(0, 256, (240, 260, 3), dtype=np.uint8)).save(png)
    npy = str(tmp_path / "img2.npy")
    np.save(npy, rng.randint(0, 256, (224, 224, 3), dtype=np.uint8))

    outs = api.process_image_file([png, npy], output_dir=str(tmp_path),
                                  model=image_model)
    assert outs[0].endswith("img.npz") and outs[1].endswith("img2.npz")
    for out in outs:
        data = np.load(out)
        assert data["embedding"].ndim == 1  # single image → 1-D vector
        assert np.isfinite(data["embedding"]).all()


@pytest.fixture()
def video_npz(tmp_path):
    rng = np.random.RandomState(10)
    frames = rng.randint(0, 256, (6, 256, 300, 3), dtype=np.uint8)
    audio = (rng.uniform(-0.4, 0.4, 48000) * 32767).astype(np.int16)
    path = str(tmp_path / "clip.npz")
    np.savez(path, video=frames, audio=audio, sr=48000, fps=3.0)
    return path


def test_process_video_file_both_modalities(tmp_path, video_npz,
                                            tiny_model, image_model):
    entry = api.process_video_file(video_npz, output_dir=str(tmp_path),
                                   audio_model=tiny_model,
                                   image_model=image_model)
    assert entry["audio"].endswith("clip_audio.npz")
    assert entry["image"].endswith("clip_image.npz")
    img = np.load(entry["image"])
    # fps=3, frame_rate=1 → every 3rd of 6 frames = 2, ts at source step.
    assert img["embedding"].shape[0] == 2
    np.testing.assert_allclose(img["timestamps"], [0.0, 1.0])
    aud = np.load(entry["audio"])
    # 1 s at 48 kHz, centered: n = 1 + ceil(24000 / 4800) = 6.
    assert aud["embedding"].shape[0] == len(aud["timestamps"]) == 6


def test_process_video_file_no_audio_track(tmp_path, image_model):
    frames = np.random.RandomState(11).randint(
        0, 256, (3, 256, 256, 3), dtype=np.uint8)
    npy = str(tmp_path / "frames.npy")
    np.save(npy, frames)
    entry = api.process_video_file(npy, output_dir=str(tmp_path),
                                   image_model=image_model,
                                   source_fps=3.0)
    assert entry["audio"] is None
    assert np.load(entry["image"])["embedding"].shape[0] == 1


def test_cli_main_audio(tmp_path, tiny_model, monkeypatch):
    rng = np.random.RandomState(12)
    wav = str(tmp_path / "cli.wav")
    write_wav(wav, (rng.uniform(-0.4, 0.4, 50000) * 32767).astype(np.int16),
              48000)
    # Reuse the module-scoped tiny extractor instead of re-jitting.
    monkeypatch.setattr(api, "load_audio_embedding_model",
                        lambda *a, **k: tiny_model)
    rc = api.main([wav, "--output-dir", str(tmp_path), "--suffix", "cli",
                   "--model-type", "tiny_L3"])
    assert rc == 0
    data = np.load(str(tmp_path / "cli_cli.npz"))
    assert set(data.files) == {"embedding", "timestamps"}


def test_cli_main_video(tmp_path, video_npz, tiny_model, image_model,
                        monkeypatch):
    monkeypatch.setattr(api, "load_audio_embedding_model",
                        lambda *a, **k: tiny_model)
    monkeypatch.setattr(api, "ImageEmbeddingModel",
                        lambda *a, **k: image_model)
    rc = api.main([video_npz, "--modality", "video",
                   "--output-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "clip_audio.npz").exists()
    assert (tmp_path / "clip_image.npz").exists()


def test_frame_openl3_matches_bruteforce_oracle():
    """Property-pin the strided framing against an index-arithmetic-free
    oracle across awkward lengths (shorter than a window, exact multiple,
    one-sample spillover)."""
    sr, hop = 1000, 0.1  # window 1000, hop 100 — scaled-down geometry
    rng = np.random.RandomState(13)
    for n in [1, 999, 1000, 1001, 1050, 1100, 1101, 2000, 2049, 5000]:
        audio = rng.uniform(-1, 1, n).astype(np.float32)
        for center in (True, False):
            got = api._frame_openl3(audio, sr, hop, center)
            padded = np.concatenate([np.zeros(sr // 2, np.float32), audio]) \
                if center else audio
            expect = []
            start = 0
            while True:
                win = padded[start : start + sr]
                expect.append(np.pad(win, (0, sr - len(win))))
                if start + sr >= len(padded):
                    break
                start += int(hop * sr)
            expect = np.stack(expect)
            assert got.shape == expect.shape, (n, center)
            np.testing.assert_array_equal(got, expect, err_msg=f"{n},{center}")
