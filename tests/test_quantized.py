"""Int8 quantized extraction (embed/quantized.py).

BN folding must reproduce the f32 tower exactly (it is pure algebra),
and the int8 path must land close enough to make the measured-cosine
gate meaningful. The serving-grade cosine number on trained weights is
measured on-chip by bench.py --parity / tools; these tests pin the
machinery on CPU with a random-init tower.
"""

import numpy as np
import pytest

from l3embedding_tpu.embed.quantized import (
    QuantizedAudioEmbedder,
    fold_audio_tower,
    folded_forward,
)
from l3embedding_tpu.models import audio_embedding_fn, build_model

MODEL = "cnn_L3_melspec1"  # half the mel bins of melspec2, same structure


def _variables(model_type=MODEL, seed=0):
    import jax

    spec = build_model(model_type)
    model = spec.module()
    return model.init(
        jax.random.PRNGKey(seed),
        np.zeros((1,) + tuple(spec.video_input_shape), np.float32),
        np.zeros((1,) + tuple(spec.audio_input_shape), np.float32),
        train=False,
    )


def _audio(n, seed=0):
    """Synthetic but audio-like: summed random tones + noise in [-1, 1]."""
    rng = np.random.RandomState(seed)
    t = np.arange(48000) / 48000.0
    out = np.zeros((n, 48000), np.float32)
    for i in range(n):
        for _ in range(4):
            out[i] += rng.rand() * np.sin(
                2 * np.pi * rng.uniform(50, 8000) * t + rng.rand() * 6.28
            )
        out[i] += 0.1 * rng.randn(48000)
        out[i] /= np.abs(out[i]).max() + 1e-9
    return out


@pytest.fixture(scope="module")
def variables():
    return _variables()


def test_fold_matches_full_tower(variables):
    """BN-folded forward == the flax tower's extraction path (algebraic
    identity, up to f32 rounding)."""
    import jax

    fold = fold_audio_tower(variables, MODEL)
    pool = build_model(MODEL).audio_embedding_pooling["short"]
    x = _audio(2, seed=1)

    want = np.asarray(jax.jit(audio_embedding_fn(MODEL, "short"))(variables, x))
    got = np.asarray(folded_forward(fold, x, pool, f32_frontend=True))

    assert got.shape == want.shape == (2, 512)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=0)


def test_quantized_cosine(variables):
    """Calibrate on one batch, embed a held-out batch: int8 embeddings
    must track the folded-f32 tower closely even on a random-init net.
    Exercises the shipping default — for mel front-ends that now
    auto-selects the s8xs8->s32 DFT stage (measured 1.06x full-step on
    v5e; tools/int8_dft_probe.py / docs/DESIGN.md)."""
    q = QuantizedAudioEmbedder(None, MODEL, "short", variables=variables)
    assert q.dft_int8 is True  # mel -> int8 DFT by default
    q.calibrate(_audio(4, seed=2))
    mn, mean = q.embedding_cosine(_audio(3, seed=3))
    # Bound is deliberately below the measured value (so the test pins
    # the machinery, not the RNG); trained-weight gating is measured
    # on-chip (bench.py --parity / docs/DESIGN.md).
    assert mn > 0.98, (mn, mean)
    assert mean > 0.99, (mn, mean)


def test_quantized_cosine_bf16_dft_frontend(variables):
    """dft_int8=False (the --int8-dft-bf16 opt-out) keeps the bf16
    front-end and must stay within the same cosine envelope — the two
    front-ends differ only by ~8-bits-below-signal quantization noise
    (tests/test_dsp.py pins the feature-level error), so the embedding
    gate is dominated by the tower's own int8 noise either way."""
    q = QuantizedAudioEmbedder(None, MODEL, "short", variables=variables,
                               dft_int8=False)
    assert q.dft_int8 is False
    q.calibrate(_audio(4, seed=2))
    mn, mean = q.embedding_cosine(_audio(3, seed=3))
    assert mn > 0.98, (mn, mean)
    assert mean > 0.99, (mn, mean)


def test_int8_dft_frontend_rejects_linear():
    variables = _variables("cnn_L3_orig")
    # Auto default on a linear front-end resolves to the bf16 DFT…
    q = QuantizedAudioEmbedder(None, "cnn_L3_orig", variables=variables)
    assert q.dft_int8 is False
    # …and forcing it on is a clear error, not silent fallback.
    with pytest.raises(ValueError, match="mel front-ends"):
        q = QuantizedAudioEmbedder(None, "cnn_L3_orig",
                                   variables=variables, dft_int8=True)
        q.calibrate(_audio(2, seed=2))
        q.embed_windows(_audio(1, seed=3))


def test_embed_requires_calibration(variables):
    q = QuantizedAudioEmbedder(None, MODEL, "short", variables=variables)
    with pytest.raises(RuntimeError, match="calibrate"):
        q.embed_windows(_audio(1))


def test_tiny_rejected():
    variables = _variables("tiny_L3")
    with pytest.raises(ValueError, match="quantization"):
        QuantizedAudioEmbedder(None, "tiny_L3", variables=variables)


@pytest.fixture(scope="module")
def file_extractor(variables, tmp_path_factory):
    """Calibrated file-level int8 extractor shared by the file + serving
    tests (one compile of the bucket-16 program)."""
    from l3embedding_tpu.data.audio_io import write_wav
    from l3embedding_tpu.embed.quantized import QuantizedEmbeddingExtractor

    import l3embedding_tpu.embed.extract as extract_mod

    d = tmp_path_factory.mktemp("int8wavs")
    paths = []
    for i, clip in enumerate(_audio(2, seed=5)):
        p = str(d / f"c{i}.wav")
        write_wav(p, clip[:24000], 48000)  # 0.5 s -> pads to one window
        paths.append(p)
    ex = QuantizedEmbeddingExtractor(None, MODEL, "short", variables=variables)
    ex.calibrate_files(paths)
    # Shrink the batch buckets for the duration of this module: these
    # tests embed 1-2 windows at a time, and on the single test CPU the
    # full tower at the production min-bucket of 16 is ~8x wasted work.
    old_buckets = extract_mod.BUCKETS
    extract_mod.BUCKETS = (2, 4, 8) + old_buckets
    yield ex, paths
    extract_mod.BUCKETS = old_buckets


def test_file_level_extractor(file_extractor):
    """QuantizedEmbeddingExtractor: calibrate on wav files, embed a file
    — the `05 --int8` path (framing + bucketing + frozen scales)."""
    ex, paths = file_extractor
    emb = ex.embed_file(paths[0])
    assert emb.shape == (1, 512)
    assert np.isfinite(emb).all() and np.abs(emb).max() > 0


def test_http_serving_int8(file_extractor):
    """The micro-batching HTTP service duck-types on embed_windows: the
    int8 extractor serves through it unchanged (the --int8 serve path)."""
    import json
    import urllib.request

    from l3embedding_tpu.embed.http_serve import (
        make_server,
        serve_forever_in_thread,
    )

    ex, _ = file_extractor
    srv = make_server(ex, host="127.0.0.1", port=0, max_latency_ms=20)
    serve_forever_in_thread(srv)
    try:
        host, port = srv.server_address
        with urllib.request.urlopen(f"http://{host}:{port}/healthz") as r:
            body = json.load(r)
        assert body["model_type"] == MODEL
        assert body["dim"] == 512

        clip = _audio(1, seed=7)[0]
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/embed",
            data=json.dumps({"audio": clip.tolist(), "sr": 48000}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.load(r)
        assert out["dim"] == 512
        emb = np.asarray(out["embeddings"], np.float32)
        assert emb.shape[1] == 512 and np.isfinite(emb).all()
    finally:
        srv.shutdown()
        srv.l3_service.close()


def test_calibrate_files_measures_and_gates(file_extractor):
    """VERDICT r4 #2: calibrate_files must measure the int8-vs-folded-f32
    cosine in-path, record it, and refuse below the gate."""
    from l3embedding_tpu.embed.quantized import IntEightAccuracyError

    ex, paths = file_extractor
    assert ex.calib_cosine is not None
    cmin, cmean = ex.calib_cosine
    assert 0.9 < cmin <= cmean <= 1.0
    # An unreachable gate must refuse with an actionable error…
    with pytest.raises(IntEightAccuracyError, match="min cosine"):
        ex.calibrate_files(paths, min_cosine=1.0)
    # …and min_cosine=None disables the gate (the --int8-min-cosine 0
    # override path); scales/cosine are re-recorded.
    got = ex.calibrate_files(paths, min_cosine=None)
    assert got == ex.calib_cosine


def test_int8_artifact_roundtrip(file_extractor, tmp_path):
    """Deployment artifact (05 --int8-save-artifact / --int8-artifact,
    http_serve --int8-artifact): calibrate once, save, load on a
    'serving host' with no f32 checkpoint — identical embeddings (int8
    inference is deterministic), the recorded gate preserved and
    re-checked at load, and the loaded instance refuses
    recalibration/regating (it carries no f32 reference tower)."""
    from l3embedding_tpu.embed.quantized import (
        IntEightAccuracyError,
        QuantizedEmbeddingExtractor,
    )

    ex, paths = file_extractor
    art = str(tmp_path / "tower.int8.npz")
    ex.save_artifact(art)

    loaded = QuantizedEmbeddingExtractor.load_artifact(
        art, min_cosine=ex.calib_cosine[0] - 1e-6
    )
    assert loaded.model_type == MODEL
    assert loaded.pooling_type == "short"
    assert loaded.calib_cosine == pytest.approx(ex.calib_cosine)
    # The front-end the gate was measured with rides in the artifact
    # (mel towers default to the int8 DFT stage since round 5).
    assert ex.q.dft_int8 is True
    assert loaded.q.dft_int8 is True

    w = _audio(3, seed=11)
    np.testing.assert_array_equal(
        loaded.embed_windows(w), ex.embed_windows(w)
    )
    np.testing.assert_array_equal(
        loaded.embed_file(paths[0]), ex.embed_file(paths[0])
    )
    # Device framing works straight off the artifact too.
    framed = QuantizedEmbeddingExtractor.load_artifact(
        art, device_framing=True, min_cosine=None
    )
    audio = _audio(1, seed=12)[0]
    long_audio = np.concatenate([audio, audio])[: int(1.6 * 48000)]
    np.testing.assert_allclose(
        framed.embed_audio(long_audio, hop_size=0.5),
        loaded.embed_audio(long_audio, hop_size=0.5),
        rtol=1e-5, atol=1e-6,
    )

    # The gate recorded at export is enforced at load…
    with pytest.raises(IntEightAccuracyError, match="recorded min cosine"):
        QuantizedEmbeddingExtractor.load_artifact(art, min_cosine=1.0)
    # …and artifact-loaded towers cannot be silently re-gated or
    # recalibrated: the f32 reference stays with the checkpoint.
    with pytest.raises(RuntimeError, match="reference tower"):
        loaded.q.embedding_cosine(w)
    with pytest.raises(RuntimeError, match="reference tower"):
        loaded.calibrate_files(paths)
    # Not an artifact → clear error.
    bogus = str(tmp_path / "bogus.npz")
    np.savez(bogus, x=np.zeros(3))
    with pytest.raises((ValueError, KeyError)):
        QuantizedEmbeddingExtractor.load_artifact(bogus)


def test_percentile_calibration(variables):
    """Percentile clipping is the documented fallback when amax misses
    the gate: scales must be <= the amax scales and accuracy must stay
    in the same band on a random-init net."""
    q = QuantizedAudioEmbedder(None, MODEL, "short", variables=variables)
    cal = _audio(4, seed=2)
    q.calibrate(cal)
    amax_scales = np.asarray(q._act_scales)
    q.calibrate(cal, method="percentile", percentile=99.9)
    pct_scales = np.asarray(q._act_scales)
    assert (pct_scales <= amax_scales + 1e-12).all()
    assert (pct_scales > 0).all()
    mn, mean = q.embedding_cosine(_audio(2, seed=9))
    assert mn > 0.97, (mn, mean)


def test_calibrate_rejects_unknown_method(variables):
    q = QuantizedAudioEmbedder(None, MODEL, "short", variables=variables)
    with pytest.raises(ValueError, match="method"):
        q.calibrate(_audio(1), method="entropy")


def test_weight_quant_is_per_channel(variables):
    q = QuantizedAudioEmbedder(None, MODEL, "short", variables=variables)
    # One scale per output channel, int8 weights actually use the range.
    for wq, ws, (w, _) in zip(q._wq, q._wscale, q.fold.convs + [q.fold.emb_conv]):
        assert ws.shape == (w.shape[-1],)
        assert np.asarray(wq).dtype == np.int8
        assert np.abs(np.asarray(wq)).max() == 127


def test_int8_device_framing_matches_host_framing(variables):
    """05 --int8 --device-framing: the quantized extractor slices a
    file's windows on device (QuantizedEmbeddingExtractor._framed_fn)
    and must match the host frame_uniform path at every alignment case:
    hop-aligned, dropped non-aligned tail (the reference's
    ceil-on-the-difference quirk), and the short-audio fallback (which
    takes the host path for its centered padding)."""
    from l3embedding_tpu.embed.quantized import QuantizedEmbeddingExtractor

    ex = QuantizedEmbeddingExtractor(None, MODEL, "short",
                                     variables=variables,
                                     device_framing=True)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="calibrate"):
        ex.embed_audio(np.zeros(96000, np.float32))

    ex.q.calibrate(_audio(4, seed=5))
    rng = np.random.RandomState(6)
    sr = ex.sr
    for length, hop in ((int(2.5 * sr), 0.5), (int(2.5 * sr) + 777, 0.5),
                        (sr // 3, 0.5)):
        audio = (rng.randn(length) * 0.1).astype(np.float32)
        got = ex.embed_audio(audio, hop_size=hop)
        want = ex.embed_audio(audio, hop_size=hop, device_framing=False)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mesh_sharded_int8_matches_single_device(variables):
    """Int8 extraction over a data mesh (http_serve --int8 --mesh):
    quantized weights replicate, window batches shard over 'data', and
    the rows match the single-device quantized path — including a batch
    that does not divide the mesh (padded, then truncated)."""
    import jax

    from l3embedding_tpu.parallel import create_mesh

    windows = _audio(10, seed=3)
    calib = _audio(6, seed=4)

    single = QuantizedAudioEmbedder(None, MODEL, "short",
                                    variables=variables)
    single.calibrate(calib)

    mesh = create_mesh(jax.devices()[:8])
    sharded = QuantizedAudioEmbedder(None, MODEL, "short",
                                     variables=variables, mesh=mesh)
    sharded.calibrate(calib)
    np.testing.assert_allclose(
        np.asarray(sharded._act_scales), np.asarray(single._act_scales),
        rtol=0, atol=0,
    )

    want = single.embed_windows(windows)
    got = sharded.embed_windows(windows)  # 10 rows over 8 devices: pads
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    from l3embedding_tpu.embed.quantized import QuantizedEmbeddingExtractor

    ex = QuantizedEmbeddingExtractor(None, MODEL, "short",
                                     variables=variables, mesh=mesh)
    ex.q._act_scales = sharded._act_scales
    got_file = ex.embed_windows(windows[:5])
    np.testing.assert_allclose(got_file, want[:5], rtol=1e-5, atol=1e-6)
