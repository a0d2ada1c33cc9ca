"""Golden tests for the DSP front-end.

The numpy reference (dsp_ref) is validated against independent
first-principles computations (np.fft / scipy); the jnp front-end is then
validated against the numpy reference. This is the TPU-native analog of
the reference repo's vggish_smoke_test golden-value strategy
(reference data/usc/vggish/vggish_smoke_test.py:49-95).
"""

import numpy as np
import pytest
import scipy.signal

from l3embedding_tpu.ops import dsp_ref


RNG = np.random.RandomState(1234)


def test_periodic_hann_matches_scipy():
    for n in (16, 512, 2048):
        ours = dsp_ref.periodic_hann(n)
        theirs = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_stft_matches_npfft():
    # Windowed-DFT-as-matmul must equal rfft of the windowed frame.
    n_dft = 512
    x = RNG.randn(4096).astype(np.float64)
    frames = dsp_ref.frame_signal(x, n_dft, 242, "valid")
    real, imag = dsp_ref.stft_basis(n_dft)
    ours = np.sqrt((frames @ real) ** 2 + (frames @ imag) ** 2)
    win = dsp_ref.periodic_hann(n_dft)
    theirs = np.abs(np.fft.rfft(frames * win, axis=-1))
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


def test_frame_counts_l3():
    # Resolves the 197-vs-199 ambiguity flagged in SURVEY.md §5.7:
    # 'valid' framing of 48000 samples with n_dft=512, hop=242 gives 197
    # frames; 'same' framing (mel models, n_dft=2048) gives ceil(48000/242)
    # = 199 frames.
    assert dsp_ref.num_frames(48000, 512, 242, "valid") == 197
    assert dsp_ref.num_frames(48000, 2048, 242, "same") == 199
    assert dsp_ref.frame_signal(np.zeros(48000), 512, 242, "valid").shape == (197, 512)
    assert dsp_ref.frame_signal(np.zeros(48000), 2048, 242, "same").shape == (199, 2048)


def test_spectrogram_shape_and_parseval():
    x = RNG.randn(48000)
    s = dsp_ref.spectrogram(x, 512, 242, "valid", power=1.0)
    assert s.shape == (257, 197)
    assert np.all(s >= 0)
    # A pure tone concentrates energy at its bin.
    sr = 48000
    tone = np.sin(2 * np.pi * 3000.0 * np.arange(sr) / sr)
    s = dsp_ref.spectrogram(tone, 512, 242, "valid", power=1.0)
    peak_bin = np.argmax(s.mean(axis=1))
    assert abs(peak_bin - round(3000.0 * 512 / sr)) <= 1


def test_mel_filterbank_properties():
    fb = dsp_ref.mel_filterbank(48000, 2048, 128, htk=True)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # Each filter is nonempty and unimodal-triangular (single argmax run).
    assert np.all(fb.max(axis=1) > 0)
    # Slaney normalization: filter areas ≈ 2/bandwidth * triangle area, so
    # wider filters are not taller.
    mel_pts = dsp_ref.mel_to_hz(
        np.linspace(
            dsp_ref.hz_to_mel(0.0, True), dsp_ref.hz_to_mel(24000.0, True), 130
        ),
        True,
    )
    # Sanity: filter centers increase monotonically.
    centers = fb.argmax(axis=1)
    assert np.all(np.diff(centers) >= 0)
    assert mel_pts[0] == pytest.approx(0.0, abs=1e-6)


def test_hz_mel_roundtrip():
    f = np.array([0.0, 440.0, 1000.0, 8000.0, 24000.0])
    for htk in (True, False):
        np.testing.assert_allclose(
            dsp_ref.mel_to_hz(dsp_ref.hz_to_mel(f, htk), htk), f, rtol=1e-10
        )


def test_amplitude_to_db():
    x = np.array([[1.0, 0.1, 1e-12], [10.0, 1.0, 0.0]])
    db = dsp_ref.amplitude_to_db(x, per_sample=False)
    assert db.max() == pytest.approx(0.0)
    assert db.min() == pytest.approx(-80.0)
    # per-sample referencing: each row maxes at 0.
    db_ps = dsp_ref.amplitude_to_db(x, sample_axes=(1,))
    np.testing.assert_allclose(db_ps.max(axis=1), [0.0, 0.0], atol=1e-12)


def test_melspectrogram_shapes():
    x = RNG.randn(48000)
    m1 = dsp_ref.melspectrogram(x, n_mels=128)
    m2 = dsp_ref.melspectrogram(x, n_mels=256)
    assert m1.shape == (128, 199)
    assert m2.shape == (256, 199)
    assert m1.max() == pytest.approx(0.0)  # dB-referenced to own max
    assert m1.min() >= -80.0


class TestJnpFrontend:
    """jnp/XLA front-end vs the numpy golden reference."""

    @pytest.fixture(scope="class")
    def frontend(self):
        from l3embedding_tpu.ops import frontend

        return frontend

    def test_frame_signal(self, frontend):
        x = RNG.randn(2, 4800).astype(np.float32)
        got = np.asarray(frontend.frame_signal(x, 512, 242, "valid"))
        want = np.stack([dsp_ref.frame_signal(xi, 512, 242, "valid") for xi in x])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_linear_spectrogram_parity(self, frontend):
        x = RNG.randn(2, 48000).astype(np.float32) * 0.5
        cfg = frontend.SpectrogramConfig()
        got = np.asarray(frontend.spectrogram(x, cfg))
        assert got.shape == (2, 257, 197, 1)
        want = np.stack(
            [dsp_ref.spectrogram(xi, 512, 242, "valid", power=1.0) for xi in x]
        )[..., None]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_mel_spectrogram_parity(self, frontend):
        x = RNG.randn(2, 48000).astype(np.float32) * 0.5
        for n_mels in (128, 256):
            cfg = frontend.MelConfig(n_mels=n_mels)
            got = np.asarray(frontend.melspectrogram(x, cfg))
            assert got.shape == (2, n_mels, 199, 1)
            want = np.stack(
                [dsp_ref.melspectrogram(xi, n_mels=n_mels) for xi in x]
            )[..., None]
            # dB scale: compare with absolute tolerance.
            np.testing.assert_allclose(got, want, atol=2e-3)

    def test_mel_spectrogram_fft_variant_parity(self, frontend):
        # The FFT-staged variant (kept as a measured-rejection artifact:
        # 3.6x slower than the matmul formulation on v5e at batch 512,
        # tools/fft_frontend_probe.py / docs/DESIGN.md) must stay
        # numerically interchangeable with the shipping front-ends.
        x = RNG.randn(2, 48000).astype(np.float32) * 0.5
        cfg = frontend.MelConfig(n_mels=256)
        got = np.asarray(frontend.melspectrogram_fft(x, cfg))
        assert got.shape == (2, 256, 199, 1)
        want = np.stack(
            [dsp_ref.melspectrogram(xi, n_mels=256) for xi in x]
        )[..., None]
        # bf16 mel-stage matmul dominates the error budget (same stage
        # and dtype as melspectrogram_bf16); dB scale -> absolute tol.
        diff = np.abs(got - want)
        assert np.median(diff) < 0.05
        bf16 = np.asarray(frontend.melspectrogram_bf16(x, cfg))
        a, b = got.ravel().astype(np.float64), bf16.ravel().astype(np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99999

    def test_mel_spectrogram_int8dft_variant_parity(self, frontend):
        # The s8xs8->s32 DFT-stage variant (tools/int8_dft_probe.py;
        # serving-side option for the int8 extraction tower,
        # docs/DESIGN.md round-5) must stay numerically close to the
        # shipping front-ends: per-frame row scales + per-column basis
        # scales keep the quantization noise ~8 bits below signal, so
        # the dB features agree to ~0.02 dB at the median (the tail
        # sits in near-clamp quiet bins).
        x = RNG.randn(2, 48000).astype(np.float32) * 0.5
        cfg = frontend.MelConfig(n_mels=256)
        got = np.asarray(frontend.melspectrogram_int8dft(x, cfg))
        assert got.shape == (2, 256, 199, 1)
        want = np.stack(
            [dsp_ref.melspectrogram(xi, n_mels=256) for xi in x]
        )[..., None]
        diff = np.abs(got - want)
        assert np.median(diff) < 0.05
        bf16 = np.asarray(frontend.melspectrogram_bf16(x, cfg))
        a, b = got.ravel().astype(np.float64), bf16.ravel().astype(np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.9999

    def test_l3_log_norm(self, frontend):
        x = np.abs(RNG.randn(3, 5)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(frontend.l3_log_norm(x)),
            dsp_ref.l3_log_norm(x),
            rtol=1e-3,
            atol=1e-5,
        )

    def test_decibel_spectrogram(self, frontend):
        x = RNG.randn(1, 48000).astype(np.float32)
        cfg = frontend.SpectrogramConfig(decibel=True)
        got = np.asarray(frontend.spectrogram(x, cfg))[0, ..., 0]
        want = dsp_ref.amplitude_to_db(
            dsp_ref.spectrogram(x[0], 512, 242, "valid", power=1.0),
            sample_axes=(0, 1),
        )
        np.testing.assert_allclose(got, want, atol=2e-3)
