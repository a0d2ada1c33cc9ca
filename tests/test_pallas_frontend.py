"""Golden tests for the fused Pallas mel front-end (interpret mode on the
CPU test mesh; the same kernel compiles for TPU)."""

import numpy as np
import pytest

from l3embedding_tpu.ops import dsp_ref, frontend
from l3embedding_tpu.ops.pallas_frontend import melspectrogram_fused


@pytest.mark.parametrize("n_mels", [128, 256])
def test_fused_mel_matches_reference(n_mels):
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 48000) * 0.3).astype(np.float32)
    cfg = frontend.MelConfig(n_mels=n_mels)
    got = np.asarray(melspectrogram_fused(x, cfg, interpret=True))
    assert got.shape == (2, n_mels, 199, 1)
    want = np.stack([dsp_ref.melspectrogram(xi, n_mels=n_mels) for xi in x])[
        ..., None
    ]
    # bf16 basis storage: gate on feature cosine + mean dB error, the
    # quantities that matter downstream (see pallas_frontend docstring).
    for g, w in zip(got, want):
        u, v = g.ravel(), w.ravel()
        cos = (u @ v) / (np.linalg.norm(u) * np.linalg.norm(v))
        assert cos > 0.9999
    assert np.abs(got - want).mean() < 0.1


def test_fused_matches_xla_formulation():
    rng = np.random.RandomState(1)
    x = (rng.randn(1, 48000) * 0.5).astype(np.float32)
    cfg = frontend.MelConfig(n_mels=256)
    fused = np.asarray(melspectrogram_fused(x, cfg, interpret=True))
    xla = np.asarray(frontend.melspectrogram(x, cfg))
    u, v = fused.ravel(), xla.ravel()
    cos = (u @ v) / (np.linalg.norm(u) * np.linalg.norm(v))
    assert cos > 0.9999
    assert np.abs(fused - xla).mean() < 0.1


def test_fused_no_decibel():
    rng = np.random.RandomState(2)
    x = (rng.randn(1, 48000) * 0.5).astype(np.float32)
    cfg = frontend.MelConfig(n_mels=128, decibel=False)
    fused = np.asarray(melspectrogram_fused(x, cfg, interpret=True))
    want = dsp_ref.melspectrogram(x[0], n_mels=128, decibel=False)[None, ..., None]
    # Amplitude domain: relative tolerance at bf16 multiply precision.
    np.testing.assert_allclose(fused, want, rtol=2e-2, atol=2e-2)


class TestFusedLinearSpectrogram:
    def test_matches_reference_orig_config(self):
        from l3embedding_tpu.ops.pallas_frontend import spectrogram_fused

        rng = np.random.RandomState(5)
        x = (rng.randn(2, 48000) * 0.3).astype(np.float32)
        cfg = frontend.SpectrogramConfig()  # cnn_L3_orig: 512/242 valid amp
        got = np.asarray(spectrogram_fused(x, cfg, interpret=True))
        assert got.shape == (2, 257, 197, 1)
        want = np.stack(
            [dsp_ref.spectrogram(xi, 512, 242, "valid", power=1.0) for xi in x]
        )[..., None]
        # bf16 basis → relative tolerance in the amplitude domain.
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_decibel_variant(self):
        from l3embedding_tpu.ops.pallas_frontend import spectrogram_fused

        rng = np.random.RandomState(6)
        x = (rng.randn(1, 48000) * 0.5).astype(np.float32)
        cfg = frontend.SpectrogramConfig(decibel=True)  # kapredbinputbn
        got = np.asarray(spectrogram_fused(x, cfg, interpret=True))[0, ..., 0]
        want = dsp_ref.amplitude_to_db(
            dsp_ref.spectrogram(x[0], 512, 242, "valid", power=1.0),
            sample_axes=(0, 1),
        )
        u, v = got.ravel(), want.ravel()
        cos = (u @ v) / (np.linalg.norm(u) * np.linalg.norm(v))
        assert cos > 0.9999
        assert np.abs(got - want).mean() < 0.2

    def test_tiny_config(self):
        from l3embedding_tpu.ops.pallas_frontend import spectrogram_fused

        rng = np.random.RandomState(7)
        x = (rng.randn(1, 48000) * 0.5).astype(np.float32)
        cfg = frontend.SpectrogramConfig(
            n_dft=512, hop=240, n_win=480, decibel=True
        )
        got = np.asarray(spectrogram_fused(x, cfg, interpret=True))
        assert got.shape == (1, 257, cfg.n_frames(48000), 1)
        assert np.isfinite(got).all()
