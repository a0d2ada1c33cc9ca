"""Numpy golden-reference DSP: STFT / mel / decibel front-ends.

These are the semantic ground truth for the TPU (jnp / Pallas)
implementations in `frontend.py` — every accelerated path is golden-tested
against this module.

The formulas reproduce the behavior of the reference stack's front-end
layers (kapre 0.1.4 `Spectrogram` / `Melspectrogram`, as configured in
reference l3embedding/audio_model.py:39-43, 257-259, 367-369):

  * STFT as a bank of windowed DFT basis functions applied to strided
    frames (kapre implements this as a conv; we express it as framing +
    matmul, which is mathematically identical and MXU-friendly).
  * Window: periodic ("fftbins") Hann of length n_win (default n_dft),
    zero-padded symmetrically to n_dft when n_win < n_dft.
  * Conv-style 'valid' / 'same' padding semantics for the time axis
    (TF SAME: total pad = (frames-1)*hop + n_dft - n; left = total//2).
  * power=1.0 → amplitude spectrogram |X|; power=2.0 → power |X|^2.
  * Mel filterbank: librosa-compatible triangular filters with HTK mel
    scale and Slaney area normalization (what kapre's vendored
    `backend.mel` computes when htk=True).
  * Melspectrogram: mel applied to the *power* spectrogram, then
    ** (power_melgram / 2) — so power_melgram=1.0 yields an amplitude
    melgram (reference audio_model.py:257-259 passes power_melgram=1.0).
  * amplitude_to_decibel: 10*log10(max(x, amin)), shifted so the max is
    0 dB and floored at -dynamic_range dB. NOTE: kapre<=0.1.x computes
    the 0 dB reference as the max over the ENTIRE batch tensor, which
    makes each example's features depend on its batchmates. We default
    to a per-sample reference (deterministic, batch-size invariant) and
    expose `per_sample=False` to reproduce the batch-global quirk.
  * The L3-paper normalization log(max(x,1e-12))/5.0 used by the
    cnn_L3_orig front-end (reference audio_model.py:43).

Shapes follow the reference conventions: single waveforms are 1-D
(n_samples,), spectrogram outputs are (n_freq, n_frames).
"""

from __future__ import annotations

import numpy as np

# Constants shared with the reference recipes
# (reference l3embedding/audio_model.py:28-32, 245-250, 355-360).
L3_SAMPLE_RATE = 48000
L3_N_DFT_LINEAR = 512
L3_N_DFT_MEL = 2048
L3_HOP = 242


def periodic_hann(n: int) -> np.ndarray:
    """Periodic ("fftbins") Hann window of length n, float64."""
    if n <= 0:
        return np.zeros(0)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft_basis(n_dft: int, n_win: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Windowed DFT basis matrices.

    Returns (real, imag), each of shape (n_dft, n_freq) with
    n_freq = n_dft//2 + 1, such that for a frame x of length n_dft:
        re = x @ real, im = x @ imag, |X_k| = sqrt(re_k^2 + im_k^2).

    The Hann window of length n_win (default n_dft) is baked into the
    basis, centred (zero-padded symmetrically) when n_win < n_dft — the
    same construction kapre's `get_stft_kernels` uses for its conv
    kernels, expressed as a matmul operand instead.
    """
    if n_win is None:
        n_win = n_dft
    n_freq = n_dft // 2 + 1
    t = np.arange(n_dft)[:, None]          # (n_dft, 1)
    k = np.arange(n_freq)[None, :]         # (1, n_freq)
    angle = 2.0 * np.pi * t * k / n_dft
    window = np.zeros(n_dft)
    lpad = (n_dft - n_win) // 2
    window[lpad:lpad + n_win] = periodic_hann(n_win)
    real = np.cos(angle) * window[:, None]
    imag = -np.sin(angle) * window[:, None]
    return real, imag


def num_frames(n: int, n_dft: int, hop: int, padding: str) -> int:
    """Conv-style output length for the framing op."""
    if padding == "valid":
        return (n - n_dft) // hop + 1
    if padding == "same":
        return -(-n // hop)  # ceil
    raise ValueError(f"padding must be 'valid' or 'same', got {padding!r}")


def same_pad_amounts(n: int, n_dft: int, hop: int) -> tuple[int, int]:
    """TF-SAME left/right zero-pad amounts for the framing op."""
    frames = num_frames(n, n_dft, hop, "same")
    total = max((frames - 1) * hop + n_dft - n, 0)
    left = total // 2
    return left, total - left


def frame_signal(x: np.ndarray, n_dft: int, hop: int, padding: str) -> np.ndarray:
    """Frame a 1-D signal into overlapping windows: (n_frames, n_dft)."""
    x = np.asarray(x)
    if padding == "same":
        left, right = same_pad_amounts(len(x), n_dft, hop)
        x = np.pad(x, (left, right))
    frames = num_frames(len(x), n_dft, hop, "valid")
    idx = np.arange(frames)[:, None] * hop + np.arange(n_dft)[None, :]
    return x[idx]


def spectrogram(
    x: np.ndarray,
    n_dft: int = L3_N_DFT_LINEAR,
    hop: int = L3_HOP,
    padding: str = "valid",
    power: float = 1.0,
    n_win: int | None = None,
) -> np.ndarray:
    """|STFT|^power of a 1-D waveform → (n_freq, n_frames).

    power=1.0 matches the reference's cnn_L3_orig front-end
    (audio_model.py:39, power_spectrogram=1.0).
    """
    frames = frame_signal(np.asarray(x, dtype=np.float64), n_dft, hop, padding)
    real, imag = stft_basis(n_dft, n_win)
    re = frames @ real
    im = frames @ imag
    p = re * re + im * im                   # (n_frames, n_freq), power
    return (p ** (power / 2.0)).T           # (n_freq, n_frames)


def hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney scale
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if np.ndim(f) == 0:
        if f >= min_log_hz:
            mels = min_log_mel + np.log(f / min_log_hz) / logstep
    else:
        log_t = f >= min_log_hz
        mels[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
    return mels


def mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    freqs[log_t] = min_log_hz * np.exp(logstep * (m[log_t] - min_log_mel))
    return freqs


def mel_filterbank(
    sr: int,
    n_dft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = True,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, n_dft//2 + 1).

    librosa-compatible construction; htk=True + Slaney normalization is
    what the reference melspec models use (audio_model.py:257-258 via
    kapre's vendored `backend.mel`).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freq = n_dft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
        weights *= enorm[:, None]
    return weights


def amplitude_to_db(
    x: np.ndarray,
    amin: float = 1e-10,
    dynamic_range: float = 80.0,
    per_sample: bool = True,
    sample_axes: tuple[int, ...] | None = None,
) -> np.ndarray:
    """kapre-style decibel scaling: 10*log10, max-referenced, range-floored.

    per_sample=True (default) references each sample's own max (the last
    `sample_axes` axes, or all axes for a single sample); per_sample=False
    reproduces kapre<=0.1.x's batch-global max quirk.
    """
    log_spec = 10.0 * np.log10(np.maximum(x, amin))
    if per_sample and sample_axes is not None:
        ref = np.max(log_spec, axis=sample_axes, keepdims=True)
    else:
        ref = np.max(log_spec)
    log_spec = log_spec - ref
    return np.maximum(log_spec, -dynamic_range)


def l3_log_norm(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """L3-paper normalization: log(max(x, eps)) / 5.0
    (reference audio_model.py:43)."""
    return np.log(np.maximum(x, eps)) / 5.0


def melspectrogram(
    x: np.ndarray,
    sr: int = L3_SAMPLE_RATE,
    n_dft: int = L3_N_DFT_MEL,
    hop: int = L3_HOP,
    n_mels: int = 128,
    padding: str = "same",
    power_melgram: float = 1.0,
    htk: bool = True,
    decibel: bool = True,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Mel spectrogram of a 1-D waveform → (n_mels, n_frames).

    Matches the reference melspec front-end semantics: power STFT → mel →
    ** (power_melgram/2) → optional dB (audio_model.py:257-259).
    """
    p = spectrogram(x, n_dft=n_dft, hop=hop, padding=padding, power=2.0)
    mel = mel_filterbank(sr, n_dft, n_mels, fmin, fmax, htk)
    m = mel @ p
    m = m ** (power_melgram / 2.0)
    if decibel:
        m = amplitude_to_db(m)
    return m
