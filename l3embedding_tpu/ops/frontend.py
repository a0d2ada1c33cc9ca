"""TPU-native spectrogram / mel front-ends (JAX/XLA).

The reference computes spectrograms inside the model graph with kapre's
TF conv-op layers (reference l3embedding/audio_model.py:39-43, 257-259).
Here the same math is expressed the TPU way:

    waveform --frame(gather)--> (B, T, n_dft) --matmul--> DFT re/im
             --square+add--> power --matmul--> mel --log--> features

Both matmuls land on the MXU; the elementwise stages fuse into them under
jit. Basis matrices (windowed DFT bank, mel filterbank) are numpy
constants folded into the compiled program. The bf16 chunk-framed
variants below are the training-time fast path (measured fastest on
v5e — 3.1 ms/128-batch vs 5.0 for the fused Pallas kernel in
`pallas_frontend.py`, which remains selectable via
L3_TRAIN_FRONTEND=fused); the f32 HIGHEST functions are the
extraction/parity configuration.

All functions are shape-static and jit-compatible. Waveform inputs are
(B, n_samples) float32 in [-1, 1]; outputs are NHWC feature maps
(B, n_freq_or_mels, n_frames, 1) matching the reference's layout.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp_ref


@dataclass(frozen=True)
class SpectrogramConfig:
    """Linear-spectrogram front-end configuration.

    Defaults replicate cnn_L3_orig's front-end
    (reference audio_model.py:28-40).
    """

    n_dft: int = dsp_ref.L3_N_DFT_LINEAR
    hop: int = dsp_ref.L3_HOP
    padding: str = "valid"
    power: float = 1.0
    n_win: int | None = None
    decibel: bool = False
    # per-sample max reference (the default); False = kapre<=0.1.x
    # batch-global quirk (reference audio_model.py:138-151).
    db_per_sample: bool = True

    @property
    def n_freq(self) -> int:
        return self.n_dft // 2 + 1

    def n_frames(self, n_samples: int) -> int:
        return dsp_ref.num_frames(n_samples, self.n_dft, self.hop, self.padding)


@dataclass(frozen=True)
class MelConfig:
    """Mel-spectrogram front-end configuration.

    Defaults replicate cnn_L3_melspec1 (n_mels=128); melspec2 uses
    n_mels=256 (reference audio_model.py:245-259, 355-369).
    """

    sr: int = dsp_ref.L3_SAMPLE_RATE
    n_dft: int = dsp_ref.L3_N_DFT_MEL
    hop: int = dsp_ref.L3_HOP
    n_mels: int = 128
    padding: str = "same"
    power_melgram: float = 1.0
    htk: bool = True
    decibel: bool = True
    fmin: float = 0.0
    fmax: float | None = None
    # See SpectrogramConfig.db_per_sample.
    db_per_sample: bool = True

    def n_frames(self, n_samples: int) -> int:
        return dsp_ref.num_frames(n_samples, self.n_dft, self.hop, self.padding)


@functools.lru_cache(maxsize=None)
def _stft_basis_f32(n_dft: int, n_win: int | None) -> tuple[np.ndarray, np.ndarray]:
    real, imag = dsp_ref.stft_basis(n_dft, n_win)
    return real.astype(np.float32), imag.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _mel_matrix_f32(sr, n_dft, n_mels, fmin, fmax, htk) -> np.ndarray:
    # Transposed to (n_freq, n_mels) so the mel stage is a plain
    # frames-major matmul: (B*T, n_freq) @ (n_freq, n_mels).
    return dsp_ref.mel_filterbank(sr, n_dft, n_mels, fmin, fmax, htk).T.astype(
        np.float32
    )


def frame_signal(x: jnp.ndarray, n_dft: int, hop: int, padding: str) -> jnp.ndarray:
    """(B, n) waveforms → (B, n_frames, n_dft) overlapping frames.

    A static gather: XLA lowers this to an efficient strided load, and the
    result feeds straight into the DFT matmul.
    """
    n = x.shape[-1]
    if padding == "same":
        left, right = dsp_ref.same_pad_amounts(n, n_dft, hop)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left, right)])
        n = n + left + right
    frames = dsp_ref.num_frames(n, n_dft, hop, "valid")
    idx = np.arange(frames)[:, None] * hop + np.arange(n_dft)[None, :]
    return jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=-1).reshape(
        x.shape[:-1] + (frames, n_dft)
    )


def frame_signal_chunked(
    x: jnp.ndarray, n_dft: int, hop: int, padding: str
) -> jnp.ndarray:
    """(B, n) waveforms → (B, n_frames, k*hop) *extended* frames.

    TPU-fast alternative to frame_signal's elementwise gather (which
    materializes ~8.5x-duplicated data through a slow scalar gather):
    reshape the waveform into hop-sized chunks and concatenate k = ceil(
    n_dft/hop) shifted chunk views — pure slices and concats, no gather.
    Row t holds x[t*hop : (t+k)*hop]; only the first n_dft columns are
    the frame, so DFT bases must be zero-padded to k*hop rows
    (stft_basis_padded) — the trailing columns then contribute nothing.
    """
    n = x.shape[-1]
    if padding == "same":
        left, right = dsp_ref.same_pad_amounts(n, n_dft, hop)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left, right)])
        n = n + left + right
    frames = dsp_ref.num_frames(n, n_dft, hop, "valid")
    k = -(-n_dft // hop)
    total = (frames - 1 + k) * hop
    if total > n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, total - n)])
    elif total < n:
        x = x[..., :total]
    chunks = x.reshape(x.shape[:-1] + (frames - 1 + k, hop))
    parts = [chunks[..., t : t + frames, :] for t in range(k)]
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=None)
def _stft_basis_padded(n_dft: int, n_win: int | None, width: int, bf16: bool):
    """DFT bases zero-padded from n_dft to `width` rows (for chunked
    frames), optionally stored bf16 for MXU streaming."""
    real, imag = dsp_ref.stft_basis(n_dft, n_win)
    n_freq = real.shape[1]
    w_re = np.zeros((width, n_freq), np.float32)
    w_im = np.zeros((width, n_freq), np.float32)
    w_re[:n_dft] = real
    w_im[:n_dft] = imag
    if bf16:
        import ml_dtypes

        return w_re.astype(ml_dtypes.bfloat16), w_im.astype(ml_dtypes.bfloat16)
    return w_re, w_im


def _mel_tail_bf16(p: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Shared post-DFT tail of the fast mel front-ends: (B, T, n_freq)
    power frames → (B, n_mels, T, 1) features. Mel matmul in bf16 with
    f32 accumulation, then power/transpose/dB — keeping this in one
    place is what makes the DFT-stage variants (matmul vs FFT)
    numerically interchangeable."""
    mel_t = jnp.asarray(
        _mel_matrix_f32(cfg.sr, cfg.n_dft, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.htk)
    )
    m = jnp.matmul(
        p.astype(jnp.bfloat16),
        mel_t.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if cfg.power_melgram != 2.0:
        m = jnp.sqrt(jnp.maximum(m, 0.0)) ** cfg.power_melgram
    m = jnp.transpose(m, (0, 2, 1))[..., None]
    if cfg.decibel:
        m = amplitude_to_db(m, per_sample=cfg.db_per_sample)
    return m


def melspectrogram_bf16(x: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """(B, n) → (B, n_mels, n_frames, 1) mel features, bf16 MXU path.

    The training-time front-end: chunked framing (no gather), bf16
    operands with f32 accumulation on both matmuls — numerics match the
    fused Pallas kernel (pallas_frontend.melspectrogram_fused), layout
    and API match melspectrogram.
    """
    ext = frame_signal_chunked(x, cfg.n_dft, cfg.hop, cfg.padding)
    ext = ext.astype(jnp.bfloat16)
    w_re, w_im = _stft_basis_padded(cfg.n_dft, None, ext.shape[-1], bf16=True)
    re = jnp.matmul(ext, jnp.asarray(w_re), preferred_element_type=jnp.float32)
    im = jnp.matmul(ext, jnp.asarray(w_im), preferred_element_type=jnp.float32)
    return _mel_tail_bf16(re * re + im * im, cfg)


@functools.lru_cache(maxsize=None)
def _stft_basis_int8(n_dft: int, n_win: int | None, width: int):
    """Fused per-column symmetric int8 DFT bank + f32 column scales.

    One (width, 2·n_freq) int8 matrix — re columns then im columns —
    so a single s8×s8→s32 matmul produces both quadratures (the MXU
    int8 rate improves sharply with N at these shapes, measured in
    tools/int8_dft_matmul_probe.py). Column f is quantized with its own
    scale c[f] = amax(|col|)/127, so the int8 matmul's column f
    dequantizes exactly like the f32 basis scaled by c[f]. Rows beyond
    n_dft — the chunk-framing tail plus MXU K-alignment padding — are
    zero in both. `width` must therefore be >= the (padded) frame
    width; extra rows contribute nothing."""
    real, imag = dsp_ref.stft_basis(n_dft, n_win)
    bank = np.zeros((width, real.shape[1] + imag.shape[1]), np.float32)
    bank[:n_dft] = np.concatenate([real, imag], axis=1)
    c = (np.maximum(np.abs(bank).max(axis=0), 1e-12) / 127.0).astype(
        np.float32
    )
    return np.clip(np.round(bank / c), -127, 127).astype(np.int8), c


def _round_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def melspectrogram_int8dft(
    x: jnp.ndarray, cfg: MelConfig = MelConfig()
) -> jnp.ndarray:
    """(B, n) → (B, n_mels, n_frames, 1) mel features, int8 DFT stage.

    Identical pipeline to melspectrogram_bf16 except the windowed DFT
    runs s8×s8→s32 on the MXU's double-rate int8 path, formulated to
    make the quantization overhead vanish and the GEMM MXU-shaped
    (each choice measured, tools/int8_dft_matmul_probe.py +
    docs/DESIGN.md):

      * The WAVEFORM is quantized, not the frames: one per-window
        symmetric scale s[b] = amax(|x[b]|)/127 over (B, n) — ~9×
        fewer elements than the chunk-duplicated frame tensor, and
        rounding before framing keeps every overlapping frame's view
        of a sample bit-identical (exactly "8-bit PCM in, same
        pipeline"). Frames are then pure int8 slices/concats.
      * K is zero-padded to a multiple of 256 (2178 → 2304 for
        melspec2): the unaligned-K int8 GEMM runs at 286 TOP/s, the
        padded one at ~680 — alignment more than pays for the 6%
        extra FLOPs.
      * re and im banks fuse into ONE (K, 2·n_freq) int8 matmul
        (the int8 rate improves sharply with N at this M/K).

    The exact dequant s·c folds into the power stage
    (|s·c·z|² = s²·(c·z)²); the mel matmul + dB tail stay bf16/f32
    (_mel_tail_bf16) — they are the narrow, accuracy-critical part.

    Motivation: the int8 extraction tower's step is Amdahl-limited by
    the bf16 DSP front-end (10.0 of 55.4 ms at batch 512,
    tools/int8_frontend_split.py). Accuracy: the front-end's ~8-bit
    noise lands below the tower's own activation-quantization noise —
    the 0.999 embedding-cosine gate rides in tools/int8_dft_probe.py
    and the shipped accept/reject verdict in docs/DESIGN.md.
    """
    s = jnp.maximum(
        jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6
    ) / 127.0
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    ext = frame_signal_chunked(xq, cfg.n_dft, cfg.hop, cfg.padding)
    width = _round_up(ext.shape[-1], 256)
    if width != ext.shape[-1]:
        ext = jnp.concatenate(
            [ext, jnp.zeros(ext.shape[:-1] + (width - ext.shape[-1],),
                            jnp.int8)],
            axis=-1,
        )
    bank, c = _stft_basis_int8(cfg.n_dft, None, width)
    z = jnp.matmul(
        ext, jnp.asarray(bank), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * jnp.asarray(c)
    n_freq = cfg.n_dft // 2 + 1
    re, im = z[..., :n_freq], z[..., n_freq:]
    p = (re * re + im * im) * jnp.square(s)[..., None]
    return _mel_tail_bf16(p, cfg)


@functools.lru_cache(maxsize=None)
def _hann_f32(n: int) -> np.ndarray:
    return dsp_ref.periodic_hann(n).astype(np.float32)


def melspectrogram_fft(x: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """(B, n) → (B, n_mels, n_frames, 1) mel features, FFT DFT stage.

    Identical pipeline to melspectrogram_bf16 except the windowed DFT is
    one f32 `jnp.fft.rfft` over explicit n_dft-sample frames instead of
    two bf16 [B*T, k*hop] x [k*hop, n_freq] matmuls. rfft's
    e^{-2*pi*i*t*k/n} convention matches dsp_ref.stft_basis (cos / -sin)
    exactly, and the full-length periodic Hann window is multiplied into
    the frames, so |X| is the same transform — computed in f32, so
    closer to the HIGHEST-precision reference than the bf16 matmuls.
    Measured on v5e via tools/fft_frontend_probe.py; see docs/DESIGN.md
    for whether this or the matmul formulation is the shipping default.
    """
    ext = frame_signal_chunked(x, cfg.n_dft, cfg.hop, cfg.padding)
    frames = ext[..., : cfg.n_dft].astype(jnp.float32)
    win = jnp.asarray(_hann_f32(cfg.n_dft))
    fx = jnp.fft.rfft(frames * win, axis=-1)
    return _mel_tail_bf16(jnp.real(fx) ** 2 + jnp.imag(fx) ** 2, cfg)


def spectrogram_bf16(
    x: jnp.ndarray, cfg: SpectrogramConfig = SpectrogramConfig()
) -> jnp.ndarray:
    """(B, n) → (B, n_freq, n_frames, 1) |STFT|^power, bf16 MXU path
    (training-time variant of spectrogram; see melspectrogram_bf16)."""
    ext = frame_signal_chunked(x, cfg.n_dft, cfg.hop, cfg.padding)
    ext = ext.astype(jnp.bfloat16)
    w_re, w_im = _stft_basis_padded(cfg.n_dft, cfg.n_win, ext.shape[-1], bf16=True)
    re = jnp.matmul(ext, jnp.asarray(w_re), preferred_element_type=jnp.float32)
    im = jnp.matmul(ext, jnp.asarray(w_im), preferred_element_type=jnp.float32)
    p = re * re + im * im
    s = p ** (cfg.power / 2.0) if cfg.power != 2.0 else p
    s = jnp.transpose(s, (0, 2, 1))[..., None]
    if cfg.decibel:
        s = amplitude_to_db(s, per_sample=cfg.db_per_sample)
    return s


def power_frames(
    x: jnp.ndarray,
    n_dft: int,
    hop: int,
    padding: str,
    n_win: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, n) → (B, n_frames, n_freq) power spectrogram, frames-major."""
    frames = frame_signal(x, n_dft, hop, padding)
    real, imag = _stft_basis_f32(n_dft, n_win)
    re = jnp.matmul(frames, jnp.asarray(real), precision=precision)
    im = jnp.matmul(frames, jnp.asarray(imag), precision=precision)
    return re * re + im * im


def amplitude_to_db(
    x: jnp.ndarray,
    amin: float = 1e-10,
    dynamic_range: float = 80.0,
    sample_axes: tuple[int, ...] = (1, 2),
    per_sample: bool = True,
) -> jnp.ndarray:
    """Max-referenced dB scaling (see dsp_ref.amplitude_to_db).

    per_sample=False reproduces kapre<=0.1.x's batch-global max reference
    (reference audio_model.py:138-151): features become batch-dependent,
    but checkpoints trained under the quirk need it for bit-faithful
    reproduction on device.
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(x, amin))
    if per_sample:
        ref = jnp.max(log_spec, axis=sample_axes, keepdims=True)
    else:
        ref = jnp.max(log_spec)
    return jnp.maximum(log_spec - ref, -dynamic_range)


def l3_log_norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L3-paper normalization (reference audio_model.py:43)."""
    return jnp.log(jnp.maximum(x, eps)) / 5.0


def spectrogram(
    x: jnp.ndarray,
    cfg: SpectrogramConfig = SpectrogramConfig(),
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, n) waveforms → (B, n_freq, n_frames, 1) |STFT|^power features."""
    p = power_frames(x, cfg.n_dft, cfg.hop, cfg.padding, cfg.n_win, precision)
    s = p ** (cfg.power / 2.0) if cfg.power != 2.0 else p
    s = jnp.transpose(s, (0, 2, 1))[..., None]
    if cfg.decibel:
        s = amplitude_to_db(s, per_sample=cfg.db_per_sample)
    return s


def melspectrogram(
    x: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, n) waveforms → (B, n_mels, n_frames, 1) mel features."""
    p = power_frames(x, cfg.n_dft, cfg.hop, cfg.padding, None, precision)
    mel_t = jnp.asarray(
        _mel_matrix_f32(cfg.sr, cfg.n_dft, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.htk)
    )
    m = jnp.matmul(p, mel_t, precision=precision)  # (B, T, n_mels)
    if cfg.power_melgram != 2.0:
        m = m ** (cfg.power_melgram / 2.0)
    m = jnp.transpose(m, (0, 2, 1))[..., None]
    if cfg.decibel:
        m = amplitude_to_db(m, per_sample=cfg.db_per_sample)
    return m
