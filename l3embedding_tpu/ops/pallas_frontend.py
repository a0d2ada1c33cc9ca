"""Fused Pallas TPU kernel for the mel-spectrogram front-end.

Status (round 2): measured SLOWER end-to-end than the bf16 chunk-framed
XLA formulation (frontend.melspectrogram_bf16: 3.1 ms vs 5.0 ms at
batch 128 on v5e) — XLA fuses the elementwise stages into the MXU
matmuls well once the gather framing is gone, and this kernel's
per-sample grid serializes small matmuls. Kept as the selectable
alternative (L3_TRAIN_FRONTEND=fused) and as the in-VMEM design
reference; it also documents why the batch≥160 remote-compiler SIGABRT
disappeared when it left the default path.

The f32 XLA formulation (frontend.melspectrogram) materializes two large
intermediates in HBM per batch: the DFT projections (B, T, 1025) x2 and
the power spectrogram. This kernel keeps everything in VMEM:

    grid = (batch, freq_tiles)
    per step:  re = frames @ W_re[:, tile]          (MXU)
               im = frames @ W_im[:, tile]          (MXU)
               acc += (re^2 + im^2) @ melT[tile, :] (MXU)
    last tile: amp = sqrt(acc); dB (per-sample max-ref, -80 floor) → out

so the only HBM traffic is the framed input (streamed once per freq
tile) and the final (T, n_mels) melgram. The frequency axis is tiled at
128 lanes; the windowed-DFT and mel basis matrices are zero-padded to
the tile boundary (extra bins contribute nothing to the mel sum).

Numerics match ops/dsp_ref.melspectrogram (power_melgram=1.0, decibel,
per-sample max reference) — golden-tested in interpret mode on CPU and
usable directly on TPU. Layout note: output is frames-major (B, T,
n_mels); the caller transposes to the model's (B, n_mels, T, 1) NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dsp_ref, frontend

FREQ_TILE = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _padded_bases(sr, n_dft, n_mels, fmin, fmax, htk):
    """(W_re, W_im) of shape (n_dft, F_pad) and melT (F_pad, n_mels),
    zero-padded along the frequency axis to a FREQ_TILE multiple.

    Basis matrices are stored bf16: the MXU multiplies in bf16 anyway
    (preferred_element_type only sets the f32 accumulator), so full-f32
    operand storage buys no accuracy — measured feature cosine vs the
    float64 numpy reference is 0.999999 either way — while halving the
    VMEM working set and basis-streaming bandwidth."""
    real, imag = dsp_ref.stft_basis(n_dft)
    mel_t = dsp_ref.mel_filterbank(sr, n_dft, n_mels, fmin, fmax, htk).T
    n_freq = real.shape[1]
    f_pad = _round_up(n_freq, FREQ_TILE)
    w_re = np.zeros((n_dft, f_pad), np.float32)
    w_im = np.zeros((n_dft, f_pad), np.float32)
    melt = np.zeros((f_pad, n_mels), np.float32)
    w_re[:, :n_freq] = real
    w_im[:, :n_freq] = imag
    melt[:n_freq, :] = mel_t
    import ml_dtypes

    return (
        w_re.astype(ml_dtypes.bfloat16),
        w_im.astype(ml_dtypes.bfloat16),
        melt,
    )


def _mel_kernel(frames_ref, wre_ref, wim_ref, melt_ref, out_ref, acc_ref,
                *, n_frames, amin, dynamic_range, decibel):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    f = frames_ref[0].astype(wre_ref.dtype)  # (T_pad, n_dft)
    re = jnp.dot(f, wre_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wim_ref[...], preferred_element_type=jnp.float32)
    p = re * re + im * im
    acc_ref[...] += jnp.dot(p, melt_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        amp = jnp.sqrt(jnp.maximum(acc_ref[...], 0.0))
        if decibel:
            db = 10.0 * (jnp.log(jnp.maximum(amp, amin)) / np.log(10.0))
            row = jax.lax.broadcasted_iota(jnp.int32, db.shape, 0)
            valid = row < n_frames
            ref = jnp.max(jnp.where(valid, db, -jnp.inf))
            out_ref[0] = jnp.maximum(db - ref, -dynamic_range)
        else:
            out_ref[0] = amp


def melspectrogram_fused(
    x: jnp.ndarray,
    cfg: frontend.MelConfig = frontend.MelConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n) waveforms → (B, n_mels, n_frames, 1), fused on-TPU.

    Drop-in replacement for frontend.melspectrogram (power_melgram=1.0).
    """
    if cfg.power_melgram != 1.0:
        raise NotImplementedError("fused kernel implements power_melgram=1.0")
    batch = x.shape[0]
    n_frames = cfg.n_frames(x.shape[-1])
    t_pad = _round_up(n_frames, 8)

    frames = frontend.frame_signal(x, cfg.n_dft, cfg.hop, cfg.padding)
    if t_pad != n_frames:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - n_frames), (0, 0)))

    w_re, w_im, melt = _padded_bases(
        cfg.sr, cfg.n_dft, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.htk
    )
    f_pad = w_re.shape[1]
    n_tiles = f_pad // FREQ_TILE

    kernel = functools.partial(
        _mel_kernel,
        n_frames=n_frames,
        amin=1e-10,
        dynamic_range=80.0,
        decibel=cfg.decibel,
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t_pad, cfg.n_dft), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_dft, FREQ_TILE), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_dft, FREQ_TILE), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_TILE, cfg.n_mels), lambda b, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, cfg.n_mels), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, t_pad, cfg.n_mels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_pad, cfg.n_mels), jnp.float32)],
        interpret=interpret,
    )(frames, jnp.asarray(w_re), jnp.asarray(w_im), jnp.asarray(melt))

    out = out[:, :n_frames, :]
    return jnp.transpose(out, (0, 2, 1))[..., None]


@functools.lru_cache(maxsize=None)
def _padded_stft_bases(n_dft, n_win):
    """(W_re, W_im) of shape (n_dft, F_pad), bf16, freq-padded."""
    real, imag = dsp_ref.stft_basis(n_dft, n_win)
    n_freq = real.shape[1]
    f_pad = _round_up(n_freq, FREQ_TILE)
    w_re = np.zeros((n_dft, f_pad), np.float32)
    w_im = np.zeros((n_dft, f_pad), np.float32)
    w_re[:, :n_freq] = real
    w_im[:, :n_freq] = imag
    import ml_dtypes

    return (
        w_re.astype(ml_dtypes.bfloat16),
        w_im.astype(ml_dtypes.bfloat16),
        n_freq,
    )


def _spec_kernel(frames_ref, wre_ref, wim_ref, out_ref, acc_ref,
                 *, n_frames, n_freq, power, amin, dynamic_range, decibel,
                 f_pad):
    j = pl.program_id(1)

    f = frames_ref[0].astype(wre_ref.dtype)  # (T_pad, n_dft)
    re = jnp.dot(f, wre_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wim_ref[...], preferred_element_type=jnp.float32)
    p = re * re + im * im                     # (T_pad, FREQ_TILE)
    if power == 1.0:
        p = jnp.sqrt(p)                       # amplitude: cheap VPU rsqrt path
    elif power != 2.0:
        p = p ** (power / 2.0)
    acc_ref[:, pl.ds(j * FREQ_TILE, FREQ_TILE)] = p

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        s = acc_ref[...]
        if decibel:
            db = 10.0 * (jnp.log(jnp.maximum(s, amin)) / np.log(10.0))
            row = jax.lax.broadcasted_iota(jnp.int32, db.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
            valid = (row < n_frames) & (col < n_freq)
            ref = jnp.max(jnp.where(valid, db, -jnp.inf))
            s = jnp.maximum(db - ref, -dynamic_range)
        out_ref[0] = s


def spectrogram_fused(
    x: jnp.ndarray,
    cfg: frontend.SpectrogramConfig = frontend.SpectrogramConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n) waveforms → (B, n_freq, n_frames, 1) fused |STFT|^power
    (+ optional dB): the linear front-end of cnn_L3_orig /
    cnn_L3_kapredbinputbn on-TPU. The L3 log norm (orig) is left to the
    caller — it fuses trivially in XLA."""
    batch = x.shape[0]
    n_frames = cfg.n_frames(x.shape[-1])
    t_pad = _round_up(n_frames, 8)

    frames = frontend.frame_signal(x, cfg.n_dft, cfg.hop, cfg.padding)
    if t_pad != n_frames:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - n_frames), (0, 0)))

    w_re, w_im, n_freq = _padded_stft_bases(cfg.n_dft, cfg.n_win)
    f_pad = w_re.shape[1]
    n_tiles = f_pad // FREQ_TILE

    kernel = functools.partial(
        _spec_kernel,
        n_frames=n_frames,
        n_freq=n_freq,
        power=cfg.power,
        amin=1e-10,
        dynamic_range=80.0,
        decibel=cfg.decibel,
        f_pad=f_pad,
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t_pad, cfg.n_dft), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_dft, FREQ_TILE), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_dft, FREQ_TILE), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, f_pad), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, t_pad, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_pad, f_pad), jnp.float32)],
        interpret=interpret,
    )(frames, jnp.asarray(w_re), jnp.asarray(w_im))

    out = out[:, :n_frames, :n_freq]
    return jnp.transpose(out, (0, 2, 1))[..., None]


def pallas_available() -> bool:
    """Fused kernels compile only on real TPU backends."""
    return jax.default_backend() not in ("cpu", "gpu")
