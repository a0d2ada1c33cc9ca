#!/usr/bin/env python
"""Can jnp.fft.rfft beat the DFT-as-matmul front-end on the TPU? (round 5)

The extraction step's bf16 DSP front-end is a fixed ~10 ms at batch 512
(tools/int8_frontend_split.py) and is MXU-bound on the windowed-DFT
matmul: the chunk-framed formulation does ~910 GFLOP per batch-512 call
([B*199, 2178] x [2178, 1025] twice, re+im). A radix-2 FFT computes the
same transform in ~80x fewer FLOPs; whether XLA:TPU's FFT lowering
realizes any of that through this remote-compile stack has never been
measured (round 2 only rejected a conv-formulated DFT, which is MORE
flops, not fewer). This probe measures:

  * mel_bf16 — the production front-end (ops/frontend.melspectrogram_bf16)
  * mel_fft  — identical pipeline with the two DFT matmuls replaced by
               one f32 jnp.fft.rfft over explicit 2048-sample frames
               (window multiplied in; rfft's e^{-2pi i tk/n} convention
               matches dsp_ref.stft_basis's cos / -sin exactly)
  * cosine(mel_fft, mel_f32_highest) and cosine(mel_bf16, mel_f32_highest)
    — the FFT runs in f32, so parity should IMPROVE if anything

Timing discipline per docs/ROUND_NOTES.md: pipelined dispatch, one
4-byte scalar fetch to sync, warmup excluded; run small batch first
(fresh-FFT-compile wedge risk).

Usage: python tools/fft_frontend_probe.py [--batch 512] [--steps 20]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_int8_extract import timeit  # noqa: E402  (shared sync discipline)


def cosine(a, b):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--skip-f32-ref", action="store_true",
                    help="skip the f32 HIGHEST matmul reference leg")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    forced = os.environ.get("L3_FORCE_PLATFORM")
    if forced:
        import jax as _jax

        os.environ["JAX_PLATFORMS"] = forced
        _jax.config.update("jax_platforms", forced)

    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.ops import frontend

    cfg = frontend.MelConfig(n_mels=256)  # melspec2, the flagship

    rng = np.random.default_rng(7)
    b = args.batch
    x_np = (rng.standard_normal((b, 48000)) * 0.2).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np))

    f_bf16 = jax.jit(lambda w: frontend.melspectrogram_bf16(w, cfg))
    f_fft = jax.jit(lambda w: frontend.melspectrogram_fft(w, cfg))

    out = {"probe": "fft_frontend", "batch": b, "platform": jax.devices()[0].platform}

    # Compile + numerics first (catches FFT lowering failure before timing).
    y_bf16 = np.asarray(f_bf16(x[:8]))
    y_fft = np.asarray(f_fft(x[:8]))
    out["cosine_fft_vs_bf16_b8"] = round(cosine(y_fft, y_bf16), 8)
    if not args.skip_f32_ref:
        f_f32 = jax.jit(lambda w: frontend.melspectrogram(w, cfg))
        y_f32 = np.asarray(f_f32(x[:8]))
        out["cosine_bf16_vs_f32_b8"] = round(cosine(y_bf16, y_f32), 8)
        out["cosine_fft_vs_f32_b8"] = round(cosine(y_fft, y_f32), 8)

    dt_bf16 = timeit(f_bf16, x, steps=args.steps)
    dt_fft = timeit(f_fft, x, steps=args.steps)
    out["mel_bf16_ms"] = round(dt_bf16 * 1e3, 3)
    out["mel_fft_ms"] = round(dt_fft * 1e3, 3)
    out["fft_speedup"] = round(dt_bf16 / dt_fft, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
