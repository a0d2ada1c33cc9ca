#!/usr/bin/env python
"""Accept/reject probe: int8 DFT stage for the int8 extraction tower.

The round-5 step profile (tools/int8_frontend_split.py, docs/DESIGN.md)
shows the int8 extraction step is Amdahl-limited by the bf16 front-end
— 10.0 ms of 55.4 ms at batch 512, essentially all of it the two
[B·199, 2178]×[2178, 1025] DFT matmuls. Their *output* is immediately
re-quantized to int8 activations for conv 1, so running the DFT itself
s8×s8→s32 (frontend.melspectrogram_int8dft: per-frame row scales,
per-column basis scales, exact dequant folded into the power stage)
should roughly halve that segment IF (a) XLA's lowering realizes the
MXU's 2× int8 rate at this shape and (b) the ~8-bit front-end noise
keeps the embedding cosine above the 0.999 BASELINE gate. Both are
empirical — this probe measures them:

  * frontend-only ms: bf16 vs int8dft (incl. the first requant)
  * full step ms + clips/s: QuantizedAudioEmbedder with each front-end
  * embedding cosine vs the BN-folded f32/HIGHEST reference tower on
    held-out windows, for each front-end (the existing gate machinery,
    embed/quantized.embedding_cosine)

Timing discipline per docs/ROUND_NOTES.md: pre-staged device inputs,
scalar-fetch sync, dispatch amortized over --steps calls.

Usage:
  python tools/int8_dft_probe.py [--batch 512] [--steps 20]
  CPU smoke: L3_FORCE_PLATFORM=cpu python tools/int8_dft_probe.py \
      --batch 8 --steps 2 --calib 4 --eval 8
(int8-vs-bf16 ratios on CPU are meaningless; only cosines and the TPU
run count.)

Anchor: the extraction hot path, reference data/usc/features.py:256-306.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_int8_extract import timeit  # noqa: E402  (shared sync discipline)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--calib", type=int, default=128)
    ap.add_argument("--eval", dest="eval_n", type=int, default=64)
    ap.add_argument("--model-type", default="cnn_L3_melspec2")
    ap.add_argument("--skip-timing", action="store_true",
                    help="cosines only (fast CPU gate check)")
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

    from bench_int8_extract import perturbed_variables, synth_audio
    from l3embedding_tpu.embed.quantized import (
        QuantizedAudioEmbedder,
        _frontend_features,
    )

    variables = perturbed_variables(args.model_type)
    calib = synth_audio(args.calib, seed=2)
    eval_w = synth_audio(args.eval_n, seed=7)

    out = {"probe": "int8_dft", "batch": args.batch,
           "model_type": args.model_type}

    embedders = {}
    for name, dft_int8 in (("bf16fe", False), ("int8fe", True)):
        q = QuantizedAudioEmbedder(
            None, args.model_type, "short",
            variables=variables, dft_int8=dft_int8,
        )
        q.calibrate(calib)
        cmin, cmean = q.embedding_cosine(eval_w)
        out[f"cosine_min_{name}"] = round(cmin, 7)
        out[f"cosine_mean_{name}"] = round(cmean, 7)
        embedders[name] = q

    out["gate_0999_int8fe"] = bool(out["cosine_min_int8fe"] >= 0.999)

    if not args.skip_timing:
        b = args.batch
        x = jax.device_put(
            jnp.asarray(np.tile(synth_audio(16, seed=3), (b // 16 + 1, 1))[:b])
        )
        for name, q in embedders.items():
            scales = jax.device_put(q._act_scales)

            def frontend_only(act_scales, audio, _q=q):
                y = _frontend_features(_q.fold, audio, f32=False,
                                       dft_int8=_q.dft_int8)
                return jnp.clip(
                    jnp.round(y / act_scales[0]), -127, 127
                ).astype(jnp.int8)

            fe_fn = jax.jit(frontend_only)
            dt_fe = timeit(fe_fn, scales, x, steps=args.steps)
            dt_full = timeit(q._embed_fn, scales, x, steps=args.steps)
            out[f"frontend_ms_{name}"] = round(dt_fe * 1e3, 2)
            out[f"full_ms_{name}"] = round(dt_full * 1e3, 2)
            out[f"clips_per_sec_{name}"] = round(b / dt_full, 1)
        out["frontend_speedup"] = round(
            out["frontend_ms_bf16fe"] / out["frontend_ms_int8fe"], 3
        )
        out["full_speedup"] = round(
            out["full_ms_bf16fe"] / out["full_ms_int8fe"], 3
        )

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
