"""On-chip measurement: int8 quantized extraction vs the bf16/f32 towers.

Measures, for cnn_L3_melspec2/short (the headline extraction config):
  * throughput of QuantizedAudioEmbedder._embed_fn at several batches,
  * the same for the bf16 fast tower (the current headline),
  * min/mean embedding cosine of the int8 path vs the BN-folded f32
    tower AND vs the standard f32 extraction path (audio_embedding_fn),
    on audio-like synthetic windows with perturbed BN stats (the same
    convention bench.py --parity uses, so numbers are comparable).

Timing discipline per docs/ROUND_NOTES.md: pre-staged device inputs,
scalar-fetch sync only, repeated calls amortizing dispatch.

Usage: python tools/bench_int8_extract.py [--steps 20] [--batches 128,256,512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_audio(n, seed=0):
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


def perturbed_variables(model_type="cnn_L3_melspec2", seed=1):
    import jax

    from l3embedding_tpu.models import build_model

    spec = build_model(model_type)
    model = spec.module()
    variables = jax.device_get(
        model.init(
            jax.random.PRNGKey(seed),
            np.zeros((1, 224, 224, 3), np.float32),
            np.zeros((1, 1, 48000), np.float32),
            train=False,
        )
    )

    def perturb(path, leaf):
        name = getattr(path[-1], "key", "")
        if name == "mean":
            return leaf + 0.05
        if name == "var":
            return leaf * 1.3 + 0.01
        return leaf

    import jax.tree_util

    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        perturb, variables["batch_stats"]
    )
    return variables


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out.reshape(-1)[0], np.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(out.reshape(-1)[0], np.float32))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--model-type", default="cnn_L3_melspec2")
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--calib", type=int, default=128,
                    help="calibration windows (CPU smokes: use 4-8)")
    ap.add_argument("--eval", dest="eval_n", type=int, default=64,
                    help="held-out cosine-eval windows")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    forced = os.environ.get("L3_FORCE_PLATFORM")
    if forced:  # same recipe as bench.py: sitecustomize re-pins axon
        import jax as _jax

        os.environ["JAX_PLATFORMS"] = forced
        _jax.config.update("jax_platforms", forced)

    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.embed.quantized import QuantizedAudioEmbedder
    from l3embedding_tpu.models import audio_embedding_fn

    variables = perturbed_variables(args.model_type)
    q = QuantizedAudioEmbedder(None, args.model_type, "short",
                               variables=variables)
    q.calibrate(synth_audio(args.calib, seed=2))

    # -- accuracy ------------------------------------------------------
    eval_windows = synth_audio(args.eval_n, seed=3)
    mn_fold, mean_fold = q.embedding_cosine(eval_windows)

    f32_fn = jax.jit(audio_embedding_fn(args.model_type, "short"))
    want = np.asarray(f32_fn(variables, eval_windows[:, None, :]))
    got = q.embed_windows(eval_windows)
    cos = (got * want).sum(1) / np.maximum(
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1), 1e-12
    )
    print(json.dumps({
        "probe": "int8_cosine",
        "vs_folded_f32_min": round(mn_fold, 7),
        "vs_folded_f32_mean": round(mean_fold, 7),
        "vs_extractor_f32_min": round(float(cos.min()), 7),
        "vs_extractor_f32_mean": round(float(cos.mean()), 7),
        "gate_0999_pass": bool(cos.min() >= 0.999),
    }), flush=True)

    # -- throughput ----------------------------------------------------
    scales = jax.device_put(q._act_scales)
    for b in [int(x) for x in args.batches.split(",")]:
        x = jax.device_put(
            jnp.asarray(
                np.tile(eval_windows, (b // len(eval_windows) + 1, 1))[:b]
            )
        )
        dt = timeit(q._embed_fn, scales, x, steps=args.steps)
        row = {"probe": f"int8_extract_b{b}",
               "ms": round(dt * 1e3, 2),
               "clips_per_sec": round(b / dt, 1)}
        if not args.skip_bf16:
            bf16_fn = jax.jit(
                audio_embedding_fn(args.model_type, "short",
                                   compute_dtype=jnp.bfloat16)
            )
            vd = jax.device_put(variables)
            x3 = jax.device_put(x[:, None, :])
            dt2 = timeit(lambda v, a: bf16_fn(v, a), vd, x3,
                         steps=args.steps)
            row["bf16_ms"] = round(dt2 * 1e3, 2)
            row["bf16_clips_per_sec"] = round(b / dt2, 1)
            row["speedup_vs_bf16"] = round(dt2 / dt, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
