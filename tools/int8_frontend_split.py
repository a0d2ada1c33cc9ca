#!/usr/bin/env python
"""Where does the int8 extraction step spend its time? (round 5)

The int8 tower runs the accuracy-critical DSP front-end in bf16
(docs/DESIGN.md) and the 8 convs in s8xs8->s32. The MXU's int8 rate is
~1.9x bf16 at the tower's conv shapes (tools/int8_probe.py), yet the
end-to-end speedup is 1.71x at batch 512 — this probe measures the
front-end's share of the step to show the residual is Amdahl, not a
lowering miss. Three timings at one batch size, scalar-fetch synced,
dispatch amortized over --steps calls:

  * full      — the whole jitted int8 forward (frontend + quant + convs)
  * frontend  — melspectrogram_bf16 + folded input BN + the first quant
  * convs     — the int8 tower fed pre-computed front-end features

full vs frontend+convs also bounds what XLA's fusion buys across the
quant boundary.

Usage: python tools/int8_frontend_split.py [--batch 512] [--steps 20]
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
    ap.add_argument("--model-type", default="cnn_L3_melspec2")
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
        _conv,
        _frontend_features,
        _POOL_AFTER,
    )
    from l3embedding_tpu.models.embedding import _pool_flatten

    q = QuantizedAudioEmbedder(
        None, args.model_type, "short",
        variables=perturbed_variables(args.model_type),
    )
    q.calibrate(synth_audio(16, seed=2))
    scales = jax.device_put(q._act_scales)

    b = args.batch
    x = jax.device_put(
        jnp.asarray(np.tile(synth_audio(16, seed=3), (b // 16 + 1, 1))[:b])
    )

    def frontend_only(act_scales, audio):
        y = _frontend_features(q.fold, audio, f32=False)
        return jnp.clip(jnp.round(y / act_scales[0]), -127, 127).astype(
            jnp.int8
        )

    def convs_only(act_scales, qin):
        qq = qin
        for i in range(7):
            z = _conv(qq, q._wq[i], jnp.int32)
            deq = act_scales[i] * q._wscale[i]
            y = jnp.maximum(
                z.astype(jnp.float32) * deq + q._biases[i], 0.0
            )
            qq = jnp.clip(
                jnp.round(y / act_scales[i + 1]), -127, 127
            ).astype(jnp.int8)
            if i in _POOL_AFTER:
                qq = jax.lax.reduce_window(
                    qq, jnp.int8(-128), jax.lax.max,
                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
                )
        z = _conv(qq, q._wq[7], jnp.int32)
        feat = z.astype(jnp.float32) * (act_scales[7] * q._wscale[7]) \
            + q._biases[7]
        return _pool_flatten(feat, q.pool)

    fe_fn = jax.jit(frontend_only)
    cv_fn = jax.jit(convs_only)
    qin = jax.device_put(fe_fn(scales, x))

    dt_full = timeit(q._embed_fn, scales, x, steps=args.steps)
    dt_fe = timeit(fe_fn, scales, x, steps=args.steps)
    dt_cv = timeit(cv_fn, scales, qin, steps=args.steps)

    print(json.dumps({
        "probe": "int8_frontend_split",
        "batch": b,
        "full_ms": round(dt_full * 1e3, 2),
        "frontend_ms": round(dt_fe * 1e3, 2),
        "convs_ms": round(dt_cv * 1e3, 2),
        "frontend_frac_of_full": round(dt_fe / dt_full, 3),
        "split_sum_ms": round((dt_fe + dt_cv) * 1e3, 2),
        "clips_per_sec_full": round(b / dt_full, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
