"""Go/no-go probe: does int8 convolution beat bf16 on the v5e MXU?

The single-chip *train* step is measured at the compiler envelope
(docs/DESIGN.md round-3 rejection), so remaining throughput ideas must
change the numeric formulation, not the lowering. The v5e MXU is
documented at 2x int8 throughput vs bf16 (394 TOPS vs 197 TFLOPs),
which would apply to the extraction/serving path (audio tower only,
reference l3embedding/audio_model.py:45-115 + data/usc/features.py:303)
via post-training quantization: BN folded into conv weights, per-output-
channel int8 weights, int8 activations (which also halve HBM traffic on
the elementwise epilogues).

This probe measures, per representative audio-tower conv shape, the
steady-state rate of

  bf16 — conv_general_dilated bf16xbf16 -> f32, cast back to bf16
  int8 — conv_general_dilated s8xs8 -> s32, requantized back to s8
         (right-shift; stands in for the real scale+clip epilogue)

chained inside ONE jitted fori_loop so dispatch/sync cost is amortized
(docs/ROUND_NOTES.md: the tunnel's per-call dispatch can reach ~4 ms;
probes must put >>10 ms of compute in one call). A s8xs8->s32 matmul
control checks whether the int8 MXU path exists at all through this
stack before trusting the conv numbers.

Usage: python tools/int8_probe.py [--batch 256] [--steps 5] [--reps 24]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, H, W, C) — same-channel convs from the melspec2 audio tower at
# extraction shapes, one per block (conv i_2 of each block).
SHAPES = [
    ("b1c2_256x199x64", 256, 199, 64),
    ("b2c2_128x99x128", 128, 99, 128),
    ("b3c2_64x49x256", 64, 49, 256),
    ("b4c2_32x24x512", 32, 24, 512),
]


def sync(x):
    return float(np.asarray(x.reshape(-1)[0], np.float32))


def timeit(fn, *args, steps=5, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps


def bench_conv(batch, h, w, c, dtype, steps, reps):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if dtype == "bf16":
        x = jnp.asarray(rng.randn(batch, h, w, c) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)

        @jax.jit
        def f(x, k):
            def body(i, xc):
                y = jax.lax.conv_general_dilated(
                    xc, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                # keep magnitudes bounded so chained bf16 never overflows
                return (y * 0.05).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, reps, body, x)

    else:  # int8
        x = jnp.asarray(rng.randint(-100, 100, (batch, h, w, c)), jnp.int8)
        k = jnp.asarray(rng.randint(-100, 100, (3, 3, c, c)), jnp.int8)

        @jax.jit
        def f(x, k):
            def body(i, xc):
                y = jax.lax.conv_general_dilated(
                    xc, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                # requant epilogue stand-in: shift + clip back to s8
                return jnp.clip(y >> 9, -127, 127).astype(jnp.int8)

            return jax.lax.fori_loop(0, reps, body, x)

    dt = timeit(f, x, k, steps=steps) / reps
    flops = 2 * batch * h * w * 9 * c * c
    return {"ms": dt * 1e3, "tops": flops / dt / 1e12}


def bench_matmul(dtype, steps, reps, n=4096):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if dtype == "bf16":
        a = jnp.asarray(rng.randn(n, n) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.randn(n, n) * 0.05, jnp.bfloat16)

        @jax.jit
        def f(a, b):
            def body(i, ac):
                y = jnp.dot(ac, b, preferred_element_type=jnp.float32)
                return (y * (1.0 / n)).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, reps, body, a)

    else:
        a = jnp.asarray(rng.randint(-100, 100, (n, n)), jnp.int8)
        b = jnp.asarray(rng.randint(-100, 100, (n, n)), jnp.int8)

        @jax.jit
        def f(a, b):
            def body(i, ac):
                y = jnp.dot(ac, b, preferred_element_type=jnp.int32)
                return jnp.clip(y >> 14, -127, 127).astype(jnp.int8)

            return jax.lax.fori_loop(0, reps, body, a)

    dt = timeit(f, a, b, steps=steps) / reps
    flops = 2 * n * n * n
    return {"ms": dt * 1e3, "tops": flops / dt / 1e12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--part", default="all", choices=["matmul", "conv", "all"])
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    forced = os.environ.get("L3_FORCE_PLATFORM")
    if forced:  # same recipe as bench.py: sitecustomize re-pins axon
        import jax

        os.environ["JAX_PLATFORMS"] = forced
        jax.config.update("jax_platforms", forced)

    if args.part in ("matmul", "all"):
        for dt in ("bf16", "int8"):
            r = bench_matmul(dt, args.steps, args.reps)
            print(json.dumps({"probe": f"matmul4096_{dt}", **r}), flush=True)

    if args.part in ("conv", "all"):
        for label, h, w, c in SHAPES:
            row = {"probe": label, "batch": args.batch}
            for dt in ("bf16", "int8"):
                r = bench_conv(args.batch, h, w, c, dt, args.steps, args.reps)
                row[dt + "_ms"] = round(r["ms"], 3)
                row[dt + "_tops"] = round(r["tops"], 1)
            row["speedup"] = round(row["bf16_ms"] / row["int8_ms"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
