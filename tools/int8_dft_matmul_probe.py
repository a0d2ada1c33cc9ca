#!/usr/bin/env python
"""Why is the int8 DFT front-end slower than bf16? (round 5 forensics)

tools/int8_dft_probe.py measured the s8×s8→s32 DFT stage at 16.3 ms vs
10.2 ms bf16 (batch 512) despite the MXU's nominal 2× int8 rate. Two
candidate causes: (a) the quantize step (row-max + round/clip over the
[512·199, 2178] frame tensor) doesn't fuse and pays an extra HBM pass;
(b) the int8 GEMM itself is slow at this shape (K=2178 is 17·128+2 —
not lane-aligned — and N=1025 is one over 8·128). This probe times the
bare GEMM at the exact DFT shape in bf16 and int8, plus K/N-padded int8
variants, fori_loop-chained per the dispatch discipline
(docs/ROUND_NOTES.md): the small operand is nudged per iteration with a
slice of the product so the dot stays live without re-staging the big
LHS.

Usage: python tools/int8_dft_matmul_probe.py [--m 101888] [--steps 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, *args, steps=5, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out.reshape(-1)[0], np.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(out.reshape(-1)[0], np.float32))
    return (time.perf_counter() - t0) / steps


def bench(m, k, n, dtype, steps, reps):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if dtype == "bf16":
        a = jnp.asarray(rng.randn(m, k) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.randn(k, n) * 0.1, jnp.bfloat16)

        @jax.jit
        def f(a, b):
            def body(i, bc):
                y = jnp.dot(a, bc, preferred_element_type=jnp.float32)
                return (bc + y[0:1, :].astype(jnp.bfloat16) * 1e-3).astype(
                    jnp.bfloat16
                )

            return jax.lax.fori_loop(0, reps, body, b)

    else:
        a = jnp.asarray(rng.randint(-100, 100, (m, k)), jnp.int8)
        b = jnp.asarray(rng.randint(-100, 100, (k, n)), jnp.int8)

        @jax.jit
        def f(a, b):
            def body(i, bc):
                y = jnp.dot(a, bc, preferred_element_type=jnp.int32)
                return jnp.clip(
                    bc.astype(jnp.int32) + (y[0:1, :] >> 20), -127, 127
                ).astype(jnp.int8)

            return jax.lax.fori_loop(0, reps, body, b)

    dt = timeit(f, a, b, steps=steps) / reps
    flops = 2.0 * m * k * n
    return {"ms": round(dt * 1e3, 3), "tops": round(flops / dt / 1e12, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=101888)  # 512*199 frames
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    forced = os.environ.get("L3_FORCE_PLATFORM")
    if forced:
        import jax as _jax

        os.environ["JAX_PLATFORMS"] = forced
        _jax.config.update("jax_platforms", forced)

    cases = [
        ("bf16_k2178_n1025", 2178, 1025, "bf16"),
        ("int8_k2178_n1025", 2178, 1025, "int8"),
        ("int8_k2304_n1025", 2304, 1025, "int8"),  # K padded to 18*128
        ("int8_k2304_n1024", 2304, 1024, "int8"),  # + N lane-aligned
        ("bf16_k2178_n2050", 2178, 2050, "bf16"),  # fused re+im bank
        ("int8_k2178_n2050", 2178, 2050, "int8"),
    ]
    out = {"probe": "int8_dft_matmul", "m": args.m}
    for name, k, n, dtype in cases:
        r = bench(args.m, k, n, dtype, args.steps, args.reps)
        out[name] = r
        print(f"# {name}: {r}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
