"""Micro-probe: conv MXU rates across channel widths + space-to-depth.

The width-pack probe (convpack_probe.py) showed 1-D output packing is a
wash: block-1 convs are slow because BOTH C_in=64 and C_out=64
under-fill the MXU (66 TF/s vs 197 peak). Space-to-depth(2x2) fixes
both at once: x(B,H,W,C) -> (B,H/2,W/2,4C); a 3x3 stride-1 conv becomes
a 2x2 conv over cells with a 4Cx4C' sparsity-9/16 kernel (1.78x FLOPs),
and the block's 2x2 maxpool collapses to an elementwise max over the 4
channel groups. Worth it iff the 2x2/4C conv runs ~3x faster than the
plain one. This probe measures every L3 conv shape plain vs s2d.

Usage: python tools/s2d_probe.py [--batch 128]
"""

import argparse
import json
import time

import numpy as np


def sync(x):
    return float(x.reshape(-1)[0])


def timeit(fn, *args, steps=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps


def bench_conv(name, B, H, W, Cin, Cout, kh, kw, steps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randn(B, H, W, Cin).astype(np.float32), dtype=jnp.bfloat16))
    w = jax.device_put(jnp.asarray(
        (rng.randn(kh, kw, Cin, Cout) * 0.02).astype(np.float32),
        dtype=jnp.bfloat16))
    pad = [(kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=dn)

    dy = jax.device_put(jnp.asarray(
        rng.randn(B, H, W, Cout).astype(np.float32), dtype=jnp.bfloat16))

    def loss(x, w):
        return jnp.sum(f(x, w).astype(jnp.float32) * dy.astype(jnp.float32))

    flops = 2 * B * H * W * kh * kw * Cin * Cout
    out = {"name": name, "shape": [B, H, W, Cin],
           "k": [kh, kw], "cout": Cout}
    try:
        dt = timeit(jax.jit(f), x, w, steps=steps)
        out["fwd_ms"] = round(dt * 1e3, 3)
        out["fwd_tflops"] = round(flops / dt / 1e12, 1)
        dtx = timeit(jax.jit(jax.grad(loss, 0)), x, w, steps=steps)
        out["dgrad_ms"] = round(dtx * 1e3, 3)
        dtw = timeit(jax.jit(jax.grad(loss, 1)), x, w, steps=steps)
        out["wgrad_ms"] = round(dtw * 1e3, 3)
        out["total_ms"] = round((dt + dtx + dtw) * 1e3, 2)
    except Exception as e:  # noqa: BLE001
        out["error"] = repr(e)[:160]
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cases", nargs="*", default=None,
                   help="subset of case names to run")
    args = p.parse_args()
    B = args.batch

    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
    except Exception:
        pass

    cases = [
        # block-1 second conv (the hot one), plain vs packed-channel
        # variants. NOTE: for stride-1 convs a true s2d formulation needs
        # a 3x3 kernel over cells (4x FLOPs) — the 2x2 numbers below are
        # *upper bounds* (what a free-sparsity packing would cost).
        ("v_b1c2_plain", B, 224, 224, 64, 64, 3, 3),
        ("v_b1c2_s2d", B, 112, 112, 256, 256, 2, 2),
        ("v_b1c2_s2d3x3", B, 112, 112, 256, 256, 3, 3),
        # audio block-1 second conv
        ("a_b1c2_plain", B, 256, 200, 64, 64, 3, 3),
        # block-2 convs, plain vs s2d upper bound
        ("v_b2_plain", B, 112, 112, 128, 128, 3, 3),
        ("v_b2_s2d", B, 56, 56, 512, 512, 2, 2),
        # block-3 / block-4 convs
        ("v_b3_plain", B, 56, 56, 256, 256, 3, 3),
        ("v_b4_plain", B, 28, 28, 512, 512, 3, 3),
        # first convs (tiny Cin)
        ("v_b1c1_plain", B, 224, 224, 3, 64, 3, 3),
        ("a_b1c1_plain", B, 256, 200, 1, 64, 3, 3),
    ]
    for c in cases:
        if args.cases and c[0] not in args.cases:
            continue
        bench_conv(*c, steps=args.steps)


if __name__ == "__main__":
    main()
