"""Micro-probe: is a width-packed 64-channel conv faster on v5e?

The L3 block-1 convs have 64 output channels — half the MXU's 128
output lanes idle, and the profiled rate is ~94 TFLOP/s vs ~179 for the
deep 256/512-channel convs (docs/DESIGN.md ablation). Width-packing
reformulates a 3x3 stride-1 C->64 conv as a 3x4 stride-(1,2) C->128
conv whose kernel holds two shifted copies of W: output column pairs
(2j, 2j+1) land in channel blocks [0:64] / [64:128] of packed column j.
1.33x the FLOPs, but at full-lane rate — net ~1.5x if the MXU delivers.

This probe measures fwd / wgrad / dgrad for the plain and packed
formulations at the real block-1 shapes, plus numeric equivalence.

Usage: python tools/convpack_probe.py [--batch 128] [--spatial 224]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--spatial", type=int, default=224)
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
    except Exception:
        pass

    B, S, C = args.batch, args.spatial, args.cin
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randn(B, S, S, C).astype(np.float32), dtype=jnp.bfloat16))
    w = jax.device_put(jnp.asarray(
        (rng.randn(3, 3, C, 64) * 0.05).astype(np.float32),
        dtype=jnp.bfloat16))
    dy = jax.device_put(jnp.asarray(
        rng.randn(B, S, S, 64).astype(np.float32), dtype=jnp.bfloat16))
    dy2 = dy.reshape(B, S, S // 2, 128)

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def plain(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

    def pack_kernel(w):
        k = jnp.zeros((3, 4, C, 128), w.dtype)
        k = k.at[:, 0:3, :, 0:64].set(w)
        k = k.at[:, 1:4, :, 64:128].set(w)
        return k

    def packed(x, w):
        k = pack_kernel(w)
        dnp = lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, k, (1, 2), [(1, 1), (1, 1)], dimension_numbers=dnp)

    # -- numeric equivalence (packed cols unpack to the plain output)
    y_plain = jax.jit(plain)(x, w)
    y_packed = jax.jit(packed)(x, w)
    y_unpacked = y_packed.reshape(B, S, S, 64)
    err = float(jnp.max(jnp.abs(
        y_plain.astype(jnp.float32) - y_unpacked.astype(jnp.float32))))
    print(json.dumps({"check": "pack_equivalence", "max_abs_err": err}))

    flop_plain = 2 * B * S * S * 9 * C * 64
    flop_packed = 2 * B * S * (S // 2) * 12 * C * 128

    results = {}
    for name, f, flops in (
        ("plain_fwd", lambda: jax.jit(plain), flop_plain),
        ("packed_fwd", lambda: jax.jit(packed), flop_packed),
    ):
        dt = timeit(f(), x, w, steps=args.steps)
        results[name] = dt
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                          "tflops": round(flops / dt / 1e12, 1)}))

    # -- grads: d/dx and d/dw through each formulation via a scalar loss
    def loss_plain(x, w, dy):
        return jnp.sum(plain(x, w).astype(jnp.float32)
                       * dy.astype(jnp.float32))

    def loss_packed(x, w, dy2):
        return jnp.sum(packed(x, w).astype(jnp.float32)
                       * dy2.astype(jnp.float32))

    gx_plain = jax.jit(jax.grad(loss_plain, argnums=0))
    gw_plain = jax.jit(jax.grad(loss_plain, argnums=1))
    gx_packed = jax.jit(jax.grad(loss_packed, argnums=0))
    gw_packed = jax.jit(jax.grad(loss_packed, argnums=1))

    for name, fn, a in (
        ("plain_dgrad", gx_plain, (x, w, dy)),
        ("plain_wgrad", gw_plain, (x, w, dy)),
        ("packed_dgrad", gx_packed, (x, w, dy2)),
        ("packed_wgrad", gw_packed, (x, w, dy2)),
    ):
        try:
            dt = timeit(fn, *a, steps=args.steps)
            results[name] = dt
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:200]}))

    # -- grad equivalence
    gw1 = gw_plain(x, w, dy).astype(jnp.float32)
    gw2 = gw_packed(x, w, dy2).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(gw1 - gw2)) / (jnp.max(jnp.abs(gw1)) + 1e-9))
    print(json.dumps({"check": "wgrad_equivalence", "max_rel_err": rel}))

    if "plain_fwd" in results and "packed_fwd" in results:
        tot_plain = sum(results[k] for k in
                        ("plain_fwd", "plain_dgrad", "plain_wgrad")
                        if k in results)
        tot_packed = sum(results[k] for k in
                         ("packed_fwd", "packed_dgrad", "packed_wgrad")
                         if k in results)
        print(json.dumps({
            "summary": "fwd+dgrad+wgrad",
            "plain_ms": round(tot_plain * 1e3, 2),
            "packed_ms": round(tot_packed * 1e3, 2),
            "speedup": round(tot_plain / max(tot_packed, 1e-9), 3),
        }))


if __name__ == "__main__":
    main()
