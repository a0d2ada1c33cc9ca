"""Micro-probe: maxpool backward — SelectAndScatter vs recompute-mask.

XLA lowers the VJP of reduce_window(max) to SelectAndScatter, profiled
at ~12 ms/step across the L3 pools. The alternative recomputes the mask
in backward: dx = dy_upsampled * (x == y_upsampled) — one elementwise
pass over x. For non-overlapping 2x2/stride-2 windows the two differ
only on exact ties (SelectAndScatter routes to the first max;
the mask splits... actually duplicates). Ties have measure zero for
continuous activations; this probe measures both and checks agreement.

Usage: python tools/poolgrad_probe.py [--batch 128]
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
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import os

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
    except Exception:
        pass

    shapes = [
        (args.batch, 224, 224, 64),
        (args.batch, 112, 112, 128),
        (args.batch, 56, 56, 256),
        (args.batch, 256, 199, 64),
    ]
    rng = np.random.RandomState(0)

    def pool_sas(x):
        return nn.max_pool(x, (2, 2), (2, 2), "VALID")

    def pool_mask(x):
        # Non-overlapping 2x2: reshape into window axes, max over them;
        # backward of (reshape, max, reshape) is JAX's native max-reduce
        # VJP (equality mask + tie-splitting division).
        b, h, w, c = x.shape
        xr = x[:, : h // 2 * 2, : w // 2 * 2, :].reshape(
            b, h // 2, 2, w // 2, 2, c
        )
        return xr.max(axis=(2, 4))

    @jax.custom_vjp
    def pool_custom(x):
        b, h, w, c = x.shape
        xr = x[:, : h // 2 * 2, : w // 2 * 2, :].reshape(
            b, h // 2, 2, w // 2, 2, c
        )
        return xr.max(axis=(2, 4))

    def pool_custom_fwd(x):
        y = pool_custom(x)
        return y, (x, y)

    def pool_custom_bwd(res, dy):
        # First-max routing without the tie-count pass: mask the first
        # occurrence only via cumulative logic is another pass — for
        # continuous activations ties are measure-zero, so route to ALL
        # maxima (duplicates on exact ties; SelectAndScatter picks the
        # first). One fused elementwise pass over x.
        x, y = res
        b, h, w, c = x.shape
        xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
        yb = y[:, :, None, :, None, :]
        dyb = dy[:, :, None, :, None, :]
        dx = jnp.where(xr == yb, dyb.astype(xr.dtype), 0)
        return (dx.reshape(b, h, w, c),)

    pool_custom.defvjp(pool_custom_fwd, pool_custom_bwd)

    for shape in shapes:
        x = jax.device_put(jnp.asarray(
            rng.randn(*shape).astype(np.float32), dtype=jnp.bfloat16))

        for name, pool in (
            ("sas", pool_sas),
            ("mask", pool_mask),
            ("custom", pool_custom),
        ):
            def loss(x, pool=pool):
                return jnp.sum(pool(x).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))
            try:
                dt = timeit(g, x, steps=args.steps)
                print(json.dumps({
                    "variant": f"poolbwd_{name}", "shape": shape,
                    "ms": round(dt * 1e3, 3)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": f"poolbwd_{name}",
                                  "shape": shape, "error": repr(e)[:160]}))

        g1 = jax.jit(jax.grad(lambda x: jnp.sum(
            pool_sas(x).astype(jnp.float32) ** 2)))(x)
        g2 = jax.jit(jax.grad(lambda x: jnp.sum(
            pool_mask(x).astype(jnp.float32) ** 2)))(x)
        err = float(jnp.max(jnp.abs(
            g1.astype(jnp.float32) - g2.astype(jnp.float32))))
        print(json.dumps({"check": "grad_agreement", "shape": shape,
                          "max_abs_err": err}))


if __name__ == "__main__":
    main()
