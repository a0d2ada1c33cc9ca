"""Round-3 go/no-go spike: custom Pallas fused conv+BN+ReLU for block-1.

VERDICT r2 #1: the remaining train-step frontier is block-1's 64-channel
convs (vision+audio conv1_2, reference audio_model.py:45-115 /
vision_model.py:28-99), profiled at ~27 ms of the 103 ms conv time
because Cin=Cout=64 underfills the 128-lane MXU. This spike measures
whether a hand-written Pallas kernel can beat XLA's conv emitters there:

  xla   — XLA baseline: jit(relu(conv2d(x,w,SAME)*scale+shift)) on the
          vision conv1_2 shape (B,224,224,64)->(B,224,224,64), bf16.
  gemm  — OPTIMISTIC UPPER BOUND for any matmul-formulated Pallas conv:
          the exact im2col GEMM [M=3584, K=576, N=64] with all operands
          resident in VMEM, repeated inside the kernel (no HBM, no
          im2col cost, no halo logic). If this rate does not beat the
          XLA baseline's effective rate, no realizable kernel can.
  fused — a real fused conv+BN+ReLU Pallas kernel: pre-padded input in
          HBM, per-(sample, row-tile) DMA of an 18-row slab into VMEM,
          im2col via 9 shifted copies, one [3584,576]x[576,64] MXU
          matmul, scale/shift/ReLU epilogue, tile written straight out.

Numbers land in docs/DESIGN.md + docs/ROUND_NOTES.md as the measured
go/no-go. Sync discipline per docs/ROUND_NOTES.md: scalar fetch only.

Usage: python tools/pallas_block1_spike.py [xla|gemm|fused|all]
       [--batch 128] [--steps 20]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B_DEF = 128
H = W = 224
C = 64
KH = KW = 3
TILE_H = 16  # output rows per grid step; 224 = 14 * 16
M_TILE = TILE_H * W  # 3584 im2col rows per tile
K_DIM = KH * KW * C  # 576


def sync(x):
    return float(x.reshape(-1)[0])


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / steps


def _inputs(batch, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(batch, H, W, C).astype(np.float32) * 0.1
    w = rng.randn(KH, KW, C, C).astype(np.float32) * 0.05
    scale = rng.rand(C).astype(np.float32) + 0.5
    shift = rng.randn(C).astype(np.float32) * 0.1
    return x, w, scale, shift


def bench_xla(batch, steps):
    import jax
    import jax.numpy as jnp

    x, w, scale, shift = _inputs(batch)
    xd = jax.device_put(jnp.asarray(x, jnp.bfloat16))
    wd = jax.device_put(jnp.asarray(w, jnp.bfloat16))
    sd, bd = jax.device_put(jnp.asarray(scale)), jax.device_put(jnp.asarray(shift))

    @jax.jit
    def f(x, w, s, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y * s + b, 0.0).astype(jnp.bfloat16)

    dt = timeit(f, xd, wd, sd, bd, steps=steps)
    flops = 2 * batch * H * W * K_DIM * C
    return {"variant": "xla_conv_bn_relu", "ms": dt * 1e3,
            "tflops": flops / dt / 1e12}


def bench_gemm(batch, steps, reps=64, n_out=C):
    """Pure-MXU rate on the im2col GEMM shape, operands VMEM-resident.

    reps matmuls per pallas_call; the A operand is nudged per-iteration
    (one cheap VPU multiply) so Mosaic cannot hoist the loop-invariant
    dot out of the fori_loop.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M_TILE, K_DIM) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(K_DIM, n_out) * 0.05, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(1, n_out) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(1, n_out) * 0.1, jnp.float32)

    def kernel(a_ref, w_ref, s_ref, b_ref, o_ref):
        def body(i, acc):
            # Nudge the small W operand per-iteration (f32 scalar math;
            # Mosaic has no scalar bf16 ops) so the loop-invariant dot
            # cannot be hoisted; ~0.1 us of VPU vs ~2.7 us of MXU.
            fac = 1.0 + i.astype(jnp.float32) * 1e-8
            wi = (w_ref[:].astype(jnp.float32) * fac).astype(jnp.bfloat16)
            return acc + jnp.dot(
                a_ref[:], wi, preferred_element_type=jnp.float32
            )

        acc = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((M_TILE, n_out), jnp.float32)
        )
        o_ref[:] = jnp.maximum(acc * s_ref[:] + b_ref[:], 0.0).astype(jnp.bfloat16)

    f = jax.jit(
        lambda a, w, s, b: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M_TILE, n_out), jnp.bfloat16),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, w, s, b)
    )
    dt = timeit(f, a, w, scale, shift, steps=steps)
    flops = 2 * M_TILE * K_DIM * n_out * reps
    return {"variant": f"pallas_gemm_vmem_n{n_out}", "ms": dt * 1e3,
            "tflops": flops / dt / 1e12, "reps": reps}


def _fused_kernel(xp_ref, w_ref, s_ref, b_ref, o_ref, slab, acol, sem):
    """One (sample b, row-tile t) step: DMA an 18-row padded slab,
    im2col 9 shifted (16,224,64) views into the (3584,576) A matrix,
    one MXU matmul, BN-apply+ReLU epilogue."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * TILE_H  # top output row == top padded-slab row

    cp = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(row0, TILE_H + 2), :, :], slab, sem
    )
    cp.start()
    cp.wait()

    for dy in range(KH):
        for dx in range(KW):
            tap = dy * KW + dx
            acol[:, tap * C:(tap + 1) * C] = slab[
                dy:dy + TILE_H, dx:dx + W, :C
            ].reshape(M_TILE, C)

    acc = jnp.dot(acol[:], w_ref[:], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[:] + b_ref[:], 0.0).astype(jnp.bfloat16)
    o_ref[0] = y.reshape(TILE_H, W, C)


def bench_fused(batch, steps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, w, scale, shift = _inputs(batch)
    xd = jax.device_put(jnp.asarray(x, jnp.bfloat16))
    wd = jax.device_put(
        jnp.asarray(w.reshape(K_DIM, C), jnp.bfloat16)
    )  # (dy,dx,ci) -> rows, matching the im2col column order
    sd = jax.device_put(jnp.asarray(scale.reshape(1, C)))
    bd = jax.device_put(jnp.asarray(shift.reshape(1, C)))

    def make_f(nb):
        grid = (nb, H // TILE_H)

        @jax.jit
        def f(x, w, s, b):
            # W padded to 232 (=8*29) and channels to 128: Mosaic DMA
            # slices must be 8-aligned on the sublane dim and 128-aligned
            # on the lane dim — C=64 inputs cannot even be DMA'd without
            # a 2x HBM-traffic channel pad (part of the measured verdict).
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 64)))
            return pl.pallas_call(
                _fused_kernel,
                out_shape=jax.ShapeDtypeStruct((nb, H, W, C), jnp.bfloat16),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),  # padded x, HBM
                    pl.BlockSpec((K_DIM, C), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, TILE_H, W, C), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((TILE_H + 2, W + 8, 2 * C), jnp.bfloat16),
                    pltpu.VMEM((M_TILE, K_DIM), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )(xp, w, s, b)

        return f

    # Correctness vs the XLA formulation first (small slice).
    @jax.jit
    def ref(x, w4, s, b):
        y = jax.lax.conv_general_dilated(
            x, w4, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y * s + b, 0.0).astype(jnp.bfloat16)

    small = xd[:2]
    # The fused program bakes the batch into grid/out_shape: the
    # correctness check needs its own batch-2 program, or the batch-N
    # kernel would DMA out of bounds and the shapes wouldn't compare.
    got = np.asarray(make_f(2)(small, wd, sd, bd), np.float32)
    want = np.asarray(
        ref(small, jnp.asarray(w, jnp.bfloat16), jnp.asarray(scale),
            jnp.asarray(shift)),
        np.float32,
    )
    err = float(np.max(np.abs(got - want)))
    rel = err / (float(np.max(np.abs(want))) + 1e-9)

    dt = timeit(make_f(batch), xd, wd, sd, bd, steps=steps)
    flops = 2 * batch * H * W * K_DIM * C
    return {"variant": "pallas_fused_conv_bn_relu", "ms": dt * 1e3,
            "tflops": flops / dt / 1e12, "max_abs_err": err, "rel_err": rel}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("part", nargs="?", default="gemm",
                    choices=["xla", "gemm", "fused", "all"],
                    help="CAUTION: 'fused'/'all' compile the full Pallas "
                         "conv kernel — measured to hang the remote compiler "
                         ">15 min and wedge the TPU tunnel for ~1 h (see "
                         "docs/ROUND_NOTES.md). Run only far from a bench "
                         "window.")
    ap.add_argument("--batch", type=int, default=B_DEF)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    results = []
    if args.part in ("xla", "all"):
        results.append(bench_xla(args.batch, args.steps))
        print(json.dumps(results[-1]), flush=True)
    if args.part in ("gemm", "all"):
        results.append(bench_gemm(args.batch, args.steps, n_out=C))
        print(json.dumps(results[-1]), flush=True)
        results.append(bench_gemm(args.batch, args.steps, n_out=128))
        print(json.dumps(results[-1]), flush=True)
    if args.part in ("fused", "all"):
        results.append(bench_fused(args.batch, args.steps))
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
