#!/usr/bin/env python
"""Measure host input-pipeline throughput for a directory of h5 batches.

Answers "will this corpus feed the mesh?" before launching training:
prints batches/sec and samples/sec through the same
data_generator + AsyncBatchPipeline path `03` uses, without touching
any accelerator. Compare against the device step rate (bench.py) —
if this number is lower, the run is input-bound and the corpus should
be re-encoded (see 02's --h5-compression lzf/none) or sharded wider.

    python tools/bench_input_pipeline.py TRAIN_H5_DIR --batches 50
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--batches", type=int, default=50)
    p.add_argument("--prefetch", type=int, default=4)
    p.add_argument("--random-state", type=int, default=0)
    args = p.parse_args()

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


if __name__ == "__main__":
    main()
