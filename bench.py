"""Headline benchmark: cnn_L3_melspec2 AVC training throughput (pairs/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference recorded no absolute
throughput; its production recipe trained 300 epochs x 4096 batches x 64
pairs (78.6M pairs) on 4x V100 within a 7-day SLURM budget
(reference jobs/l3embedding-train-melspec2-09192018.sbatch:3-9,31-46),
i.e. >=130 pairs/sec aggregate if the full budget was used — the most
favorable (fastest) reading for the reference. vs_baseline is measured
pairs/sec on ONE TPU chip divided by that 130 pairs/sec.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 78_643_200 / (7 * 86_400)  # ≈130, 4x V100 aggregate


def make_batch(batch_size, rng):
    return {
        "video": rng.randint(0, 256, size=(batch_size, 224, 224, 3)).astype(
            np.uint8
        ),
        "audio": (rng.randn(batch_size, 1, 48000) * 8000).astype(np.int16),
        "label": np.eye(2, dtype=np.float32)[
            rng.randint(0, 2, size=batch_size)
        ],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-type", default="cnn_L3_melspec2")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--mode", choices=["train", "extract"], default="train")
    p.add_argument(
        "--dtype",
        choices=["bf16", "f32"],
        default="bf16",
        help="training compute dtype (params always f32); extract is f32",
    )
    args = p.parse_args()

    import jax

    try:
        # Persistent compilation cache: repeated bench invocations skip
        # the multi-minute XLA compile.
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
    except Exception:
        pass

    from l3embedding_tpu.models import audio_embedding_fn, build_model
    from l3embedding_tpu.parallel import create_mesh, replicate, shard_batch
    from l3embedding_tpu.training.state import create_train_state
    from l3embedding_tpu.training.steps import make_train_step

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    spec = build_model(args.model_type)
    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = (
        spec.module(compute_dtype=compute_dtype)
        if args.mode == "train"
        else spec.module()
    )
    mesh = create_mesh()

    if args.mode == "train":
        state = create_train_state(
            model,
            jax.random.PRNGKey(0),
            spec.video_input_shape,
            spec.audio_input_shape,
            learning_rate=1e-5,
        )
        state = replicate(state, mesh)
        step = make_train_step(model)
        batches = [
            shard_batch(make_batch(args.batch_size, rng), mesh) for _ in range(2)
        ]

        for i in range(args.warmup):
            state, metrics = step(state, batches[i % 2])
        float(metrics["loss"])  # value fetch: the only reliable sync here

        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, batches[i % 2])
        float(metrics["loss"])
        dt = time.perf_counter() - t0

        pairs_per_sec = args.steps * args.batch_size / dt
        per_chip = pairs_per_sec / jax.device_count()
        print(
            json.dumps(
                {
                    "metric": "avc_train_pairs_per_sec_per_chip_melspec2",
                    "value": round(per_chip, 2),
                    "unit": "pairs/sec/chip",
                    "vs_baseline": round(
                        pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2
                    ),
                }
            )
        )
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 224, 224, 3), np.float32),
            np.zeros((1, 1, 48000), np.float32),
            train=False,
        )
        fn = jax.jit(audio_embedding_fn(args.model_type, "short"))
        audio = jax.numpy.asarray(
            (rng.randn(args.batch_size, 1, 48000) * 0.1).astype(np.float32)
        )
        emb = fn(variables, audio)
        float(emb[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            emb = fn(variables, audio)
        float(emb[0, 0])
        dt = time.perf_counter() - t0
        clips_per_sec = args.steps * args.batch_size / dt
        print(
            json.dumps(
                {
                    "metric": "embedding_clips_per_sec_melspec2_short",
                    "value": round(clips_per_sec, 2),
                    "unit": "1s-clips/sec",
                    "vs_baseline": round(clips_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
                }
            )
        )


if __name__ == "__main__":
    sys.exit(main())
