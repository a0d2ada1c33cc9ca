"""Round-2 perf ablations on the real TPU chip.

Times individual pieces of the melspec2 train step so optimization
effort lands where the milliseconds are. Sync discipline per
docs/ROUND_NOTES.md: fetch a scalar, never block_until_ready, never pull
big arrays through the tunnel.

Usage: python tools/ablate_r2.py frontend|fwd|train|scan [--batch N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    # Fetch ONE scalar: slicing on device first keeps the transfer at 4
    # bytes (np.asarray(big) would drag the whole buffer through the
    # ~30 MB/s relay and dominate the measurement).
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


def bench_frontend(batch):
    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.ops import frontend
    from l3embedding_tpu.ops.pallas_frontend import melspectrogram_fused

    rng = np.random.RandomState(0)
    x = jax.device_put(
        jnp.asarray((rng.randn(batch, 48000) * 0.3).astype(np.float32))
    )
    cfg = frontend.MelConfig(n_mels=256)

    variants = {
        "fused_pallas": jax.jit(lambda v: melspectrogram_fused(v, cfg)),
        "xla_bf16_chunked": jax.jit(lambda v: frontend.melspectrogram_bf16(v, cfg)),
        "xla_f32_highest_gather": jax.jit(
            lambda v: frontend.melspectrogram(v, cfg)
        ),
    }
    for name, fn in variants.items():
        try:
            dt = timeit(fn, x)
            print(json.dumps({"variant": name, "batch": batch,
                              "ms": round(dt * 1e3, 3)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:200]}))


def _setup(batch, model_type="cnn_L3_melspec2"):
    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.parallel import create_mesh, replicate, shard_batch
    from l3embedding_tpu.training.state import create_train_state

    rng = np.random.RandomState(0)
    spec = build_model(model_type)
    model = spec.module(compute_dtype=jnp.bfloat16)
    mesh = create_mesh()
    state = create_train_state(
        model, jax.random.PRNGKey(0), spec.video_input_shape,
        spec.audio_input_shape, learning_rate=1e-5,
    )
    state = replicate(state, mesh)
    batch_host = {
        "video": rng.randint(0, 256, size=(batch, 224, 224, 3)).astype(np.uint8),
        "audio": (rng.randn(batch, 1, 48000) * 8000).astype(np.int16),
        "label": np.eye(2, dtype=np.float32)[rng.randint(0, 2, size=batch)],
    }
    return model, state, shard_batch(batch_host, mesh)


def bench_fwd(batch):
    import jax
    import jax.numpy as jnp

    from l3embedding_tpu.training.steps import preprocess_batch

    model, state, sharded = _setup(batch)

    @jax.jit
    def fwd(state, b):
        video, audio = preprocess_batch(b["video"], b["audio"])
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            video, audio, train=True, mutable=["batch_stats"],
        )
        return logits

    dt = timeit(fwd, state, sharded)
    print(json.dumps({"variant": "fwd_train_mode", "batch": batch,
                      "ms": round(dt * 1e3, 3),
                      "pairs_per_sec": round(batch / dt, 1)}))


def bench_train(batch):
    from l3embedding_tpu.training.steps import make_train_step

    model, state, sharded = _setup(batch)
    step = make_train_step(model, donate=False)

    def call(state, b):
        new_state, metrics = step(state, b)
        return metrics["loss"]

    dt = timeit(call, state, sharded)
    print(json.dumps({
        "variant": "train_step",
        "frontend": os.environ.get("L3_TRAIN_FRONTEND", "xla"),
        "batch": batch, "ms": round(dt * 1e3, 3),
        "pairs_per_sec": round(batch / dt, 1),
    }))


def bench_scan(batch, k=4):
    """K train steps in one dispatch (lax-free: python-unrolled inside
    jit over a recycled batch) — isolates per-dispatch tunnel overhead."""
    import jax

    from l3embedding_tpu.training.steps import make_train_step

    model, state, sharded = _setup(batch)
    inner = make_train_step(model, donate=False)

    @jax.jit
    def multi(state, b):
        metrics = None
        for _ in range(k):
            state, metrics = inner(state, b)
        return state, metrics

    def call(state, b):
        s2, m = multi(state, b)
        return m["loss"]

    dt = timeit(call, state, sharded, steps=8)
    print(json.dumps({"variant": f"train_x{k}_per_dispatch", "batch": batch,
                      "ms_per_step": round(dt * 1e3 / k, 3),
                      "pairs_per_sec": round(batch * k / dt, 1)}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("what", choices=["frontend", "fwd", "train", "scan"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=4)
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
    except Exception:
        pass

    if args.what == "frontend":
        bench_frontend(args.batch)
    elif args.what == "fwd":
        bench_fwd(args.batch)
    elif args.what == "train":
        bench_train(args.batch)
    elif args.what == "scan":
        bench_scan(args.batch, args.k)


if __name__ == "__main__":
    main()
