"""Device-profile the melspec2 train step and aggregate by HLO category.

Runs N steps under jax.profiler.trace and parses the emitted
*.trace.json.gz directly (no tensorboard): TPU op events carry
`hlo_category` and `device_duration_ps` in their args. Prints a
per-category table plus the top individual fusions, so kernel work lands
where the milliseconds are.

Usage: python tools/profile_step.py [--batch 128] [--steps 5] [--top 15]
       python tools/profile_step.py --mode extract   # the 05 hot path
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_trace(trace_dir):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))
    return events


def aggregate(events, steps):
    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for ev in events:
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if not cat:
            continue
        # device_duration_ps when present is authoritative; fall back to
        # the event's wall duration (us).
        ps = args.get("device_duration_ps")
        ms = (
            float(ps) / 1e9
            if ps is not None
            else float(ev.get("dur", 0)) / 1e3
        )
        by_cat[cat] += ms
        by_name[(cat, ev.get("name", "?"))] += ms
        total += ms
    scale = 1.0 / max(steps, 1)
    return (
        {k: v * scale for k, v in by_cat.items()},
        {k: v * scale for k, v in by_name.items()},
        total * scale,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--mode", choices=["train", "extract"], default="train")
    p.add_argument("--model-type", default="cnn_L3_melspec2")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
        )
    except Exception:
        pass

    from l3embedding_tpu.models import audio_embedding_fn, build_model
    from l3embedding_tpu.parallel import create_mesh, replicate, shard_batch
    from l3embedding_tpu.training.state import create_train_state
    from l3embedding_tpu.training.steps import make_train_step

    rng = np.random.RandomState(0)
    spec = build_model(args.model_type)

    if args.mode == "train":
        model = spec.module(compute_dtype=jnp.bfloat16)
        mesh = create_mesh()
        state = create_train_state(
            model, jax.random.PRNGKey(0), spec.video_input_shape,
            spec.audio_input_shape, learning_rate=1e-5,
        )
        state = replicate(state, mesh)
        batch = shard_batch({
            "video": rng.randint(
                0, 256, size=(args.batch, 224, 224, 3)).astype(np.uint8),
            "audio": (rng.randn(args.batch, 1, 48000) * 8000).astype(np.int16),
            "label": np.eye(2, dtype=np.float32)[
                rng.randint(0, 2, size=args.batch)],
        }, mesh)
        step = make_train_step(model, donate=False)

        def run_one(s):
            s2, m = step(s, batch)
            return s2, m["loss"]

        state, loss = run_one(state)
        state, loss = run_one(state)
        float(loss)

        def run_all():
            s, last = state, None
            for _ in range(args.steps):
                s, last = run_one(s)
            float(last)
    else:
        model = spec.module()
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 224, 224, 3), np.float32),
            np.zeros((1, 1, 48000), np.float32),
            train=False,
        )
        fn = jax.jit(audio_embedding_fn(args.model_type, "short"))
        audio = jnp.asarray(
            (rng.randn(args.batch, 1, 48000) * 0.1).astype(np.float32))
        out = fn(variables, audio)
        float(out[0, 0])

        def run_all():
            last = None
            for _ in range(args.steps):
                last = fn(variables, audio)
            float(last[0, 0])

    trace_dir = tempfile.mkdtemp(prefix="l3prof_")
    jax.profiler.start_trace(trace_dir)
    run_all()
    jax.profiler.stop_trace()

    by_cat, by_name, total = aggregate(collect_trace(trace_dir), args.steps)
    print(f"\n== per-step device time by hlo_category "
          f"(total {total:.1f} ms over {args.steps} steps) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {cat}")
    print(f"\n== top {args.top} ops ==")
    for (cat, name), ms in sorted(by_name.items(), key=lambda kv: -kv[1])[
        : args.top
    ]:
        print(f"  {ms:8.2f} ms  [{cat}] {name[:110]}")


if __name__ == "__main__":
    main()
