"""Dump the compiled HLO of the melspec2 train step for fusion forensics.

Pairs with tools/profile_step.py: the profile names ops like
`fusion.274` / `convert_reduce_fusion.4`; this dump lets you grep those
names and read off the conv shapes/metadata inside, so kernel work
targets the right layer.

Usage: python tools/hlo_dump.py [--batch 128] [--out /tmp/step_hlo.txt]
       python tools/hlo_dump.py --names fusion.274 convert_reduce_fusion.4
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--out", default="/tmp/step_hlo.txt")
    p.add_argument("--names", nargs="*", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
        )
    except Exception:
        pass

    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.parallel import create_mesh, replicate, shard_batch
    from l3embedding_tpu.training.state import create_train_state
    from l3embedding_tpu.training.steps import make_train_step

    rng = np.random.RandomState(0)
    spec = build_model("cnn_L3_melspec2")
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
    compiled = step.lower(state, batch).compile()
    text = compiled.as_text()
    with open(args.out, "w") as fh:
        fh.write(text)
    print(f"wrote {len(text)} bytes to {args.out}")

    if args.names:
        # Print each requested fusion's computation body (the lines of
        # its called computation, which carry conv dims + metadata).
        for name in args.names:
            print(f"\n==== {name} ====")
            # root line where the fusion is invoked (shows calls=)
            m = re.search(
                rf"^\s*%?{re.escape(name)}\s*=.*$", text, re.MULTILINE
            )
            if not m:
                print("  (not found)")
                continue
            line = m.group(0)
            print("  " + line[:400])
            cm = re.search(r"calls=%?([\w.\-]+)", line)
            if cm:
                comp = cm.group(1)
                cm2 = re.search(
                    rf"^%?{re.escape(comp)}\s*[\(=].*?^\}}",
                    text,
                    re.MULTILINE | re.DOTALL,
                )
                if cm2:
                    body = cm2.group(0)
                    for bl in body.splitlines():
                        if ("convolution" in bl or "reduce" in bl
                                or "dot(" in bl or "metadata" in bl):
                            print("    " + bl.strip()[:300])


if __name__ == "__main__":
    main()
