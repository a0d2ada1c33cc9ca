#!/usr/bin/env python
"""Example: programmatic embedding extraction (the OpenL3-style API).

The TPU-era analog of the reference's
extract_embedding_models_from_avc_models notebook: load an AVC
checkpoint, get 512-d (or 6144-d) audio embeddings for arbitrary audio.

    python examples/extract_embeddings.py model.ckpt cnn_L3_melspec2 in.wav
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help=".ckpt (or reference .h5) weights")
    p.add_argument("model_type", help="e.g. cnn_L3_melspec2")
    p.add_argument("audio", help="audio file (wav / npy / npz / via ffmpeg)")
    p.add_argument("--pooling", default="short", choices=["short", "original"])
    p.add_argument("--hop-size", type=float, default=0.1)
    p.add_argument("--fast", action="store_true",
                   help="bf16 fast tower (cosine >= 0.9999 vs f32)")
    p.add_argument("-o", "--output", help="save embeddings to .npz")
    args = p.parse_args()

    from l3embedding_tpu.embed import EmbeddingExtractor

    if args.checkpoint.endswith(".h5"):
        # Convert reference weights on the fly.
        from l3embedding_tpu.compat.keras_import import import_avc_weights
        from l3embedding_tpu.training import checkpoints

        variables = import_avc_weights(args.checkpoint, args.model_type)
        tmp = args.checkpoint + ".converted.ckpt"
        checkpoints.save_variables(tmp, variables["params"],
                                   variables["batch_stats"])
        args.checkpoint = tmp

    ex = EmbeddingExtractor(args.checkpoint, args.model_type, args.pooling,
                            fast=args.fast)
    emb = ex.embed_file(args.audio, hop_size=args.hop_size)
    print(f"{emb.shape[0]} windows x {emb.shape[1]}-d "
          f"(mean {emb.mean():.4f}, std {emb.std():.4f})")
    if args.output:
        np.savez_compressed(args.output, embedding=emb)
        print(f"saved to {args.output}")


if __name__ == "__main__":
    main()
