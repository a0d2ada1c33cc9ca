#!/usr/bin/env python
"""Export a standalone embedding model from a trained AVC checkpoint.

The reference does this in two notebooks — extracting the audio
embedding submodel (for what became OpenL3) and the spectrogram
front-end submodel from full AVC Keras models (reference
notebooks/extract_embedding_models_from_avc_models.ipynb,
extract_spectrogram_models_from_avc_models.ipynb). The TPU-native
equivalent is a checkpoint transform: slice the requested tower's
parameter/stat subtree out of the AVC pytree and write it next to a
descriptor JSON carrying everything needed to rebuild the extractor
(model_type, pooling table, embedding dim, front-end quirk flags).

    python tools/export_embedding_model.py \
        runs/embedding/music/cnn_L3_melspec2/2024.../model_best_valid_accuracy.ckpt \
        --model-type cnn_L3_melspec2 --embedding audio --pooling short \
        --output openl3_audio_short

writes `openl3_audio_short.ckpt` + `openl3_audio_short.json`. Load with
`l3embedding_tpu.embed.extract.load_exported_embedding` (→ a resident
EmbeddingExtractor) or hand the .ckpt to any flax code — it's a plain
msgpack pytree. The spectrogram "submodel" needs no weights at all here
(the front-end is a pure function of static config); `--embedding
frontend` therefore writes only the descriptor JSON.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="AVC .ckpt (ours) or Keras .h5")
    p.add_argument("--model-type", required=True)
    p.add_argument("--embedding", default="audio",
                   choices=["audio", "vision", "frontend"])
    p.add_argument("--pooling", default="original",
                   choices=["original", "short"])
    p.add_argument("--kapre-batch-global-db", dest="db_batch_global",
                   action="store_true",
                   help="Record the kapre<=0.1.x batch-global dB quirk in "
                   "the descriptor (checkpoints trained under it)")
    p.add_argument("--output", required=True,
                   help="Output prefix (writes <output>.ckpt + .json)")
    args = p.parse_args()

    import jax

    # Same test/CI hook as bench.py: this image's sitecustomize re-pins
    # JAX_PLATFORMS=axon at interpreter start, so the env var alone
    # cannot keep a subprocess off the TPU tunnel — the config update
    # must run before backend init. tests/test_service.py sets
    # L3_FORCE_PLATFORM=cpu so the export roundtrip never grabs (or is
    # failed by an outage of) the tunnel.
    forced = os.environ.get("L3_FORCE_PLATFORM")
    if forced:
        os.environ["JAX_PLATFORMS"] = forced
        jax.config.update("jax_platforms", forced)

    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.models.loading import load_model
    from l3embedding_tpu.training import checkpoints

    spec = build_model(args.model_type)

    desc = {
        "framework": "l3embedding_tpu",
        "export": args.embedding,
        "model_type": args.model_type,
        "pooling_type": args.pooling,
        "db_batch_global": bool(args.db_batch_global),
        "audio_input_shape": list(spec.audio_input_shape),
        "video_input_shape": list(spec.video_input_shape),
        "audio_embedding_pooling": {
            k: list(v) for k, v in spec.audio_embedding_pooling.items()
        },
    }

    if args.embedding == "frontend":
        # The DSP front-end has no trainable state: the descriptor alone
        # rebuilds it (ops/frontend config is derived from model_type).
        with open(args.output + ".json", "w") as f:
            json.dump(desc, f, indent=2)
        print(f"wrote {args.output}.json (front-end has no weights)")
        return

    _, variables = load_model(args.checkpoint, args.model_type)
    tower = f"{args.embedding}_model"
    sub_params = variables["params"][tower]
    sub_stats = variables["batch_stats"][tower]
    checkpoints.save_variables(
        args.output + ".ckpt",
        {tower: sub_params},
        {tower: sub_stats},
    )
    n_params = sum(
        x.size for x in __import__("jax").tree.leaves(sub_params)
    )
    desc["n_params"] = int(n_params)
    with open(args.output + ".json", "w") as f:
        json.dump(desc, f, indent=2)
    print(
        f"wrote {args.output}.ckpt ({n_params:,} params) + {args.output}.json"
    )


if __name__ == "__main__":
    main()
