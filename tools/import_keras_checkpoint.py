#!/usr/bin/env python
"""Convert a reference Keras `.h5` AVC weights file into this framework's
checkpoint format.

The TPU-era replacement for the reference's weight-conversion notebooks
(reference notebooks/convert_multigpu_singlegpu.ipynb,
extract_embedding_models_from_avc_models.ipynb): one command maps the
Keras layer weights (including multi-GPU-wrapped layouts) onto the flax
pytree and writes a `.ckpt` that 05_generate_embedding_samples and the
EmbeddingExtractor consume directly.

    python tools/import_keras_checkpoint.py \
        model_best_valid_accuracy.h5 cnn_L3_melspec2 out/model.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="Convert reference Keras .h5 weights to a .ckpt"
    )
    parser.add_argument("h5_path", help="Keras weights .h5 file")
    parser.add_argument("model_type", help="e.g. cnn_L3_melspec2")
    parser.add_argument("output_path", help="output .ckpt path")
    args = parser.parse_args()

    from l3embedding_tpu.compat.keras_import import import_avc_weights
    from l3embedding_tpu.training import checkpoints

    variables = import_avc_weights(args.h5_path, args.model_type)
    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)),
                exist_ok=True)
    checkpoints.save_variables(
        args.output_path, variables["params"], variables["batch_stats"]
    )
    print(f"Wrote {args.output_path}")


if __name__ == "__main__":
    main()
