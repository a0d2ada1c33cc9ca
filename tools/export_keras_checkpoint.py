#!/usr/bin/env python
"""Convert one of this framework's `.ckpt` AVC checkpoints into a
reference-layout Keras `.h5` weights file.

The inverse of tools/import_keras_checkpoint.py — the reverse-migration
path: a model trained here can be handed back to the 2018 Keras codebase
(reference l3embedding/model.py:85-128 `load_model`) or the OpenL3
export notebooks unchanged. The kapre spectrogram layer's DFT/mel
kernels are regenerated from ops/dsp_ref so the file is complete.

    python tools/export_keras_checkpoint.py \
        out/model_best_valid_accuracy.ckpt cnn_L3_melspec2 model.h5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="Convert a .ckpt to reference Keras .h5 weights"
    )
    parser.add_argument("ckpt_path", help="framework .ckpt file")
    parser.add_argument("model_type", help="e.g. cnn_L3_melspec2")
    parser.add_argument("output_path", help="output .h5 path")
    args = parser.parse_args()

    import jax
    import numpy as np

    from l3embedding_tpu.compat.keras_export import export_avc_weights
    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.training import checkpoints

    spec = build_model(args.model_type)
    model = spec.module()
    template = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1,) + tuple(spec.video_input_shape), np.float32),
        np.zeros((1,) + tuple(spec.audio_input_shape), np.float32),
        train=False,
    )
    variables = checkpoints.load_variables(args.ckpt_path, template)
    out_dir = os.path.dirname(os.path.abspath(args.output_path))
    os.makedirs(out_dir, exist_ok=True)
    export_avc_weights(variables, args.model_type, args.output_path)
    print(f"Wrote {args.output_path}")


if __name__ == "__main__":
    main()
