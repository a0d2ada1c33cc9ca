#!/usr/bin/env python
"""Export the published VGGish TF-slim checkpoint to the .npz format
`models/vggish.load_vggish_weights` consumes.

The published weights (vggish_model.ckpt, linked from the reference's
data/usc/vggish/README) are a TensorFlow V1/V2 checkpoint; this image has
no TensorFlow and no network, so the golden-value gate
(reference vggish_smoke_test.py:79-95 → tests/test_vggish.py) stays
dormant until someone runs this one-time export wherever the checkpoint
and TF exist:

    python tools/export_vggish_npz.py vggish_model.ckpt vggish_weights.npz

then drop vggish_weights.npz next to the model (or pass its path) and
the golden asserts activate. Readers, in preference order:

  1. tensorflow (tf.train.load_checkpoint) — the canonical path.
  2. tf-slim-free fallback: `torch` can't read TF bundles and this image
     has neither, so without TF the script exits with instructions
     instead of guessing at the bundle format.

The key set written is exactly models/vggish._SLIM_NAME_MAP's domain —
validated here against the mapping so a renamed/missing variable fails
the export, not the later load.
"""

import argparse
import sys


def read_with_tf(ckpt_path):
    import tensorflow as tf  # noqa: F401  (any TF ≥1.15)

    reader = tf.train.load_checkpoint(ckpt_path)
    names = list(reader.get_variable_to_shape_map())
    return {name: reader.get_tensor(name) for name in names}


def export(tensors, out_path):
    """Filter + validate against the loader's expected key set, write npz.

    `tensors` is any {checkpoint_variable_name: ndarray} mapping, so this
    half is testable (and reusable) without TensorFlow.
    """
    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from l3embedding_tpu.models.vggish import _SLIM_NAME_MAP

    expected = set(_SLIM_NAME_MAP)
    found = {k: np.asarray(v) for k, v in tensors.items() if k in expected}
    missing = expected - set(found)
    if missing:
        raise SystemExit(
            f"checkpoint is missing {len(missing)} expected variables, "
            f"e.g. {sorted(missing)[:3]} — not a VGGish checkpoint?"
        )
    np.savez(out_path, **found)
    return sorted(found)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="vggish_model.ckpt (TF checkpoint prefix)")
    p.add_argument("out", help="output .npz path")
    args = p.parse_args()

    try:
        tensors = read_with_tf(args.ckpt)
    except ImportError:
        raise SystemExit(
            "TensorFlow is required to read the TF checkpoint. Run this "
            "script once wherever TF is installed (pip install tensorflow "
            "— any version with tf.train.load_checkpoint), then copy the "
            ".npz here. The training/extraction stack itself never needs "
            "TF."
        )
    keys = export(tensors, args.out)
    print(f"wrote {args.out} with {len(keys)} arrays")


if __name__ == "__main__":
    main()
