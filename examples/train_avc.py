#!/usr/bin/env python
"""Example: programmatic AVC training (what `03_train_embedding.py` does,
as a library call) on a synthetic corpus — runs end-to-end on CPU or TPU.

    python examples/train_avc.py /tmp/avc_demo            # tiny_L3, CPU-ok
    python examples/train_avc.py /tmp/avc_demo \
        -mt cnn_L3_melspec2 --compute-dtype bfloat16      # the real model

Generates a small learnable corpus (a tone↔brightness correspondence:
matched pairs couple audio frequency to frame brightness), trains for a
few epochs through the production loop (async h5 pipeline → sharded
jitted step → checkpoints), and prints where the run artifacts landed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py  # noqa: E402
import numpy as np  # noqa: E402


def make_corpus(path, n_blobs=4, blob_size=32, seed=0):
    """Synthetic matched/mismatched AVC pairs with learnable structure."""
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    t = np.arange(48000) / 48000.0
    for b in range(n_blobs):
        video = np.zeros((blob_size, 224, 224, 3), np.uint8)
        audio = np.zeros((blob_size, 1, 48000), np.int16)
        label = np.zeros((blob_size, 2), np.float32)
        for i in range(blob_size):
            match = rng.rand() < 0.5
            bright = rng.rand() < 0.5
            video[i] = 200 if bright else 40
            freq = 880.0 if (bright == match) else 220.0
            audio[i, 0] = (np.sin(2 * np.pi * freq * t) * 12000).astype(
                np.int16
            )
            label[i] = [1.0, 0.0] if match else [0.0, 1.0]
        with h5py.File(os.path.join(path, f"blob_{b:03d}.h5"), "w") as f:
            f.create_dataset("video", data=video)
            f.create_dataset("audio", data=audio)
            f.create_dataset("label", data=label)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workdir", help="directory for the corpus + run output")
    p.add_argument("-mt", "--model-type", default="tiny_L3")
    p.add_argument("-e", "--epochs", type=int, default=3)
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    train_dir = os.path.join(args.workdir, "train_h5")
    valid_dir = os.path.join(args.workdir, "valid_h5")
    make_corpus(train_dir, seed=0)
    make_corpus(valid_dir, n_blobs=1, seed=1)

    from l3embedding_tpu.training.loop import train

    model_dir, history = train(
        train_dir,
        valid_dir,
        os.path.join(args.workdir, "out"),
        num_epochs=args.epochs,
        train_epoch_size=8,
        validation_epoch_size=2,
        train_batch_size=16,
        validation_batch_size=16,
        model_type=args.model_type,
        compute_dtype=args.compute_dtype,
        learning_rate=1e-4,
        disable_logging=True,
    )
    print(f"run dir: {model_dir}")
    print("val_acc per epoch:", [round(a, 3) for a in history["val_acc"]])
    print("artifacts:", sorted(os.listdir(model_dir)))


if __name__ == "__main__":
    main()
