"""Synthesize a reference-layout Keras `.h5` weight file.

Writes the exact group/attribute layout Keras 2.x `save_weights`
produced for the 2018 AVC checkpoints (nested vision_model/audio_model
groups, kapre mel layer included, merge dense head — reference
l3embedding/model.py:85-128's load surface): the real 2018 files are
unobtainable in this environment, so import-path tests and
`bench.py --parity` exercise `compat.keras_import` against files built
here with known random weights instead.
"""

from __future__ import annotations

import h5py
import numpy as np


def bn_arrays(rng, ch):
    """[gamma, beta, moving_mean, moving_variance] for one BN layer."""
    return [rng.randn(ch).astype(np.float32) for _ in range(2)] + [
        rng.randn(ch).astype(np.float32),
        np.abs(rng.randn(ch)).astype(np.float32),
    ]


def conv_arrays(rng, cin, cout, k=3):
    return [
        rng.randn(k, k, cin, cout).astype(np.float32),
        rng.randn(cout).astype(np.float32),
    ]


def synthesize_keras_h5(path, rng):
    """Keras-format weights for cnn_L3_melspec2: nested vision_model /
    audio_model groups + merge dense layers, kapre layer included (and
    expected to be skipped by the importer). Returns the ground-truth
    arrays keyed by tower for assertions."""
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 512), (512, 512)]
    a_chans = [(1, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 512), (512, 512)]

    def tower(inner_layers):
        """inner_layers: list of (name, arrays)."""
        wnames, arrays = [], []
        for name, arrs in inner_layers:
            suffixes = {
                2: ["kernel:0", "bias:0"],
                4: ["gamma:0", "beta:0", "moving_mean:0",
                    "moving_variance:0"],
                3: ["real_kernels:0", "imag_kernels:0", "freq2mel:0"],
            }[len(arrs)]
            for sfx, arr in zip(suffixes, arrs):
                wnames.append(f"{name}/{sfx}")
                arrays.append(arr)
        return wnames, arrays

    vision_layers = [("batch_normalization_1", bn_arrays(rng, 3))]
    bn_idx = 2
    for i, (ci, co) in enumerate(chans):
        conv_name = (
            "vision_embedding_layer" if i == len(chans) - 1 else f"conv2d_{i+1}"
        )
        vision_layers.append((conv_name, conv_arrays(rng, ci, co)))
        vision_layers.append((f"batch_normalization_{bn_idx}", bn_arrays(rng, co)))
        bn_idx += 1

    audio_layers = [
        ("melspectrogram_1", [rng.randn(2048, 1, 1, 1025).astype(np.float32),
                              rng.randn(2048, 1, 1, 1025).astype(np.float32),
                              rng.randn(1025, 256).astype(np.float32)]),
        (f"batch_normalization_{bn_idx}", bn_arrays(rng, 1)),
    ]
    bn_idx += 1
    for i, (ci, co) in enumerate(a_chans):
        conv_name = (
            "audio_embedding_layer" if i == len(a_chans) - 1
            else f"conv2d_{i+9}"
        )
        audio_layers.append((conv_name, conv_arrays(rng, ci, co)))
        audio_layers.append((f"batch_normalization_{bn_idx}", bn_arrays(rng, co)))
        bn_idx += 1

    dense_1 = [rng.randn(1024, 128).astype(np.float32),
               rng.randn(128).astype(np.float32)]
    dense_2 = [rng.randn(128, 2).astype(np.float32),
               rng.randn(2).astype(np.float32)]

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [
            b"input_1", b"input_2", b"vision_model", b"audio_model",
            b"concatenate_1", b"dense_1", b"dense_2",
        ]
        for lname in ("input_1", "input_2", "concatenate_1"):
            g = f.create_group(lname)
            g.attrs["weight_names"] = []
        for lname, layers in (("vision_model", vision_layers),
                              ("audio_model", audio_layers)):
            g = f.create_group(lname)
            wnames, arrays = tower(layers)
            g.attrs["weight_names"] = [w.encode() for w in wnames]
            for w, a in zip(wnames, arrays):
                g.create_dataset(w, data=a)
        for lname, arrs in (("dense_1", dense_1), ("dense_2", dense_2)):
            g = f.create_group(lname)
            names = [f"{lname}/kernel:0", f"{lname}/bias:0"]
            g.attrs["weight_names"] = [n.encode() for n in names]
            for n, a in zip(names, arrs):
                g.create_dataset(n, data=a)

    return {
        "vision": vision_layers,
        "audio": audio_layers,
        "dense_1": dense_1,
        "dense_2": dense_2,
    }
