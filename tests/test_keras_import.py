"""Keras .h5 weight-import tests against a synthesized reference-layout
weight file (Keras 2.x save_weights format written with h5py)."""

import h5py
import numpy as np
import pytest

from l3embedding_tpu.compat.keras_import import import_avc_weights


def _bn_arrays(rng, ch):
    return [rng.randn(ch).astype(np.float32) for _ in range(2)] + [
        rng.randn(ch).astype(np.float32),
        np.abs(rng.randn(ch)).astype(np.float32),
    ]


def _conv_arrays(rng, cin, cout, k=3):
    return [
        rng.randn(k, k, cin, cout).astype(np.float32),
        rng.randn(cout).astype(np.float32),
    ]


def synthesize_keras_h5(path, rng):
    """Keras-format weights for cnn_L3_melspec2: nested vision_model /
    audio_model groups + merge dense layers, kapre layer included (and
    expected to be skipped by the importer)."""
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

    vision_layers = [("batch_normalization_1", _bn_arrays(rng, 3))]
    bn_idx = 2
    for i, (ci, co) in enumerate(chans):
        conv_name = (
            "vision_embedding_layer" if i == len(chans) - 1 else f"conv2d_{i+1}"
        )
        vision_layers.append((conv_name, _conv_arrays(rng, ci, co)))
        vision_layers.append((f"batch_normalization_{bn_idx}", _bn_arrays(rng, co)))
        bn_idx += 1

    audio_layers = [
        ("melspectrogram_1", [rng.randn(2048, 1, 1, 1025).astype(np.float32),
                              rng.randn(2048, 1, 1, 1025).astype(np.float32),
                              rng.randn(1025, 256).astype(np.float32)]),
        (f"batch_normalization_{bn_idx}", _bn_arrays(rng, 1)),
    ]
    bn_idx += 1
    for i, (ci, co) in enumerate(a_chans):
        conv_name = (
            "audio_embedding_layer" if i == len(a_chans) - 1
            else f"conv2d_{i+9}"
        )
        audio_layers.append((conv_name, _conv_arrays(rng, ci, co)))
        audio_layers.append((f"batch_normalization_{bn_idx}", _bn_arrays(rng, co)))
        bn_idx += 1

    dense_1 = _conv_arrays(rng, 0, 0)  # replaced below
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


def test_import_melspec2(tmp_path):
    rng = np.random.RandomState(7)
    path = str(tmp_path / "model_latest.h5")
    truth = synthesize_keras_h5(path, rng)

    variables = import_avc_weights(path, "cnn_L3_melspec2")
    params, stats = variables["params"], variables["batch_stats"]

    # Input BNs landed.
    np.testing.assert_array_equal(
        params["vision_model"]["BatchNorm_0"]["scale"], truth["vision"][0][1][0]
    )
    np.testing.assert_array_equal(
        stats["audio_model"]["BatchNorm_0"]["var"], truth["audio"][1][1][3]
    )
    # First vision conv.
    np.testing.assert_array_equal(
        params["vision_model"]["ConvBNRelu_0"]["Conv_0"]["kernel"],
        truth["vision"][1][1][0],
    )
    # Embedding convs landed under their names.
    np.testing.assert_array_equal(
        params["audio_model"]["audio_embedding_layer"]["kernel"],
        truth["audio"][-2][1][0],
    )
    np.testing.assert_array_equal(
        params["vision_model"]["vision_embedding_layer"]["bias"],
        truth["vision"][-2][1][1],
    )
    # Final audio BN moving stats.
    np.testing.assert_array_equal(
        stats["audio_model"]["BatchNorm_1"]["mean"], truth["audio"][-1][1][2]
    )
    # Merge head.
    np.testing.assert_array_equal(
        params["merge_dense"]["kernel"], truth["dense_1"][0]
    )
    np.testing.assert_array_equal(
        params["output_dense"]["bias"], truth["dense_2"][1]
    )


def test_import_shape_mismatch_raises(tmp_path):
    rng = np.random.RandomState(8)
    path = str(tmp_path / "bad.h5")
    synthesize_keras_h5(path, rng)
    with pytest.raises(ValueError):
        # melspec1 has different pooling/mel dims but same conv stack; the
        # wrong model type with incompatible head widths must fail loudly.
        import_avc_weights(path, "tiny_L3")


def test_import_multigpu_wrapped(tmp_path):
    """Multi-GPU-wrapped layout: the whole model nested one level deeper
    behind weightless slice/concat layers (reference model.py:76-77)."""
    rng = np.random.RandomState(9)
    inner_path = str(tmp_path / "inner.h5")
    truth = synthesize_keras_h5(inner_path, rng)

    wrapped_path = str(tmp_path / "wrapped.h5")
    with h5py.File(inner_path, "r") as src, h5py.File(wrapped_path, "w") as dst:
        dst.attrs["layer_names"] = [
            b"input_1", b"input_2", b"lambda_1", b"lambda_2",
            b"cnn_L3_melspec2", b"concatenate_2",
        ]
        for name in ("input_1", "input_2", "lambda_1", "lambda_2",
                     "concatenate_2"):
            g = dst.create_group(name)
            g.attrs["weight_names"] = []
        src.copy(src["/"], dst, name="cnn_L3_melspec2")
        # h5py copies root attrs too; ensure the nested group carries the
        # inner layer_names.
        dst["cnn_L3_melspec2"].attrs["layer_names"] = src.attrs["layer_names"]

    variables = import_avc_weights(wrapped_path, "cnn_L3_melspec2")
    np.testing.assert_array_equal(
        variables["params"]["merge_dense"]["kernel"], truth["dense_1"][0]
    )
    np.testing.assert_array_equal(
        variables["params"]["audio_model"]["audio_embedding_layer"]["kernel"],
        truth["audio"][-2][1][0],
    )


def test_import_misaligned_embedding_layer_raises(tmp_path):
    """The name anchor must reject an h5 whose layer sequence is shifted:
    a same-shaped generic conv arriving at the embedding-conv position
    (and the real embedding layer one slot later) previously imported
    silently — two swapped 512x512 convs pass every shape check."""
    rng = np.random.RandomState(11)
    path = str(tmp_path / "model_latest.h5")
    synthesize_keras_h5(path, rng)

    # Swap the last plain conv and the embedding conv in the vision
    # tower's weight_names order (arrays stay attached to their names, so
    # shapes still line up pairwise: both are (3,3,512,512)).
    with h5py.File(path, "r+") as f:
        g = f["vision_model"]
        wnames = [
            w.decode() if isinstance(w, bytes) else w
            for w in g.attrs["weight_names"]
        ]
        emb = [i for i, w in enumerate(wnames)
               if w.startswith("vision_embedding_layer/")]
        plain = [i for i, w in enumerate(wnames)
                 if w.startswith("conv2d_7/")]
        assert len(emb) == 2 and len(plain) == 2
        for a, b in zip(plain, emb):
            wnames[a], wnames[b] = wnames[b], wnames[a]
        g.attrs["weight_names"] = [w.encode() for w in wnames]

    with pytest.raises(ValueError, match="misaligned"):
        import_avc_weights(path, "cnn_L3_melspec2")
