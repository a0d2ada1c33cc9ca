"""Keras .h5 weight-import tests against a synthesized reference-layout
weight file (Keras 2.x save_weights format written with h5py)."""

import h5py
import numpy as np
import pytest

from l3embedding_tpu.compat.keras_import import import_avc_weights
from l3embedding_tpu.compat.keras_synth import (
    bn_arrays as _bn_arrays,
    conv_arrays as _conv_arrays,
    synthesize_keras_h5,
)


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


# ---- Export (the reverse-migration path, compat/keras_export.py) ----


def _flat_equal(tree_a, tree_b):
    import jax

    leaves_a, treedef_a = jax.tree.flatten(tree_a)
    leaves_b, treedef_b = jax.tree.flatten(tree_b)
    assert treedef_a == treedef_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("model_type", ["cnn_L3_melspec2", "cnn_L3_orig"])
def test_export_import_roundtrip(tmp_path, model_type):
    """export_avc_weights must be the exact inverse of import_avc_weights
    (covers both front-end layouts: mel + input-BN vs linear, no BN)."""
    from l3embedding_tpu.compat.keras_export import export_avc_weights

    rng = np.random.RandomState(3)
    path = str(tmp_path / "synth.h5")
    if model_type == "cnn_L3_melspec2":
        synthesize_keras_h5(path, rng)
        variables = import_avc_weights(path, model_type)
    else:
        # No synth generator for the orig layout: start from a fresh
        # model init instead (round-trip still proves the contract).
        import jax
        import numpy as _np

        from l3embedding_tpu.models import build_model

        spec = build_model(model_type)
        model = spec.module()
        variables = jax.tree.map(
            np.asarray,
            model.init(
                jax.random.PRNGKey(5),
                _np.zeros((1,) + tuple(spec.video_input_shape), _np.float32),
                _np.zeros((1,) + tuple(spec.audio_input_shape), _np.float32),
                train=False,
            ),
        )
        variables = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }

    out = str(tmp_path / "exported.h5")
    export_avc_weights(variables, model_type, out)
    back = import_avc_weights(out, model_type)
    _flat_equal(variables["params"], back["params"])
    _flat_equal(variables["batch_stats"], back["batch_stats"])


def test_export_structure_matches_reference_layout(tmp_path):
    """The exported file must byte-match the synthesized reference layout:
    same top-level layer_names, same per-group weight_names sequences,
    same array values for every model weight (kapre kernels are
    regenerated from dsp_ref, so compare shapes there)."""
    from l3embedding_tpu.compat.keras_export import export_avc_weights

    rng = np.random.RandomState(9)
    ref_path = str(tmp_path / "ref.h5")
    synthesize_keras_h5(ref_path, rng)
    variables = import_avc_weights(ref_path, "cnn_L3_melspec2")

    out = str(tmp_path / "out.h5")
    export_avc_weights(variables, "cnn_L3_melspec2", out)

    with h5py.File(ref_path, "r") as fr, h5py.File(out, "r") as fo:
        names_r = [n.decode() if isinstance(n, bytes) else n
                   for n in fr.attrs["layer_names"]]
        names_o = [n.decode() if isinstance(n, bytes) else n
                   for n in fo.attrs["layer_names"]]
        assert names_r == names_o
        for lname in names_r:
            wn_r = [w.decode() if isinstance(w, bytes) else w
                    for w in fr[lname].attrs["weight_names"]]
            wn_o = [w.decode() if isinstance(w, bytes) else w
                    for w in fo[lname].attrs["weight_names"]]
            assert wn_r == wn_o, lname
            for w in wn_r:
                a, b = np.asarray(fr[lname][w]), np.asarray(fo[lname][w])
                assert a.shape == b.shape, (lname, w)
                if "kernels:0" not in w and "freq2mel" not in w:
                    np.testing.assert_array_equal(a, b, err_msg=f"{lname}/{w}")


def test_export_kapre_kernels_are_the_true_basis(tmp_path):
    """The regenerated kapre weights must be the actual windowed-DFT /
    mel matrices (a real 2018 Keras graph loading this file computes its
    spectrograms with them), not placeholders."""
    import jax

    from l3embedding_tpu.compat.keras_export import export_avc_weights
    from l3embedding_tpu.models import build_model
    from l3embedding_tpu.ops import dsp_ref

    spec = build_model("cnn_L3_melspec2")
    model = spec.module()
    variables = jax.tree.map(
        np.asarray,
        model.init(
            jax.random.PRNGKey(1),
            np.zeros((1, 224, 224, 3), np.float32),
            np.zeros((1, 1, 48000), np.float32),
            train=False,
        ),
    )
    out = str(tmp_path / "out.h5")
    export_avc_weights(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        "cnn_L3_melspec2",
        out,
    )
    real, imag = dsp_ref.stft_basis(2048)
    mel = dsp_ref.mel_filterbank(48000, 2048, 256, htk=True).T
    with h5py.File(out, "r") as f:
        g = f["audio_model"]
        np.testing.assert_allclose(
            np.asarray(g["melspectrogram_1/real_kernels:0"]).reshape(2048, 1025),
            real, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g["melspectrogram_1/imag_kernels:0"]).reshape(2048, 1025),
            imag, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g["melspectrogram_1/freq2mel:0"]), mel, atol=1e-6
        )


def test_export_rejects_tiny(tmp_path):
    """tiny_L3 has no 2018 Keras checkpoint layout; the exporter must say
    so instead of writing a structurally wrong file."""
    from l3embedding_tpu.compat.keras_export import export_avc_weights

    with pytest.raises(ValueError, match="tiny_L3"):
        export_avc_weights(
            {"params": {"audio_model": {"Conv_0": {}}},
             "batch_stats": {"audio_model": {}}},
            "tiny_L3",
            str(tmp_path / "x.h5"),
        )
