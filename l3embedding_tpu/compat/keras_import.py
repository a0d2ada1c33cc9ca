"""Import reference Keras `.h5` weight files into our parameter pytrees.

The reference checkpoints AVC models as Keras weights-only HDF5
(reference l3embedding/train.py:316-355); embeddings-parity checks
(BASELINE: cosine >= 0.999) require loading those exact weights into the
flax towers. This reads the Keras 2.x `save_weights` layout directly
with h5py (no TensorFlow/Keras dependency):

    /<layer_name>/          group per top-level layer
        attrs['weight_names'] — ordered names like
            b'vision_model/conv2d_1/kernel:0'
        <weight_name>       dataset per weight

and maps by *sequence*, which is well-defined because both sides build
layers in the same construction order (audio_model.py / vision_model.py
vs models/towers.py): per tower, optional input-BN, then
(conv, bn) x 8, with kapre spectrogram layers (non-trainable DFT/mel
kernels) skipped — our DSP basis is computed, not stored. Conv kernels
are (kh, kw, cin, cout) in both frameworks; BN weight order in Keras h5
is gamma, beta, moving_mean, moving_variance.

Multi-GPU-wrapped reference checkpoints (weights nested one level deeper
under the replicated model, reference model.py:76-77) are detected and
unwrapped automatically — the replacement for `convert_num_gpus`.
"""

from __future__ import annotations

import logging
import re

import h5py
import numpy as np

from ..models import build_model

LOGGER = logging.getLogger("l3embedding_tpu.compat")

_SKIP_LAYER = re.compile(r"(spectrogram|melspectrogram)", re.IGNORECASE)


def _read_keras_h5(path):
    """→ list of (layer_name, [np arrays in weight_names order])."""
    layers = []
    with h5py.File(path, "r") as f:
        root = f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in root.attrs["layer_names"]]
        # Multi-GPU wrapper (reference training_utils.py:21-170 saves the
        # wrapped model): the real model appears as one sub-group carrying
        # its own 'layer_names' (the tf.slice lambdas and concat layers
        # around it are weightless). Descend into it.
        if not any(n in ("vision_model", "audio_model") for n in layer_names):
            for n in layer_names:
                if (
                    n in root
                    and isinstance(root[n], h5py.Group)
                    and "layer_names" in root[n].attrs
                ):
                    root = root[n]
                    layer_names = [
                        m.decode() if isinstance(m, bytes) else m
                        for m in root.attrs["layer_names"]
                    ]
                    break
        for name in layer_names:
            grp = root[name]
            wnames = [w.decode() if isinstance(w, bytes) else w
                      for w in grp.attrs.get("weight_names", [])]
            arrays = [np.asarray(grp[w]) for w in wnames]
            layers.append((name, wnames, arrays))
    return layers


def _classify(arrays):
    """'conv'|'dense'|'bn'|'empty' from the weight-array signature."""
    if not arrays:
        return "empty"
    if len(arrays) == 4 and all(a.ndim == 1 for a in arrays):
        return "bn"
    if len(arrays) == 2 and arrays[0].ndim == 4:
        return "conv"
    if len(arrays) == 2 and arrays[0].ndim == 2:
        return "dense"
    return "other"


def _tower_targets(tower_params, tower_stats, has_input_bn):
    """Ordered (kind, assign_fn) targets matching Keras layer order."""
    targets = []

    def bn(params_bn, stats_bn):
        def assign(arrays):
            gamma, beta, mean, var = arrays
            params_bn["scale"] = gamma
            params_bn["bias"] = beta
            stats_bn["mean"] = mean
            stats_bn["var"] = var

        return ("bn", assign)

    def conv(params_conv):
        def assign(arrays):
            params_conv["kernel"] = arrays[0]
            params_conv["bias"] = arrays[1]

        return ("conv", assign)

    if has_input_bn:
        targets.append(bn(tower_params["BatchNorm_0"],
                          tower_stats["BatchNorm_0"]))

    n_blocks = sorted(
        int(k.split("_")[1]) for k in tower_params if k.startswith("ConvBNRelu")
    )
    for i in n_blocks:
        sub_p = tower_params[f"ConvBNRelu_{i}"]
        sub_s = tower_stats[f"ConvBNRelu_{i}"]
        targets.append(conv(sub_p["Conv_0"]))
        targets.append(bn(sub_p["BatchNorm_0"], sub_s["BatchNorm_0"]))

    embed_name = next(
        (k for k in tower_params if k.endswith("_embedding_layer")), None
    )
    if embed_name:
        # Name anchor: the reference names this conv explicitly
        # ('audio_embedding_layer'/'vision_embedding_layer', reference
        # audio_model.py:57, vision_model.py:56), so sequence mapping is
        # cross-checked against the Keras layer name at this position.
        kind, assign = conv(tower_params[embed_name])
        targets.append((kind, assign, "embedding_layer"))
        final_bn = "BatchNorm_1" if has_input_bn else "BatchNorm_0"
        targets.append(bn(tower_params[final_bn], tower_stats[final_bn]))
    return targets


def import_avc_weights(h5_path: str, model_type: str):
    """Load a reference AVC weights .h5 → (variables dict) for our model.

    Returns {'params': ..., 'batch_stats': ...} with every tensor
    replaced by the Keras values (shape-checked)."""
    import jax

    spec = build_model(model_type)
    model = spec.module()
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1,) + tuple(spec.video_input_shape), np.float32),
        np.zeros((1,) + tuple(spec.audio_input_shape), np.float32),
        train=False,
    )
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    layers = _read_keras_h5(h5_path)

    # Split the flat layer list into the towers + merge head. Keras names
    # nested models 'vision_model'/'audio_model' (reference
    # vision_model.py:100, audio_model.py:113).
    head_dense = []
    for name, wnames, arrays in layers:
        kind = _classify(arrays)
        if kind == "empty":
            continue
        if name in ("vision_model", "audio_model"):
            # Nested model: its arrays are all inner weights in creation
            # order; regroup them by inner-layer prefix.
            groups = {}
            order = []
            for wname, arr in zip(wnames, arrays):
                inner = "/".join(wname.split("/")[:-1])
                if inner not in groups:
                    groups[inner] = []
                    order.append(inner)
                groups[inner].append(arr)

            tower_key = name
            has_input_bn = (
                tower_key == "vision_model"
                and getattr(model.vision_model, "input_bn", False)
            ) or (
                tower_key == "audio_model"
                and getattr(model.audio_model, "frontend_kind", "linear")
                in ("linear_db", "mel")
            )
            targets = _tower_targets(
                params[tower_key], stats[tower_key], has_input_bn
            )
            ti = 0
            for inner in order:
                arrays_i = groups[inner]
                kind_i = _classify(arrays_i)
                if kind_i in ("other", "empty") or _SKIP_LAYER.search(inner):
                    continue
                if ti >= len(targets):
                    raise ValueError(
                        f"more Keras layers than targets in {tower_key} "
                        f"at {inner}"
                    )
                want_kind, assign, *anchor = targets[ti]
                if want_kind != kind_i:
                    raise ValueError(
                        f"{tower_key}: expected {want_kind} at position "
                        f"{ti}, got {kind_i} ({inner})"
                    )
                # Name-anchored cross-check: the embedding conv must line
                # up with the Keras layer actually named *_embedding_layer
                # (guards against same-shaped layers slipping a position).
                if anchor and anchor[0] not in inner:
                    raise ValueError(
                        f"{tower_key}: expected a layer named like "
                        f"'*{anchor[0]}*' at position {ti}, got {inner!r} "
                        "— sequence mapping is misaligned"
                    )
                if not anchor and "embedding_layer" in inner:
                    raise ValueError(
                        f"{tower_key}: Keras layer {inner!r} (the embedding "
                        f"conv) arrived at position {ti}, which maps to a "
                        "different target — sequence mapping is misaligned"
                    )
                assign(arrays_i)
                ti += 1
            if ti != len(targets):
                raise ValueError(
                    f"{tower_key}: assigned {ti}/{len(targets)} layers"
                )
        elif kind == "dense":
            head_dense.append(arrays)
        elif _SKIP_LAYER.search(name):
            continue

    if len(head_dense) != 2:
        raise ValueError(
            f"expected 2 dense head layers, found {len(head_dense)}"
        )
    params["merge_dense"]["kernel"] = head_dense[0][0]
    params["merge_dense"]["bias"] = head_dense[0][1]
    params["output_dense"]["kernel"] = head_dense[1][0]
    params["output_dense"]["bias"] = head_dense[1][1]

    # Shape check everything against the template.
    import jax

    def check(a, b):
        if a.shape != np.asarray(b).shape:
            raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
        return np.asarray(b, dtype=np.float32)

    params = jax.tree.map(check, jax.tree.map(np.asarray, variables["params"]),
                          params)
    stats = jax.tree.map(check,
                         jax.tree.map(np.asarray, variables["batch_stats"]),
                         stats)
    return {"params": params, "batch_stats": stats}
