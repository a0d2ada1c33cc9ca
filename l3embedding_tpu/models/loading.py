"""Model/embedding loading — the reference's `load_model` /
`load_embedding` surface (reference l3embedding/model.py:85-181).

`src_num_gpus` / `tgt_num_gpus` are accepted for signature compatibility
and ignored: checkpoints are topology-independent pytrees, and Keras
multi-GPU-wrapped `.h5` files are unwrapped automatically by the compat
importer.
"""

from __future__ import annotations

import jax
import numpy as np

from ..training import checkpoints
from .embedding import audio_embedding_fn, vision_embedding_fn
from .registry import build_model


def _init_variables(spec, model):
    return model.init(
        jax.random.PRNGKey(0),
        np.zeros((1,) + tuple(spec.video_input_shape), np.float32),
        np.zeros((1,) + tuple(spec.audio_input_shape), np.float32),
        train=False,
    )


def load_model(weights_path, model_type, src_num_gpus=0, tgt_num_gpus=None,
               return_io=False):
    """→ (model, variables). Accepts our `.ckpt` files or reference Keras
    `.h5` weight files (routed through compat.keras_import)."""
    spec = build_model(model_type)
    model = spec.module()
    if weights_path and str(weights_path).endswith(".h5"):
        from ..compat.keras_import import import_avc_weights

        variables = import_avc_weights(weights_path, model_type)
    else:
        variables = _init_variables(spec, model)
        if weights_path:
            variables = checkpoints.load_variables(weights_path, variables)
    return model, variables


def load_embedding(weights_path, model_type, embedding_type, pooling_type,
                   src_num_gpus=0, tgt_num_gpus=None, return_io=False,
                   db_batch_global=False):
    """→ callable(audio_or_video_batch) -> embeddings, mirroring the
    reference's truncated-model semantics (model.py:131-181).
    db_batch_global reproduces the kapre<=0.1.x batch-global dB quirk for
    checkpoints trained under it (registry.ModelSpec.module)."""
    _, variables = load_model(weights_path, model_type)
    if embedding_type == "audio":
        fn = jax.jit(
            audio_embedding_fn(
                model_type, pooling_type, db_batch_global=db_batch_global
            )
        )
    elif embedding_type == "vision":
        fn = jax.jit(vision_embedding_fn(model_type))
    else:
        raise ValueError(f'Invalid embedding type: "{embedding_type}"')
    variables = jax.device_put(variables)

    def embed(batch):
        return fn(variables, batch)

    embed.variables = variables
    embed.model_type = model_type
    return embed
