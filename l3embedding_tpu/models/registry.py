"""Model registry: the 5 AVC model types of the reference
(reference l3embedding/model.py:307-313), as flax module factories.

`build_model(model_type)` returns a ModelSpec carrying the module plus
the static metadata each pipeline stage needs (input shapes, embedding
pooling table). There is no `num_gpus` anywhere: data parallelism is a
property of how the train step is sharded over the mesh (see
l3embedding_tpu/parallel), not of the model graph — this is what makes
the reference's `multi_gpu_model` / `convert_num_gpus` machinery
(reference model.py:38-82, training_utils.py:21-170) obsolete by
construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .avc import AVCModel
from .towers import (
    L3AudioTower,
    L3VisionTower,
    TinyL3AudioTower,
    TinyL3VisionTower,
)

AUDIO_INPUT_SHAPE = (1, 48000)  # (channels, samples) per reference convention
VIDEO_INPUT_SHAPE = (224, 224, 3)


@dataclass(frozen=True)
class ModelSpec:
    """A registered AVC model type and its static metadata."""

    name: str
    make: Callable[[], nn.Module]
    audio_input_shape: tuple = AUDIO_INPUT_SHAPE
    video_input_shape: tuple = VIDEO_INPUT_SHAPE
    # MaxPool sizes applied to the raw embedding-conv output per pooling
    # type (reference audio_model.py:461-478); embedding dims follow.
    audio_embedding_pooling: dict = field(default_factory=dict)

    def module(
        self,
        compute_dtype=jnp.float32,
        fe_precision=None,
        db_batch_global=False,
    ) -> nn.Module:
        """Instantiate the flax module.

        compute_dtype: float32 (parity default) or bfloat16 (the TPU
        mixed-precision training path; params stay float32).
        fe_precision: matmul precision for the DSP front-end; defaults
        to HIGHEST for float32 (bit-accurate extraction) and DEFAULT
        (bf16 MXU passes) for bfloat16.
        db_batch_global: reproduce kapre<=0.1.x's batch-global dB max
        reference in the audio front-end (reference
        audio_model.py:138-151) — required for bit-faithful reproduction
        of checkpoints trained under that quirk.
        """
        if fe_precision is None:
            fe_precision = (
                jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
        return self.make(compute_dtype, fe_precision, db_batch_global)


def _avc(vision, audio, layer_size=128, dtype=jnp.float32):
    return AVCModel(
        vision_model=vision, audio_model=audio, layer_size=layer_size, dtype=dtype
    )


_FULL_POOL_257 = {"original": (8, 8), "short": (32, 24)}
_FULL_POOL_128 = {"original": (4, 8), "short": (16, 24)}


MODELS: dict[str, ModelSpec] = {
    "cnn_L3_orig": ModelSpec(
        name="cnn_L3_orig",
        make=lambda dt, prec, dbg: _avc(
            L3VisionTower(input_bn=False, dtype=dt),
            L3AudioTower(
                frontend_kind="linear", final_pool=(32, 24), dtype=dt,
                precision=prec, db_batch_global=dbg,
            ),
            dtype=dt,
        ),
        audio_embedding_pooling=_FULL_POOL_257,
    ),
    "cnn_L3_kapredbinputbn": ModelSpec(
        name="cnn_L3_kapredbinputbn",
        make=lambda dt, prec, dbg: _avc(
            L3VisionTower(input_bn=True, dtype=dt),
            L3AudioTower(
                frontend_kind="linear_db",
                final_pool=(32, 24),
                dtype=dt,
                precision=prec,
                db_batch_global=dbg,
            ),
            dtype=dt,
        ),
        audio_embedding_pooling=_FULL_POOL_257,
    ),
    "cnn_L3_melspec1": ModelSpec(
        name="cnn_L3_melspec1",
        make=lambda dt, prec, dbg: _avc(
            L3VisionTower(input_bn=True, dtype=dt),
            L3AudioTower(
                frontend_kind="mel",
                n_mels=128,
                final_pool=(16, 24),
                dtype=dt,
                precision=prec,
                db_batch_global=dbg,
            ),
            dtype=dt,
        ),
        audio_embedding_pooling=_FULL_POOL_128,
    ),
    "cnn_L3_melspec2": ModelSpec(
        name="cnn_L3_melspec2",
        make=lambda dt, prec, dbg: _avc(
            L3VisionTower(input_bn=True, dtype=dt),
            L3AudioTower(
                frontend_kind="mel",
                n_mels=256,
                final_pool=(32, 24),
                dtype=dt,
                precision=prec,
                db_batch_global=dbg,
            ),
            dtype=dt,
        ),
        audio_embedding_pooling=_FULL_POOL_257,
    ),
    "tiny_L3": ModelSpec(
        name="tiny_L3",
        make=lambda dt, prec, dbg: _avc(
            TinyL3VisionTower(),
            TinyL3AudioTower(db_batch_global=dbg),
            layer_size=64,
        ),
        # Tiny embedding = the flattened final feature map itself.
        audio_embedding_pooling={"original": (1, 1), "short": (1, 1)},
    ),
}


def build_model(model_type: str) -> ModelSpec:
    if model_type not in MODELS:
        raise ValueError(
            f'Invalid model type: "{model_type}" (have: {sorted(MODELS)})'
        )
    return MODELS[model_type]
