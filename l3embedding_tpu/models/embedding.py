"""Embedding extraction from trained AVC models.

The reference builds a truncated Keras model ending at the raw
'audio_embedding_layer' conv output, then applies a pooling from a
per-model table (reference l3embedding/audio_model.py:445-487,
vision_model.py:198-218). Here truncation is just a different pure
function over the same parameter pytree: the towers `sow` the embedding
conv output, and the extractor pools + flattens it under one jit.

Embedding dims (parity with reference + notebooks/pimodel.ipynb):
    audio 'original' → 6144, audio 'short' → 512, vision → 8192.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .registry import MODELS, build_model

# Reference audio_model.py:461-478.
AUDIO_POOLINGS = {name: spec.audio_embedding_pooling for name, spec in MODELS.items()}
# Reference vision_model.py:212.
VISION_POOLING = (7, 7)


def _pool_flatten(feat: jnp.ndarray, pool: tuple[int, int]) -> jnp.ndarray:
    # Reference uses MaxPooling2D(padding='same') for embedding pooling
    # (audio_model.py:483, vision_model.py:213).
    y = nn.max_pool(feat, window_shape=tuple(pool), strides=tuple(pool), padding="SAME")
    return y.reshape((y.shape[0], -1))


def audio_embedding_fn(model_type: str, pooling_type: str = "original",
                       compute_dtype=jnp.float32, db_batch_global=False):
    """Returns fn(variables, audio_batch) → (B, dim) embeddings.

    `variables` is the full AVC model variables dict; the audio subtree is
    sliced out so the same checkpoint serves training and extraction.
    compute_dtype=bfloat16 selects the fast tower (bf16 MXU frontend);
    float32 is the parity configuration. db_batch_global reproduces the
    kapre<=0.1.x batch-global dB quirk (see registry.ModelSpec.module).
    """
    spec = build_model(model_type)
    pool = spec.audio_embedding_pooling[pooling_type]
    tower = spec.module(
        compute_dtype=compute_dtype, db_batch_global=db_batch_global
    ).audio_model

    def fn(variables, audio):
        sub = {
            "params": variables["params"]["audio_model"],
            "batch_stats": variables["batch_stats"]["audio_model"],
        }
        _, state = tower.apply(sub, audio, train=False, mutable=["intermediates"])
        feat = state["intermediates"]["embedding_features"][0]
        return _pool_flatten(feat, pool)

    return fn


def vision_embedding_fn(model_type: str):
    """Returns fn(variables, video_batch) → (B, 8192) embeddings."""
    spec = build_model(model_type)
    tower = spec.module().vision_model

    def fn(variables, video):
        sub = {
            "params": variables["params"]["vision_model"],
            "batch_stats": variables["batch_stats"]["vision_model"],
        }
        _, state = tower.apply(sub, video, train=False, mutable=["intermediates"])
        feat = state["intermediates"]["embedding_features"][0]
        return _pool_flatten(feat, VISION_POOLING)

    return fn
