"""Audio-Visual Correspondence model: merged vision+audio towers + head.

Parity with reference l3embedding/model.py:7-35: concat(vision, audio) →
Dense(layer_size, relu) → Dense(2). The reference applies softmax in the
graph and trains with categorical crossentropy; we return logits (the
numerically stable TPU idiom) — softmax_cross_entropy(logits) is exactly
CE(softmax(logits)), so all observable loss/accuracy numbers match,
including the reference's noted "twice the loss" behavior for two-class
CE (reference l3embedding/train.py:269).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .towers import KERNEL_INIT


class AVCModel(nn.Module):
    """vision_model + audio_model + correspondence head.

    Submodule names ('vision_model', 'audio_model') mirror the reference's
    subnetwork names so checkpoints and embedding extraction address the
    same structure (reference model.py:168-174).
    """

    vision_model: nn.Module
    audio_model: nn.Module
    layer_size: int = 128
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, video, audio, train: bool = False):
        # Keras concat order: vision output first (reference model.py:25).
        y_v = self.vision_model(video, train=train)
        y_a = self.audio_model(audio, train=train)
        y = jnp.concatenate([y_v, y_a], axis=-1)
        y = nn.Dense(
            self.layer_size, kernel_init=KERNEL_INIT, name="merge_dense",
            dtype=self.dtype,
        )(y)
        y = nn.relu(y)
        logits = nn.Dense(
            2, kernel_init=KERNEL_INIT, name="output_dense", dtype=self.dtype
        )(y)
        # Logits in f32 so the loss/softmax is always full precision.
        return logits.astype(jnp.float32)


def predict_proba(model, variables, video, audio):
    """Correspondence probabilities — the reference's model.predict()
    surface (softmax over the 2-way head)."""
    logits = model.apply(variables, video, audio, train=False)
    return nn.softmax(logits)
