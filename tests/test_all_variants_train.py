"""One real train step through every full AVC model variant (batch 2,
CPU) — covers all three front-end kinds in training mode, BN mutation,
and gradient flow end to end."""

import jax
import numpy as np
import pytest

from l3embedding_tpu.models import build_model
from l3embedding_tpu.training.state import create_train_state
from l3embedding_tpu.training.steps import make_train_step


@pytest.mark.parametrize(
    "model_type",
    ["cnn_L3_orig", "cnn_L3_kapredbinputbn", "cnn_L3_melspec1",
     "cnn_L3_melspec2"],
)
def test_one_train_step(model_type):
    spec = build_model(model_type)
    model = spec.module()
    state = create_train_state(
        model, jax.random.PRNGKey(0), spec.video_input_shape,
        spec.audio_input_shape, learning_rate=1e-4,
    )
    rng = np.random.RandomState(0)
    batch = {
        "video": rng.randint(0, 256, size=(2, 224, 224, 3)).astype(np.uint8),
        "audio": (rng.randn(2, 1, 48000) * 3000).astype(np.int16),
        "label": np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32),
    }
    step = make_train_step(model, donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    assert int(new_state.step) == 1
    # Parameters moved.
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
