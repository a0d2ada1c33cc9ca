"""Orbax checkpoint backend round-trip."""

import jax
import numpy as np
import pytest

from l3embedding_tpu.models import build_model
from l3embedding_tpu.training.state import create_train_state


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from l3embedding_tpu.training.orbax_io import (
        load_state_orbax,
        save_state_orbax,
    )

    spec = build_model("tiny_L3")
    model = spec.module()
    state = create_train_state(
        model, jax.random.PRNGKey(3), spec.video_input_shape,
        spec.audio_input_shape, 1e-4,
    )
    path = str(tmp_path / "snap")
    save_state_orbax(path, state)

    # Restore into a differently-initialized template.
    other = create_train_state(
        model, jax.random.PRNGKey(99), spec.video_input_shape,
        spec.audio_input_shape, 1e-4,
    )
    restored = load_state_orbax(path, other)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
