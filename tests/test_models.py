"""Model zoo tests: shapes, parameter-count parity with the Keras
reference architectures, embedding dims, and BN statistics updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l3embedding_tpu.models import (
    MODELS,
    audio_embedding_fn,
    build_model,
    vision_embedding_fn,
)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def conv_params(cin, cout, k=3):
    return (k * k * cin + 1) * cout


def bn_params(ch):  # trainable scale+bias only (Keras gamma/beta)
    return 2 * ch


def expected_audio_tower_params(frontend_kind):
    chans = [(1, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 512), (512, 512)]
    total = sum(conv_params(ci, co) for ci, co in chans)
    total += sum(bn_params(co) for _, co in chans)
    if frontend_kind in ("linear_db", "mel"):
        total += bn_params(1)  # input BN on the 1-channel spectrogram
    return total


def expected_vision_tower_params(input_bn):
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 512), (512, 512)]
    total = sum(conv_params(ci, co) for ci, co in chans)
    total += sum(bn_params(co) for _, co in chans)
    if input_bn:
        total += bn_params(3)
    return total


def expected_head_params(layer_size=128):
    return (1024 + 1) * layer_size + (layer_size + 1) * 2


EXPECTED = {
    "cnn_L3_orig": expected_audio_tower_params("linear")
    + expected_vision_tower_params(False)
    + expected_head_params(),
    "cnn_L3_kapredbinputbn": expected_audio_tower_params("linear_db")
    + expected_vision_tower_params(True)
    + expected_head_params(),
    "cnn_L3_melspec1": expected_audio_tower_params("mel")
    + expected_vision_tower_params(True)
    + expected_head_params(),
    "cnn_L3_melspec2": expected_audio_tower_params("mel")
    + expected_vision_tower_params(True)
    + expected_head_params(),
}


@pytest.fixture(scope="module")
def tiny_inputs():
    rng = np.random.RandomState(0)
    video = rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1
    audio = (rng.rand(2, 1, 48000).astype(np.float32) * 2 - 1) * 0.5
    return jnp.asarray(video), jnp.asarray(audio)


@pytest.fixture(scope="module")
def tiny_variables(tiny_inputs):
    video, audio = tiny_inputs
    spec = build_model("tiny_L3")
    model = spec.module()
    return model, model.init(jax.random.PRNGKey(0), video, audio, train=False)


def test_registry_names():
    assert set(MODELS) == {
        "cnn_L3_orig",
        "tiny_L3",
        "cnn_L3_kapredbinputbn",
        "cnn_L3_melspec1",
        "cnn_L3_melspec2",
    }


def test_tiny_forward_and_bn_update(tiny_inputs, tiny_variables):
    video, audio = tiny_inputs
    model, variables = tiny_variables
    logits = model.apply(variables, video, audio, train=False)
    assert logits.shape == (2, 2)
    probs = jax.nn.softmax(logits)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    # Training mode must update batch_stats.
    out, updates = model.apply(
        variables, video, audio, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 2)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.parametrize("model_type", sorted(EXPECTED))
def test_param_count_parity(model_type, tiny_inputs):
    video, audio = tiny_inputs
    spec = build_model(model_type)
    model = spec.module()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), video, audio, train=False)
    )
    assert _count(variables["params"]) == EXPECTED[model_type]


@pytest.mark.parametrize(
    "model_type,pooling_type,dim",
    [
        ("cnn_L3_melspec2", "original", 6144),
        ("cnn_L3_melspec2", "short", 512),
        ("cnn_L3_melspec1", "original", 6144),
        ("cnn_L3_melspec1", "short", 512),
        ("cnn_L3_orig", "original", 6144),
        ("cnn_L3_orig", "short", 512),
    ],
)
def test_audio_embedding_dims(model_type, pooling_type, dim, tiny_inputs):
    _, audio = tiny_inputs
    spec = build_model(model_type)
    model = spec.module()
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 224, 224, 3), jnp.float32),
            audio,
            train=False,
        )
    )
    fn = audio_embedding_fn(model_type, pooling_type)
    emb = jax.eval_shape(fn, variables, audio)
    assert emb.shape == (2, dim)


def test_vision_embedding_dim(tiny_inputs):
    video, audio = tiny_inputs
    spec = build_model("cnn_L3_orig")
    model = spec.module()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), video, audio, train=False)
    )
    fn = vision_embedding_fn("cnn_L3_orig")
    emb = jax.eval_shape(fn, variables, video)
    assert emb.shape == (2, 8192)


def test_melspec2_real_forward(tiny_inputs):
    # One real (non-eval_shape) forward through the flagship model.
    video, audio = tiny_inputs
    spec = build_model("cnn_L3_melspec2")
    model = spec.module()
    variables = model.init(jax.random.PRNGKey(0), video, audio, train=False)
    logits = model.apply(variables, video, audio, train=False)
    assert logits.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(logits)))

    fn = audio_embedding_fn("cnn_L3_melspec2", "short")
    emb = np.asarray(fn(variables, audio))
    assert emb.shape == (2, 512)
    assert np.all(np.isfinite(emb))
