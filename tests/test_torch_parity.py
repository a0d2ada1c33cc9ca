"""Cross-framework numerical parity: the L3 vision tower evaluated
against an independent PyTorch implementation with identical weights.

The BASELINE parity gate (cosine >= 0.999 vs the Keras reference) can't
be executed here (no TF/Keras in the image), so this is the stand-in:
torch-CPU reimplements the tower from the written architecture spec,
our flax parameters are copied in, and outputs must match to f32
tolerance. This independently validates conv padding/layout, BN
eval-mode arithmetic (eps placement), pooling, the block-1 ReLU/BN
order quirk, and the embedding-layer tap point.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from l3embedding_tpu.compat.torch_ref import (  # noqa: E402
    torch_audio_forward,
    torch_vision_forward,
)
from l3embedding_tpu.models import build_model, vision_embedding_fn  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    spec = build_model("cnn_L3_melspec2")  # vision tower with input BN
    model = spec.module()
    rng = np.random.RandomState(0)
    video = (rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1)
    audio = np.zeros((2, 1, 48000), np.float32)
    variables = model.init(jax.random.PRNGKey(1), video, audio, train=False)
    # Random (non-init) BN stats so the BN math is actually exercised.
    variables = jax.device_get(variables)
    import jax.numpy as jnp

    def perturb(path, leaf):
        name = getattr(path[-1], "key", "")
        if name == "mean":
            return leaf + 0.05
        if name == "var":
            return leaf * 1.3 + 0.01
        return leaf

    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        perturb, variables["batch_stats"]
    )
    return model, variables, video


def test_vision_tower_matches_torch(setup):
    model, variables, video = setup
    tower = model.vision_model
    sub = {
        "params": variables["params"]["vision_model"],
        "batch_stats": variables["batch_stats"]["vision_model"],
    }
    ours = np.asarray(tower.apply(sub, video, train=False))
    theirs, _ = torch_vision_forward(variables, video, input_bn=True)
    assert ours.shape == theirs.shape == (2, 512)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
    # Cosine at the parity-gate level.
    for a, b in zip(ours, theirs):
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.99999


def test_vision_embedding_matches_torch(setup):
    model, variables, video = setup
    fn = vision_embedding_fn("cnn_L3_melspec2")
    ours = np.asarray(fn(variables, video))
    _, feat = torch_vision_forward(variables, video, input_bn=True)
    # 7x7 max pool + flatten on the raw embedding feature map.
    t = torch.nn.MaxPool2d(7, 7)(
        torch.from_numpy(feat.transpose(0, 3, 1, 2).copy())
    )
    # Flatten in NHWC order (the Keras channels-last convention the
    # embedding dims follow).
    theirs = t.permute(0, 2, 3, 1).flatten(1).numpy()
    assert ours.shape == theirs.shape == (2, 8192)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_audio_embedding_baseline_cosine_gate(setup):
    """The BASELINE parity gate (embedding cosine >= 0.999), executed
    with an independent torch implementation standing in for Keras:
    float64 numpy DSP front-end + torch conv stack vs our full
    audio→embedding path."""
    from l3embedding_tpu.models import audio_embedding_fn
    from l3embedding_tpu.ops import dsp_ref

    model, variables, _ = setup
    rng = np.random.RandomState(3)
    audio = (rng.randn(2, 1, 48000).astype(np.float32) * 0.2)

    # Ours: full on-accelerator path (jnp frontend + flax towers).
    ours = np.asarray(audio_embedding_fn("cnn_L3_melspec2", "original")(
        variables, audio
    ))

    # Theirs: float64 mel features + torch convs.
    feats = np.stack(
        [dsp_ref.melspectrogram(a[0], n_mels=256) for a in audio]
    )[..., None]
    theirs, _ = torch_audio_forward(variables, feats)

    assert ours.shape == theirs.shape == (2, 6144)
    for a, b in zip(ours, theirs):
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999, cos


def _variant_variables(model_type, db_batch_global=False):
    """Init + BN-stat-perturbed variables for a model variant (f32)."""
    import jax.numpy as jnp  # noqa: F401

    spec = build_model(model_type)
    model = spec.module(db_batch_global=db_batch_global)
    rng = np.random.RandomState(7)
    video = (rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1)
    audio = (rng.randn(2, 1, 48000).astype(np.float32) * 0.2)
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(2), video, audio, train=False)
    )

    def perturb(path, leaf):
        name = getattr(path[-1], "key", "")
        if name == "mean":
            return leaf + 0.05
        if name == "var":
            return leaf * 1.3 + 0.01
        return leaf

    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        perturb, variables["batch_stats"]
    )
    return variables, video, audio


def _cos_gate(ours, theirs, gate=0.999):
    assert ours.shape == theirs.shape
    for a, b in zip(ours, theirs):
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > gate, cos


def test_audio_embedding_orig_cosine_gate():
    """cnn_L3_orig: |STFT| + L3 log-norm front-end, no frontend BN
    (reference audio_model.py:15-76)."""
    from l3embedding_tpu.models import audio_embedding_fn
    from l3embedding_tpu.ops import dsp_ref

    variables, _, audio = _variant_variables("cnn_L3_orig")
    ours = np.asarray(
        audio_embedding_fn("cnn_L3_orig", "original")(variables, audio)
    )
    feats = np.stack(
        [
            dsp_ref.l3_log_norm(
                dsp_ref.spectrogram(a[0], padding="valid", power=1.0)
            )
            for a in audio
        ]
    )[..., None]
    theirs, _ = torch_audio_forward(
        variables, feats, input_bn=False, orig_pool=(8, 8)
    )
    assert ours.shape == (2, 6144)
    _cos_gate(ours, theirs)


def test_audio_embedding_kapredbinputbn_cosine_gate():
    """cnn_L3_kapredbinputbn: per-sample dB |STFT| + frontend BN
    (reference audio_model.py:79-151)."""
    from l3embedding_tpu.models import audio_embedding_fn
    from l3embedding_tpu.ops import dsp_ref

    variables, _, audio = _variant_variables("cnn_L3_kapredbinputbn")
    ours = np.asarray(
        audio_embedding_fn("cnn_L3_kapredbinputbn", "original")(
            variables, audio
        )
    )
    feats = np.stack(
        [
            dsp_ref.amplitude_to_db(
                dsp_ref.spectrogram(a[0], padding="valid", power=1.0)
            )
            for a in audio
        ]
    )[..., None]
    theirs, _ = torch_audio_forward(
        variables, feats, input_bn=True, orig_pool=(8, 8)
    )
    assert ours.shape == (2, 6144)
    _cos_gate(ours, theirs)


def test_audio_embedding_melspec1_cosine_gate():
    """cnn_L3_melspec1: 128-mel dB front-end, (4,8) 'original' pooling
    (reference audio_model.py:154-260)."""
    from l3embedding_tpu.models import audio_embedding_fn
    from l3embedding_tpu.ops import dsp_ref

    variables, _, audio = _variant_variables("cnn_L3_melspec1")
    ours = np.asarray(
        audio_embedding_fn("cnn_L3_melspec1", "original")(variables, audio)
    )
    feats = np.stack(
        [dsp_ref.melspectrogram(a[0], n_mels=128) for a in audio]
    )[..., None]
    theirs, _ = torch_audio_forward(
        variables, feats, input_bn=True, orig_pool=(4, 8),
        final_pool=(16, 24),
    )
    assert ours.shape == (2, 6144)
    _cos_gate(ours, theirs)


def test_audio_melspec2_batch_global_db_quirk():
    """db_batch_global=True must reproduce kapre<=0.1.x's batch-global dB
    max reference end-to-end (reference audio_model.py:245-260): the
    torch-side features are dB-referenced against the max of the whole
    batch tensor, and the per-sample default must NOT match them."""
    from l3embedding_tpu.models import audio_embedding_fn
    from l3embedding_tpu.ops import dsp_ref

    variables, _, audio = _variant_variables(
        "cnn_L3_melspec2", db_batch_global=True
    )
    # Different per-sample scales so the two referencing modes disagree.
    audio = audio * np.asarray([1.0, 0.01], np.float32)[:, None, None]

    amp = np.stack(
        [dsp_ref.melspectrogram(a[0], n_mels=256, decibel=False) for a in audio]
    )
    feats = dsp_ref.amplitude_to_db(amp, per_sample=False)[..., None]
    theirs, _ = torch_audio_forward(variables, feats, input_bn=True)

    ours_quirk = np.asarray(
        audio_embedding_fn(
            "cnn_L3_melspec2", "original", db_batch_global=True
        )(variables, audio)
    )
    _cos_gate(ours_quirk, theirs)

    # The per-sample default diverges on the quiet sample.
    ours_default = np.asarray(
        audio_embedding_fn("cnn_L3_melspec2", "original")(variables, audio)
    )
    quiet_cos = (ours_default[1] @ theirs[1]) / (
        np.linalg.norm(ours_default[1]) * np.linalg.norm(theirs[1]) + 1e-12
    )
    assert quiet_cos < 0.999, quiet_cos


def test_vision_tower_orig_no_input_bn():
    """cnn_L3_orig's vision tower (no input BN, reference
    vision_model.py:17-64) against the torch implementation."""
    variables, video, _ = _variant_variables("cnn_L3_orig")
    spec = build_model("cnn_L3_orig")
    tower = spec.module().vision_model
    sub = {
        "params": variables["params"]["vision_model"],
        "batch_stats": variables["batch_stats"]["vision_model"],
    }
    ours = np.asarray(tower.apply(sub, video, train=False))
    theirs, _ = torch_vision_forward(variables, video, input_bn=False)
    assert ours.shape == theirs.shape == (2, 512)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
