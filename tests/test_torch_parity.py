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

from l3embedding_tpu.models import build_model, vision_embedding_fn  # noqa: E402

BN_EPS = 1e-3


def _torch_conv(params, name):
    w = np.asarray(params[name]["kernel"])  # HWIO
    b = np.asarray(params[name]["bias"])
    conv = torch.nn.Conv2d(w.shape[2], w.shape[3], kernel_size=w.shape[:2],
                           padding="same")
    conv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
    conv.bias.data = torch.from_numpy(b.copy())
    return conv


def _torch_bn(params, stats, name):
    scale = np.asarray(params[name]["scale"])
    bias = np.asarray(params[name]["bias"])
    mean = np.asarray(stats[name]["mean"])
    var = np.asarray(stats[name]["var"])
    bn = torch.nn.BatchNorm2d(scale.shape[0], eps=BN_EPS)
    bn.weight.data = torch.from_numpy(scale.copy())
    bn.bias.data = torch.from_numpy(bias.copy())
    bn.running_mean.data = torch.from_numpy(mean.copy())
    bn.running_var.data = torch.from_numpy(var.copy())
    bn.eval()
    return bn


def torch_vision_forward(variables, x_nhwc, input_bn=True):
    """Independent NCHW implementation of L3VisionTower (eval mode)."""
    p = variables["params"]["vision_model"]
    s = variables["batch_stats"]["vision_model"]
    x = torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())

    with torch.no_grad():
        if input_bn:
            x = _torch_bn(p, s, "BatchNorm_0")(x)

        def block(x, idx, relu_before_bn=False):
            sub_p, sub_s = p[f"ConvBNRelu_{idx}"], s[f"ConvBNRelu_{idx}"]
            x = _torch_conv(sub_p, "Conv_0")(x)
            bn = _torch_bn(sub_p, sub_s, "BatchNorm_0")
            if relu_before_bn:
                x = bn(torch.relu(x))
            else:
                x = torch.relu(bn(x))
            return x

        pool = torch.nn.MaxPool2d(2, 2)
        x = block(x, 0)
        x = block(x, 1, relu_before_bn=True)
        x = pool(x)
        x = block(x, 2)
        x = block(x, 3)
        x = pool(x)
        x = block(x, 4)
        x = block(x, 5)
        x = pool(x)
        x = block(x, 6)
        # embedding conv (raw output is the embedding feature map)
        x = _torch_conv(p, "vision_embedding_layer")(x)
        feat = x
        x = torch.relu(_torch_bn(p, s, "BatchNorm_1")(x))
        x = torch.nn.MaxPool2d(28, 28)(x)
        out = x.flatten(1)
    return out.numpy(), feat.numpy().transpose(0, 2, 3, 1)


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


def torch_audio_forward(variables, features_nhwc):
    """Independent NCHW implementation of the melspec audio conv stack,
    fed precomputed (float64-exact) mel features → (pooled 'original'
    6144-d embedding, final 512-d output)."""
    p = variables["params"]["audio_model"]
    s = variables["batch_stats"]["audio_model"]
    x = torch.from_numpy(
        np.asarray(features_nhwc, np.float32).transpose(0, 3, 1, 2).copy()
    )
    with torch.no_grad():
        x = _torch_bn(p, s, "BatchNorm_0")(x)

        def block(x, idx):
            sub_p, sub_s = p[f"ConvBNRelu_{idx}"], s[f"ConvBNRelu_{idx}"]
            x = _torch_conv(sub_p, "Conv_0")(x)
            return torch.relu(_torch_bn(sub_p, sub_s, "BatchNorm_0")(x))

        pool = torch.nn.MaxPool2d(2, 2)  # VALID (audio pools)
        x = block(x, 0); x = block(x, 1); x = pool(x)
        x = block(x, 2); x = block(x, 3); x = pool(x)
        x = block(x, 4); x = block(x, 5); x = pool(x)
        x = block(x, 6)
        x = _torch_conv(p, "audio_embedding_layer")(x)
        feat = x  # raw embedding conv output (pre-BN/ReLU)
        emb = torch.nn.MaxPool2d((8, 8))(feat)       # 'original' pooling
        emb = emb.permute(0, 2, 3, 1).flatten(1)     # NHWC flatten
        x = torch.relu(_torch_bn(p, s, "BatchNorm_1")(feat))
        out = torch.nn.MaxPool2d((32, 24))(x).permute(0, 2, 3, 1).flatten(1)
    return emb.numpy(), out.numpy()


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
