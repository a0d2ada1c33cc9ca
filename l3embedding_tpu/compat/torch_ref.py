"""Independent PyTorch reference implementation of the L3 towers.

The BASELINE parity gate (embedding cosine >= 0.999 vs the 2018 Keras
reference, reference l3embedding/model.py:131-181) cannot be executed
against real Keras in this image (no TF/Keras, no published weight
files reachable) — this torch-CPU reimplementation, written from the
architecture spec (reference audio_model.py:28-115, vision_model.py:
28-99), is the stand-in: identical weights are loaded into both stacks
and the outputs must agree at the gate level. Used by
tests/test_torch_parity.py and `bench.py --parity` (which records the
measured cosine in every round's bench artifact).

torch is an optional dependency: import this module lazily.
"""

from __future__ import annotations

import numpy as np
import torch

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
    """Independent NCHW implementation of L3VisionTower (eval mode).

    Returns (512-d tower output, raw vision_embedding_layer feature map
    in NHWC). Covers the block-1 ReLU/BN order quirk (reference
    vision_model.py:40-43)."""
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
        # flax auto-naming: the final BN is BatchNorm_1 when the input BN
        # exists, BatchNorm_0 otherwise.
        x = torch.relu(
            _torch_bn(p, s, "BatchNorm_1" if input_bn else "BatchNorm_0")(x)
        )
        x = torch.nn.MaxPool2d(28, 28)(x)
        out = x.flatten(1)
    return out.numpy(), feat.numpy().transpose(0, 2, 3, 1)


def torch_vggish_forward(params, examples):
    """Independent NCHW torch implementation of the VGGish conv stack
    (reference data/usc/vggish/vggish_slim.py:38-128), written from
    Google's published architecture description: (B, 96, 64, 1) log-mel
    patches → [conv64, pool, conv128, pool, conv256 x2, pool,
    conv512 x2, pool] → flatten → fc4096 x2 → fc128, ReLU everywhere
    (slim's fully_connected default). The flatten follows TF's
    channels-last layout, so the NCHW tensor is permuted back to NHWC
    before flattening — exactly what validates the flax fc1_1 kernel's
    input ordering.

    `params` is the flax VGGish params dict; returns (B, 128) numpy.
    """
    x = np.asarray(examples, np.float32)
    if x.ndim == 3:
        x = x[..., None]
    t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())

    def fc(name):
        w = np.asarray(params[name]["kernel"])  # (in, out)
        b = np.asarray(params[name]["bias"])
        lin = torch.nn.Linear(w.shape[0], w.shape[1])
        lin.weight.data = torch.from_numpy(w.T.copy())
        lin.bias.data = torch.from_numpy(b.copy())
        return lin

    pool = torch.nn.MaxPool2d(2, 2)
    with torch.no_grad():
        for names in (("conv1",), ("conv2",), ("conv3_1", "conv3_2"),
                      ("conv4_1", "conv4_2")):
            for name in names:
                t = torch.relu(_torch_conv(params, name)(t))
            t = pool(t)
        t = t.permute(0, 2, 3, 1).flatten(1)  # NHWC flatten order
        t = torch.relu(fc("fc1_1")(t))
        t = torch.relu(fc("fc1_2")(t))
        t = torch.relu(fc("fc2")(t))
    return t.numpy()


def torch_vggish_postprocess(pca_eigen_vectors, pca_means, embeddings,
                             quantize_min=-2.0, quantize_max=2.0):
    """Independent torch implementation of the VGGish postprocessor
    (reference vggish_postprocess.py:53-94): PCA projection about the
    means, clip to [-2, 2], uint8 quantize. Computed as
    (x - means) @ eigvecs.T (row-vector form) rather than the
    reference's eigvecs @ (x.T - means) column form, so a transposition
    error in either implementation breaks the agreement."""
    with torch.no_grad():
        e = torch.from_numpy(np.asarray(embeddings, np.float64))
        vec = torch.from_numpy(np.asarray(pca_eigen_vectors, np.float64))
        means = torch.from_numpy(
            np.asarray(pca_means, np.float64).reshape(1, -1)
        )
        pca = (e - means) @ vec.T
        clipped = torch.clamp(pca, quantize_min, quantize_max)
        q = (clipped - quantize_min) * (255.0 / (quantize_max - quantize_min))
    return q.numpy().astype(np.uint8)


def torch_audio_forward(variables, features_nhwc, input_bn=True,
                        orig_pool=(8, 8), final_pool=(32, 24)):
    """Independent NCHW implementation of the L3 audio conv stack, fed
    precomputed (float64-exact) front-end features → (pooled 'original'
    embedding, final tower output).

    input_bn: the frontend BatchNorm present on linear_db/mel variants
    (absent on cnn_L3_orig, whose l3_log_norm is applied by the caller).
    """
    p = variables["params"]["audio_model"]
    s = variables["batch_stats"]["audio_model"]
    x = torch.from_numpy(
        np.asarray(features_nhwc, np.float32).transpose(0, 3, 1, 2).copy()
    )
    final_bn = "BatchNorm_1" if input_bn else "BatchNorm_0"
    with torch.no_grad():
        if input_bn:
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
        emb = torch.nn.MaxPool2d(tuple(orig_pool))(feat)  # 'original'
        emb = emb.permute(0, 2, 3, 1).flatten(1)          # NHWC flatten
        x = torch.relu(_torch_bn(p, s, final_bn)(feat))
        out = (
            torch.nn.MaxPool2d(tuple(final_pool))(x)
            .permute(0, 2, 3, 1)
            .flatten(1)
        )
    return emb.numpy(), out.numpy()
