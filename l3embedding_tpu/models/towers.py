"""L3 audio and vision convolutional towers as flax modules.

Architecture parity with reference l3embedding/audio_model.py and
vision_model.py; implementation is TPU-native: NHWC layout, spectrogram
front-ends computed by the MXU matmul formulation in ops/frontend (the
reference embeds kapre TF-op layers in the graph instead), and BatchNorm
statistics handled functionally through flax's mutable collections.

Parity quirks intentionally reproduced:
  * The "embedding layer" is the raw output of the final conv — before
    its BatchNorm and ReLU (reference audio_model.py:482-483 pools
    `embed_layer.output` directly). Towers `sow` that tensor under
    'intermediates' as '{audio,vision}_embedding_layer'.
  * Vision block 1 applies ReLU *before* BatchNorm on its second conv
    (reference vision_model.py:41-43) — all other blocks are conv→BN→ReLU.
  * Audio max-pools use 'valid' padding; vision pools use 'same'
    (reference audio_model.py:59 vs vision_model.py:44).
  * BatchNorm uses Keras 2.0.9 defaults: momentum=0.99, epsilon=1e-3.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import frontend

BN_MOMENTUM = 0.99
BN_EPS = 1e-3
KERNEL_INIT = nn.initializers.he_normal()

# Compute dtype policy: params are always float32; `dtype=bfloat16`
# runs conv/BN compute in bf16 on the MXU (the TPU-native mixed-precision
# recipe). The parity/extraction path uses float32 + Precision.HIGHEST.


def _max_pool(x, window, strides=None, padding="VALID"):
    # reduce_window (and its SelectAndScatter backward) measured fastest
    # on TPU v5e for these shapes — 3.0/4.4 ms fwd/bwd at
    # (128,224,224,64) bf16 vs 3.8/12.8 for a reshape+max formulation
    # and 5.3/17.4 for strided-slice maximum (tools/ablate_r2.py).
    # Rejected optimization (measured): cropping VALID-pool inputs to
    # window multiples before pooling. The audio tower's odd 199-frame
    # axis does make the SelectAndScatter backward ~1.4x slower than the
    # equal-sized even-width vision pool (4.06 vs 2.82 ms), but the crop
    # slice materializes a full copy of the pre-pool activation (SAS
    # operands don't fuse) and the step got slower overall (173.6 vs
    # 168.5 ms at batch 128; tools/ablate_r2.py train).
    strides = strides or window
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


class ConvBNRelu(nn.Module):
    """3x3 (default) conv → BN → ReLU, with optional order quirks."""

    filters: int
    kernel: Sequence[int] = (3, 3)
    conv_padding: str = "SAME"
    relu_before_bn: bool = False  # vision block-1 second conv quirk
    conv_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.filters,
            tuple(self.kernel),
            padding=self.conv_padding,
            kernel_init=KERNEL_INIT,
            name=self.conv_name,
            dtype=self.dtype,
        )(x)
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )
        if self.relu_before_bn:
            x = nn.relu(x)
            x = bn(x)
        else:
            x = bn(x)
            x = nn.relu(x)
        return x


class L3AudioTower(nn.Module):
    """The 4-block L3 audio subnetwork, parameterized over its front-end.

    frontend_kind selects the DSP preprocessing:
      'linear'    — |STFT| + L3 log norm            (cnn_L3_orig)
      'linear_db' — dB |STFT| + input BN            (cnn_L3_kapredbinputbn)
      'mel'       — dB mel (n_mels) + input BN      (cnn_L3_melspec1/2)
    """

    frontend_kind: str = "linear"
    n_mels: int = 128
    final_pool: Sequence[int] = (32, 24)
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    dtype: Any = jnp.float32
    # kapre<=0.1.x referenced dB against the max of the whole *batch*
    # tensor (reference audio_model.py:138-151, 245-260), making features
    # batch-dependent. Checkpoints trained under that quirk need
    # db_batch_global=True for bit-faithful reproduction; the default is
    # the sane per-sample reference.
    db_batch_global: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, 1, 48000) float32 in [-1, 1] (reference input convention,
        # audio_model.py:35) or (B, 48000).
        if x.ndim == 3:
            x = x[:, 0, :]

        import os

        from ..ops.pallas_frontend import (
            melspectrogram_fused,
            pallas_available,
            spectrogram_fused,
        )

        # Training-time (bf16) front-end implementation: the chunked-
        # framing XLA bf16 path by default; L3_TRAIN_FRONTEND=fused picks
        # the Pallas kernel (kept for the ablation; the XLA path measured
        # faster end-to-end once the gather framing was removed). The env
        # var is read at TRACE time: set it before the model is first
        # jitted — changing it afterwards is ignored by the jit cache
        # (it's an ablation knob, not a runtime switch).
        fast = self.dtype == jnp.bfloat16
        impl = os.environ.get("L3_TRAIN_FRONTEND", "xla")
        # The fused Pallas kernel implements per-sample dB only.
        use_fused = (
            fast and impl == "fused" and pallas_available()
            and not self.db_batch_global
        )
        db_ps = not self.db_batch_global

        if self.frontend_kind == "linear":
            cfg = frontend.SpectrogramConfig()
            if use_fused:
                y = spectrogram_fused(x, cfg)
            elif fast:
                y = frontend.spectrogram_bf16(x, cfg)
            else:
                y = frontend.spectrogram(x, cfg, precision=self.precision)
            y = frontend.l3_log_norm(y)
        elif self.frontend_kind == "linear_db":
            cfg = frontend.SpectrogramConfig(decibel=True, db_per_sample=db_ps)
            if use_fused:
                y = spectrogram_fused(x, cfg)
            elif fast:
                y = frontend.spectrogram_bf16(x, cfg)
            else:
                y = frontend.spectrogram(x, cfg, precision=self.precision)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
            )(y)
        elif self.frontend_kind == "mel":
            # Fast path: bf16 MXU formulation when training in bf16; the
            # f32 path keeps the XLA HIGHEST-precision formulation — that
            # is the extraction/parity configuration.
            cfg = frontend.MelConfig(n_mels=self.n_mels, db_per_sample=db_ps)
            if use_fused:
                y = melspectrogram_fused(x, cfg)
            elif fast:
                y = frontend.melspectrogram_bf16(x, cfg)
            else:
                y = frontend.melspectrogram(x, cfg, precision=self.precision)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
            )(y)
        else:
            raise ValueError(f"unknown frontend_kind {self.frontend_kind!r}")

        y = y.astype(self.dtype)
        for filters in (64, 128, 256):
            y = ConvBNRelu(filters, dtype=self.dtype)(y, train)
            y = ConvBNRelu(filters, dtype=self.dtype)(y, train)
            y = _max_pool(y, (2, 2))

        y = ConvBNRelu(512, dtype=self.dtype)(y, train)
        # The embedding conv: raw output is the embedding feature map.
        y = nn.Conv(
            512,
            (3, 3),
            padding="SAME",
            kernel_init=KERNEL_INIT,
            name="audio_embedding_layer",
            dtype=self.dtype,
        )(y)
        self.sow("intermediates", "embedding_features", y.astype(jnp.float32))
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(y)
        y = nn.relu(y)
        y = _max_pool(y, tuple(self.final_pool))
        return y.reshape((y.shape[0], -1))


class L3VisionTower(nn.Module):
    """The 4-block L3 vision subnetwork (224x224x3 → 512-d).

    input_bn=True adds BatchNorm on the raw input (the `_inputbn_` variant
    used by all non-orig AVC models, reference vision_model.py:123-124).
    """

    input_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        if self.input_bn:
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
            )(y)

        y = y.astype(self.dtype)
        # Block 1 carries the reference's relu-before-BN quirk on its
        # second conv (vision_model.py:41-43).
        y = ConvBNRelu(64, dtype=self.dtype)(y, train)
        y = ConvBNRelu(64, relu_before_bn=True, dtype=self.dtype)(y, train)
        y = _max_pool(y, (2, 2), padding="SAME")

        for filters in (128, 256):
            y = ConvBNRelu(filters, dtype=self.dtype)(y, train)
            y = ConvBNRelu(filters, dtype=self.dtype)(y, train)
            y = _max_pool(y, (2, 2), padding="SAME")

        y = ConvBNRelu(512, dtype=self.dtype)(y, train)
        y = nn.Conv(
            512,
            (3, 3),
            padding="SAME",
            kernel_init=KERNEL_INIT,
            name="vision_embedding_layer",
            dtype=self.dtype,
        )(y)
        self.sow("intermediates", "embedding_features", y.astype(jnp.float32))
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(y)
        y = nn.relu(y)
        y = _max_pool(y, (28, 28), padding="SAME")
        return y.reshape((y.shape[0], -1))


class TinyL3AudioTower(nn.Module):
    """Miniature audio tower for cheap end-to-end validation
    (reference audio_model.py:490-541)."""

    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    db_batch_global: bool = False  # see L3AudioTower.db_batch_global

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[:, 0, :]
        cfg = frontend.SpectrogramConfig(
            n_dft=512, hop=240, n_win=480, padding="valid", power=1.0,
            decibel=True, db_per_sample=not self.db_batch_global,
        )
        y = frontend.spectrogram(x, cfg, precision=self.precision)
        for i in range(3):
            name = "embedding_conv" if i == 2 else None
            y = nn.Conv(
                10, (5, 5), padding="VALID", kernel_init=KERNEL_INIT, name=name
            )(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
            )(y)
            y = nn.relu(y)
            y = _max_pool(y, (3, 3))
        self.sow("intermediates", "embedding_features", y)
        return y.reshape((y.shape[0], -1))


class TinyL3VisionTower(nn.Module):
    """Miniature vision tower (reference vision_model.py:221-265)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i in range(3):
            name = "embedding_conv" if i == 2 else None
            y = nn.Conv(
                10, (5, 5), padding="VALID", kernel_init=KERNEL_INIT, name=name
            )(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
            )(y)
            y = nn.relu(y)
            y = _max_pool(y, (3, 3))
        self.sow("intermediates", "embedding_features", y)
        return y.reshape((y.shape[0], -1))
