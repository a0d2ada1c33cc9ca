"""VGGish baseline in flax + PCA/quantization postprocessor.

Replaces the reference's TF-slim VGGish (reference
data/usc/vggish/vggish_slim.py:38-128) and Postprocessor
(vggish_postprocess.py:21-94). Architecture: (B, 96, 64) log-mel patches
→ [conv64, pool, conv128, pool, conv256 x2, pool, conv512 x2, pool] →
flatten → fc4096 x2 → fc128 embedding. All convs 3x3 SAME, pools 2x2
SAME, ReLU everywhere including the embedding layer (slim's
fully_connected default activation is ReLU).

The reference builds a fresh TF graph + session PER AUDIO FILE
(reference features.py:166-221, noted inefficiency at features.py:169);
here one jitted forward stays resident (VGGishExtractor.get_cached).

Weights: the published TF checkpoint cannot be read without TensorFlow.
`load_vggish_weights` reads either (a) a .npz export with keys
'vggish/<scope>/weights|biases' (the standard community conversion of
vggish_model.ckpt), or (b) a TF checkpoint via tf.train.load_checkpoint
when TF happens to be installed. Without weights the model runs randomly
initialized (shapes/pipeline still exercised; golden smoke-test asserts
are gated on weight availability).
"""

from __future__ import annotations

import logging
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOGGER = logging.getLogger("l3embedding_tpu.vggish")

EMBEDDING_SIZE = 128
NUM_FRAMES = 96
NUM_BANDS = 64

QUANTIZE_MIN_VAL = -2.0
QUANTIZE_MAX_VAL = +2.0


class VGGish(nn.Module):
    """The VGGish conv stack. Input (B, 96, 64) or (B, 96, 64, 1)."""

    embedding_size: int = EMBEDDING_SIZE

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(jnp.float32)
        for filters, reps, scope in (
            (64, 1, "conv1"),
            (128, 1, "conv2"),
            (256, 2, "conv3"),
            (512, 2, "conv4"),
        ):
            for i in range(reps):
                name = scope if reps == 1 else f"{scope}_{i + 1}"
                x = nn.relu(nn.Conv(filters, (3, 3), padding="SAME", name=name)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(4096, name="fc1_1")(x))
        x = nn.relu(nn.Dense(4096, name="fc1_2")(x))
        x = nn.relu(nn.Dense(self.embedding_size, name="fc2")(x))
        return x


# TF-slim variable scope → our flax module path.
_SLIM_NAME_MAP = {
    "vggish/conv1/weights": ("conv1", "kernel"),
    "vggish/conv1/biases": ("conv1", "bias"),
    "vggish/conv2/weights": ("conv2", "kernel"),
    "vggish/conv2/biases": ("conv2", "bias"),
    "vggish/conv3/conv3_1/weights": ("conv3_1", "kernel"),
    "vggish/conv3/conv3_1/biases": ("conv3_1", "bias"),
    "vggish/conv3/conv3_2/weights": ("conv3_2", "kernel"),
    "vggish/conv3/conv3_2/biases": ("conv3_2", "bias"),
    "vggish/conv4/conv4_1/weights": ("conv4_1", "kernel"),
    "vggish/conv4/conv4_1/biases": ("conv4_1", "bias"),
    "vggish/conv4/conv4_2/weights": ("conv4_2", "kernel"),
    "vggish/conv4/conv4_2/biases": ("conv4_2", "bias"),
    "vggish/fc1/fc1_1/weights": ("fc1_1", "kernel"),
    "vggish/fc1/fc1_1/biases": ("fc1_1", "bias"),
    "vggish/fc1/fc1_2/weights": ("fc1_2", "kernel"),
    "vggish/fc1/fc1_2/biases": ("fc1_2", "bias"),
    "vggish/fc2/weights": ("fc2", "kernel"),
    "vggish/fc2/biases": ("fc2", "bias"),
}


def load_vggish_weights(path: str, params: dict) -> dict:
    """Map a vggish_model checkpoint (.npz export or TF .ckpt) onto the
    flax params pytree. Returns a new params dict."""
    tensors = {}
    if path.endswith(".npz"):
        with np.load(path) as data:
            tensors = {k: data[k] for k in data.files}
    else:
        try:
            import tensorflow.compat.v1 as tf  # type: ignore

            reader = tf.train.load_checkpoint(path)
            tensors = {
                k: reader.get_tensor(k)
                for k in reader.get_variable_to_shape_map()
            }
        except ImportError as e:
            raise RuntimeError(
                "Reading TF .ckpt requires tensorflow; export the weights "
                "to .npz instead (keys 'vggish/<scope>/weights|biases')."
            ) from e

    new = jax.tree.map(lambda x: x, params)  # shallow copy
    loaded = 0
    for tf_name, (module, kind) in _SLIM_NAME_MAP.items():
        key = tf_name if tf_name in tensors else tf_name.rstrip(":0")
        if key not in tensors:
            LOGGER.warning("missing tensor %s in %s", tf_name, path)
            continue
        arr = np.asarray(tensors[key])
        target = new[module][kind]
        if arr.shape != target.shape:
            raise ValueError(
                f"shape mismatch for {tf_name}: {arr.shape} vs {target.shape}"
            )
        new[module][kind] = jnp.asarray(arr)
        loaded += 1
    LOGGER.info("Loaded %d/%d VGGish tensors", loaded, len(_SLIM_NAME_MAP))
    return new


class Postprocessor:
    """PCA whitening + uint8 quantization
    (reference vggish_postprocess.py:21-94)."""

    def __init__(self, pca_params_npz_path, pca_eigen_vectors_name="pca_eigen_vectors",
                 pca_means_name="pca_means", embedding_size=EMBEDDING_SIZE, **params):
        data = np.load(pca_params_npz_path)
        self._pca_matrix = data[pca_eigen_vectors_name]
        self._pca_means = data[pca_means_name].reshape(-1, 1)
        assert self._pca_matrix.shape == (embedding_size, embedding_size)
        assert self._pca_means.shape == (embedding_size, 1)

    def postprocess(self, embeddings_batch, embedding_size=EMBEDDING_SIZE,
                    quantize=True, quantize_min_val=QUANTIZE_MIN_VAL,
                    quantize_max_val=QUANTIZE_MAX_VAL, **params):
        assert embeddings_batch.ndim == 2
        assert embeddings_batch.shape[1] == embedding_size
        pca = np.dot(self._pca_matrix, embeddings_batch.T - self._pca_means).T
        clipped = np.clip(pca, quantize_min_val, quantize_max_val)
        if not quantize:
            return clipped
        q = (clipped - quantize_min_val) * (
            255.0 / (quantize_max_val - quantize_min_val)
        )
        return q.astype(np.uint8)


class VGGishExtractor:
    """Resident VGGish embedding extractor (optionally postprocessed)."""

    _cache: dict = {}

    def __init__(self, resources_dir: str | None = None):
        if resources_dir is None:
            resources_dir = os.path.join(
                os.path.dirname(__file__), "..", "..", "resources", "vggish"
            )
        self.resources_dir = resources_dir
        self.model = VGGish()
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, NUM_FRAMES, NUM_BANDS))
        )
        params = variables["params"]

        self.has_weights = False
        for candidate in ("vggish_model.npz", "vggish_model.ckpt"):
            path = os.path.join(resources_dir, candidate)
            if os.path.exists(path) or os.path.exists(path + ".index"):
                try:
                    params = load_vggish_weights(path, params)
                    self.has_weights = True
                    break
                except RuntimeError as e:
                    LOGGER.warning("could not load %s: %s", path, e)
        if not self.has_weights:
            LOGGER.warning(
                "VGGish weights not found in %s — running with random "
                "initialization (download vggish_model and export to .npz "
                "for the pretrained baseline)", resources_dir,
            )
        self.params = params

        pca_path = os.path.join(resources_dir, "vggish_pca_params.npz")
        self.postprocessor = (
            Postprocessor(pca_path) if os.path.exists(pca_path) else None
        )
        self._fn = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def get_cached(cls, resources_dir=None):
        key = resources_dir or "<default>"
        if key not in cls._cache:
            cls._cache[key] = cls(resources_dir)
        return cls._cache[key]

    def embed_examples(self, examples: np.ndarray, postprocess=True) -> np.ndarray:
        emb = np.asarray(self._fn(self.params, jnp.asarray(examples, jnp.float32)))
        if postprocess and self.postprocessor is not None:
            return self.postprocessor.postprocess(emb).astype(np.float32)
        return emb

    def embed_waveform(self, data, sample_rate, hop_size=0.96,
                       postprocess=True) -> np.ndarray:
        from ..data.vggish_mel import waveform_to_examples

        examples = waveform_to_examples(
            data, sample_rate, frame_hop_sec=hop_size
        )
        return self.embed_examples(examples, postprocess=postprocess)

    def embed_file(self, path: str, hop_size=0.96, postprocess=True) -> np.ndarray:
        from ..data.audio_io import load_audio
        from ..data.vggish_mel import SAMPLE_RATE

        audio = load_audio(path, SAMPLE_RATE)
        # Reference pads short audio to one example window
        # (features.py:173-181).
        frame_samples = int(np.ceil(SAMPLE_RATE * max(0.96, 0.975)))
        if audio.shape[0] < frame_samples:
            pad = frame_samples - audio.shape[0]
            audio = np.pad(audio, (pad // 2, pad - pad // 2), mode="constant")
        return self.embed_waveform(audio, SAMPLE_RATE, hop_size=hop_size,
                                   postprocess=postprocess)
