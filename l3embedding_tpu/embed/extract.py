"""Windowed embedding extraction — the `05_generate_embedding_samples`
hot path.

The reference frames each file into overlapping 1 s windows on the host
(librosa.util.frame) and calls Keras predict per file
(reference data/usc/features.py:256-306). TPU-native design:

  * Same framing/padding math (so embeddings align sample-for-sample),
    computed with a zero-copy numpy stride view.
  * One jitted embedding function reused across files, with
    power-of-two batch bucketing: window batches are zero-padded up to
    a bucket size so XLA compiles a handful of shapes once instead of
    one program per file length (dynamic shapes are the classic TPU
    anti-pattern).
  * Extraction runs in float32 with Precision.HIGHEST — this is the
    parity-gated path (BASELINE cosine >= 0.999).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..models import audio_embedding_fn, build_model
from ..training import checkpoints

LOGGER = logging.getLogger("l3embedding_tpu.embed")

BUCKETS = (16, 32, 64, 128, 256, 512)


def frame_uniform(audio: np.ndarray, sr: int = 48000, hop_size: float = 0.1):
    """Overlapping 1 s windows with the reference's centering/padding
    (reference features.py:256-301) → (num_windows, frame_length) f32."""
    hop_length = int(hop_size * sr)
    frame_length = sr * 1

    audio_length = len(audio)
    if audio_length < frame_length:
        pad_length = frame_length - audio_length
    else:
        # Deliberately reproduced reference quirk (features.py:288): the
        # ceil is applied to the *difference*, not the quotient — a no-op
        # on an integer — so non-hop-aligned clips lose their trailing
        # partial window (pad_length <= 0, guarded below). The corrected
        # formula would be ceil((len - frame)/hop)*hop - (len - frame);
        # we keep the reference behavior so embedding row counts align
        # file-for-file with reference-extracted feature sets.
        pad_length = (
            int(np.ceil(audio_length - frame_length) / hop_length) * hop_length
            - (audio_length - frame_length)
        )
    if pad_length > 0:
        left = pad_length // 2
        audio = np.pad(audio, (left, pad_length - left), mode="constant")

    n = (len(audio) - frame_length) // hop_length + 1
    strides = (audio.strides[0] * hop_length, audio.strides[0])
    return np.lib.stride_tricks.as_strided(
        audio, shape=(n, frame_length), strides=strides
    ).astype(np.float32)


def _bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return int(np.ceil(n / BUCKETS[-1])) * BUCKETS[-1]


class _DeviceFramer:
    """Framing-as-gather device path shared by the f32/bf16 and int8
    extractors (SURVEY §5.7's on-device windowing design).

    A file's PCM crosses host→device ONCE; the bucket's overlapping
    windows are vmapped dynamic_slices on device (at hop 0.1 s the
    host-framed batch is a ~10x blowup of the raw PCM — that factor
    comes off the transfer and the host memcpy). Rows are identical to
    the host-framed path: bucket-padding rows are zero-masked ON DEVICE
    (`n_real` rides as a traced scalar, so varying it never retraces),
    because the staged buffer's padding windows overlap the clip's real
    trailing PCM — and under kapre's batch-global dB quirk the dB
    reference is a max over the WHOLE batch, so a loud non-hop-aligned
    tail visible only to padding rows would silently shift every real
    row. Zero rows match the host path's zero-pad windows exactly.
    """

    def __init__(self, sr: int, forward):
        # forward(operand, windows) -> (B, dim); operand is whatever the
        # caller's jitted forward closes over (variables / act scales).
        self.sr = sr
        self._forward = forward
        self._fns: dict = {}  # (bucket, hop_length) -> jitted fn

    def _fn(self, bucket: int, hop_length: int):
        key = (bucket, hop_length)
        fn = self._fns.get(key)
        if fn is None:
            frame_length = self.sr
            forward = self._forward

            def framed(operand, buf, n_real):
                starts = jnp.arange(bucket) * hop_length

                def one(i):
                    return jax.lax.dynamic_slice(buf, (i,), (frame_length,))

                windows = jax.vmap(one)(starts)
                keep = (jnp.arange(bucket) < n_real)[:, None]
                windows = jnp.where(keep, windows, 0.0)
                return forward(operand, windows)

            fn = self._fns[key] = jax.jit(framed)
        return fn

    def embed_async(self, operand, audio: np.ndarray, hop_size: float):
        """Upload + dispatch, no sync: lazy (n, dim) device array back."""
        hop_length = int(hop_size * self.sr)
        frame_length = self.sr
        n = (len(audio) - frame_length) // hop_length + 1
        bucket = _bucket(n)
        # Stage exactly the samples the bucket's windows cover: real PCM
        # for the n true windows (a dropped non-hop-aligned tail matches
        # frame_uniform's reference quirk), zeros beyond.
        need = (bucket - 1) * hop_length + frame_length
        buf = np.zeros(need, np.float32)
        m = min(len(audio), need)
        buf[:m] = audio[:m]
        emb = self._fn(bucket, hop_length)(operand, buf, np.int32(n))
        return emb[:n]

    def embed(self, operand, audio: np.ndarray, hop_size: float) -> np.ndarray:
        return np.asarray(self.embed_async(operand, audio, hop_size))


class EmbeddingExtractor:
    """Batched audio-embedding extractor for one (model_type, pooling).

    Equivalent of reference load_embedding() + model.predict()
    (reference model.py:131-181, features.py:303-306), holding the
    jitted function and parameters resident on device across files.
    """

    def __init__(
        self,
        weights_path: str | None,
        model_type: str,
        pooling_type: str = "original",
        sr: int = 48000,
        fast: bool = False,
        db_batch_global: bool = False,
        mesh=None,
        device_framing: bool = False,
    ):
        """fast=True switches the tower to bf16 compute with the bf16 MXU
        front-end — higher throughput, and it passes the 0.999 BASELINE
        parity gate outright (measured on-chip min cosine vs the
        float64/torch reference: 0.9999879, vs f32's 0.9999891 —
        bench.py --parity re-measures both); False keeps the
        conservative f32 tower.
        db_batch_global=True reproduces kapre<=0.1.x's batch-global dB
        quirk for checkpoints trained under it (registry.ModelSpec).
        mesh: a jax.sharding.Mesh for multi-chip serving — window batches
        shard over its 'data' axis and parameters replicate, so one
        extractor saturates a v5e-8 the same way the train step does.
        device_framing=True makes embed_audio upload a file's PCM ONCE
        and slice the overlapping windows on device (SURVEY §5.7's
        framing-as-gather design): at hop 0.1 s the host-framed windows
        are a 10x data blowup, so this cuts host→device bytes and host
        memcpy by ~10x per file. Single-chip only (mesh falls back to
        host framing); rows are identical to the host path (tested)."""
        self.model_type = model_type
        self.pooling_type = pooling_type
        self.sr = sr
        self.mesh = mesh
        spec = build_model(model_type)
        model = spec.module(
            compute_dtype=jnp.bfloat16 if fast else jnp.float32,
            db_batch_global=db_batch_global,
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1,) + tuple(spec.video_input_shape), np.float32),
            np.zeros((1,) + tuple(spec.audio_input_shape), np.float32),
            train=False,
        )
        if weights_path is not None:
            variables = checkpoints.load_variables(weights_path, variables)
        if mesh is not None:
            from ..parallel import replicate

            self.variables = replicate(variables, mesh)
        else:
            self.variables = jax.device_put(variables)
        self._raw_fn = audio_embedding_fn(
            model_type,
            pooling_type,
            compute_dtype=jnp.bfloat16 if fast else jnp.float32,
            db_batch_global=db_batch_global,
        )
        self._fn = jax.jit(self._raw_fn)
        self.device_framing = bool(device_framing)
        self._framer = _DeviceFramer(
            self.sr, lambda variables, w: self._raw_fn(variables, w[:, None, :])
        )

    def embed_windows_async(self, windows: np.ndarray):
        """Dispatch (N, frame_length) windows without synchronizing.

        Returns a lazy device array; np.asarray(...) materializes the
        (N, dim) rows. Lets a pipelined caller (embed/service.py) keep
        the device computing batch k+1 while batch k's embeddings
        transfer back. `windows` may already be a device-resident
        jax.Array of an exact bucket size, in which case no host→device
        transfer happens here."""
        n = windows.shape[0]
        bucket = _bucket(n)
        if self.mesh is not None:
            # Bucket must split evenly over the data axis (which need not
            # be a power of two — e.g. a 6-chip slice).
            ndata = self.mesh.shape["data"]
            bucket = -(-bucket // ndata) * ndata
        if bucket != n:
            windows = np.concatenate(
                [windows, np.zeros((bucket - n, windows.shape[1]), np.float32)]
            )
        x = windows[:, None, :]  # (B, 1, 48000) reference input convention
        if self.mesh is not None:
            from ..parallel import batch_sharding

            x = jax.device_put(x, batch_sharding(self.mesh))
        emb = self._fn(self.variables, x)
        return emb[:n]

    def embed_windows(self, windows: np.ndarray) -> np.ndarray:
        """(N, frame_length) float32 → (N, dim) embeddings."""
        return np.asarray(self.embed_windows_async(windows))

    def embed_audio_async(self, audio: np.ndarray, hop_size: float = 0.1,
                          device_framing: bool | None = None):
        """embed_audio without the sync: host decode/framing + dispatch
        happen now, np.asarray(result) materializes. Lets a file-loop
        caller (data/usc/datasets.py's write-behind) overlap file k's
        npz compression with file k+1's device compute."""
        use_device = (self.device_framing if device_framing is None
                      else device_framing)
        if use_device and self.mesh is None and len(audio) >= self.sr:
            # Short clips (< one window) take the host path: they need
            # the centered zero-padding and are one window anyway.
            return self._framer.embed_async(self.variables, audio, hop_size)
        return self.embed_windows_async(frame_uniform(audio, self.sr,
                                                      hop_size))

    def embed_audio(self, audio: np.ndarray, hop_size: float = 0.1,
                    device_framing: bool | None = None) -> np.ndarray:
        return np.asarray(
            self.embed_audio_async(audio, hop_size=hop_size,
                                   device_framing=device_framing)
        )

    def embed_file(self, path: str, hop_size: float = 0.1) -> np.ndarray:
        from ..data.audio_io import load_audio

        return self.embed_audio(load_audio(path, self.sr), hop_size=hop_size)


def load_exported_embedding(prefix: str) -> EmbeddingExtractor:
    """Rebuild a resident extractor from tools/export_embedding_model.py
    output (<prefix>.ckpt + <prefix>.json) — the deployment artifact
    equivalent of the reference's extracted OpenL3 embedding models
    (reference notebooks/extract_embedding_models_from_avc_models.ipynb).
    """
    import json

    with open(prefix + ".json") as f:
        desc = json.load(f)
    if desc.get("export") != "audio":
        raise ValueError(
            f"exported artifact is {desc.get('export')!r}; the resident "
            "extractor serves audio embeddings — use "
            "models.vision_embedding_fn with the .ckpt for vision"
        )
    extractor = EmbeddingExtractor(
        None,
        desc["model_type"],
        desc["pooling_type"],
        db_batch_global=bool(desc.get("db_batch_global", False)),
    )
    host_vars = jax.device_get(extractor.variables)
    template = {
        "params": {"audio_model": host_vars["params"]["audio_model"]},
        "batch_stats": {
            "audio_model": host_vars["batch_stats"]["audio_model"]
        },
    }
    restored = checkpoints.load_variables(prefix + ".ckpt", template)
    host_vars["params"]["audio_model"] = restored["params"]["audio_model"]
    host_vars["batch_stats"]["audio_model"] = restored["batch_stats"][
        "audio_model"
    ]
    extractor.variables = jax.device_put(host_vars)
    return extractor
