"""One-call embedding API in the OpenL3 style.

The reference codebase is the research repo behind OpenL3: its
embedding models were exported for publication via
reference notebooks/extract_embedding_models_from_avc_models.ipynb, and
the published `openl3` package exposes them through
`get_audio_embedding` / `process_audio_file`. Users migrating from that
ecosystem expect the same one-call surface, so this module provides it
on top of the resident TPU extractors:

    import l3embedding_tpu.api as l3api
    emb, ts = l3api.get_audio_embedding(audio, sr,
                                        weights_path="model.ckpt",
                                        input_repr="mel256",
                                        embedding_size=512)

Differences from `openl3` (all deliberate, all documented here):

  * Framing follows openl3's semantics — `center=True` pads half a
    window of zeros at the front so window k is centered at
    ``k * hop_size`` seconds, and a trailing partial window is KEPT
    (zero-padded). The `05` CLI / `data.usc` pipeline instead reproduce
    the reference's framing quirk (trailing partial windows dropped,
    reference data/usc/features.py:288) so feature-set row counts match
    reference-extracted corpora file-for-file. Pass
    ``reference_framing=True`` to get the 05-pipeline framing (then no
    timestamps guarantee for the last window).
  * Resampling uses scipy's polyphase resampler
    (data/audio_io.resample), not resampy's kaiser_best (resampy is not
    a dependency here).
  * Weights are this framework's `.ckpt` pytrees or reference Keras
    `.h5` files (compat.keras_import); openl3's bundled weights are not
    shipped. `weights_path=None` gives a random-init model (useful for
    shape/latency work only).

Model selection mirrors openl3's vocabulary: ``input_repr`` in
{"linear", "mel128", "mel256"} picks the front-end (reference
audio_model.py's cnn_L3_orig / melspec1 / melspec2), ``embedding_size``
in {512, 6144} picks the pooling ("short"/"original",
reference audio_model.py:461-484); images are always 8192-d
(reference vision_model.py:198-218).
"""

from __future__ import annotations

import os

import numpy as np

from .data.audio_io import pcm2float, resample
from .embed.extract import EmbeddingExtractor, _bucket, frame_uniform

TARGET_SR = 48000

INPUT_REPRS = {
    "linear": "cnn_L3_orig",
    "mel128": "cnn_L3_melspec1",
    "mel256": "cnn_L3_melspec2",
}
AUDIO_EMBEDDING_SIZES = {512: "short", 6144: "original"}


def _resolve_model_type(input_repr: str, model_type: str | None) -> str:
    if model_type is not None:
        return model_type
    if input_repr not in INPUT_REPRS:
        raise ValueError(
            f'Invalid input_repr: "{input_repr}" (have: {sorted(INPUT_REPRS)};'
            " or pass model_type= directly)"
        )
    return INPUT_REPRS[input_repr]


def load_audio_embedding_model(
    weights_path: str | None = None,
    input_repr: str = "mel256",
    embedding_size: int = 512,
    *,
    model_type: str | None = None,
    fast: bool = False,
    int8_artifact: str | None = None,
    mesh=None,
    device_framing: bool = False,
):
    """Build the resident extractor `get_audio_embedding` uses.

    Load once and pass as ``model=`` when embedding many
    arrays/files — rebuilding per call re-jits the tower.
    ``fast=True`` selects the bf16 tower (passes the 0.999 parity gate,
    measured in bench.py --parity); ``int8_artifact`` loads a calibrated
    int8 deployment artifact (embed/quantized.py) instead — the fastest
    measured extraction configuration.
    """
    if int8_artifact is not None:
        from .embed.quantized import QuantizedEmbeddingExtractor

        return QuantizedEmbeddingExtractor.load_artifact(
            int8_artifact, mesh=mesh, device_framing=device_framing
        )
    if embedding_size not in AUDIO_EMBEDDING_SIZES:
        raise ValueError(
            f"Invalid embedding_size: {embedding_size} "
            f"(have: {sorted(AUDIO_EMBEDDING_SIZES)})"
        )
    return EmbeddingExtractor(
        weights_path,
        _resolve_model_type(input_repr, model_type),
        AUDIO_EMBEDDING_SIZES[embedding_size],
        fast=fast,
        mesh=mesh,
        device_framing=device_framing,
    )


def _to_mono_float(audio: np.ndarray) -> np.ndarray:
    audio = np.asarray(audio)
    if np.issubdtype(audio.dtype, np.integer):
        audio = pcm2float(audio)  # scale BEFORE any float-producing mix
    if audio.ndim == 2:  # (samples, channels), soundfile convention
        audio = audio.mean(axis=1)
    elif audio.ndim != 1:
        raise ValueError(f"audio must be 1-D or 2-D, got shape {audio.shape}")
    return np.ascontiguousarray(audio, dtype=np.float32)


def _frame_openl3(audio: np.ndarray, sr: int, hop_size: float,
                  center: bool) -> np.ndarray:
    """openl3-semantics framing: front-centered, trailing partial kept."""
    frame_length = sr
    hop_length = int(hop_size * sr)
    if center:
        audio = np.pad(audio, (frame_length // 2, 0), mode="constant")
    if len(audio) <= frame_length:
        n = 1
    else:
        n = 1 + int(np.ceil((len(audio) - frame_length) / hop_length))
    need = (n - 1) * hop_length + frame_length
    if len(audio) < need:
        audio = np.pad(audio, (0, need - len(audio)), mode="constant")
    strides = (audio.strides[0] * hop_length, audio.strides[0])
    return np.lib.stride_tricks.as_strided(
        audio, shape=(n, frame_length), strides=strides
    ).astype(np.float32)


def get_audio_embedding(
    audio: np.ndarray,
    sr: int,
    model=None,
    *,
    weights_path: str | None = None,
    input_repr: str = "mel256",
    embedding_size: int = 512,
    model_type: str | None = None,
    hop_size: float = 0.1,
    center: bool = True,
    reference_framing: bool = False,
    fast: bool = False,
):
    """audio (+ its sample rate) → (embedding (N, dim) f32, ts (N,) sec).

    ``model`` is an extractor from `load_audio_embedding_model` (or any
    object with ``embed_windows``, e.g. a QuantizedEmbeddingExtractor);
    when omitted one is built from the other keyword args. Timestamps
    are window starts — with ``center=True`` (default) they are the
    *centers* of the windows in the original signal, matching openl3.

    A list/tuple of audio arrays returns ``(embeddings, timestamps)``
    lists (one model built and shared across all inputs — openl3's
    list semantics). ``sr`` may then be one rate or a matching list.
    """
    if model is None:
        model = load_audio_embedding_model(
            weights_path, input_repr, embedding_size,
            model_type=model_type, fast=fast,
        )
    if isinstance(audio, (list, tuple)):
        srs = sr if isinstance(sr, (list, tuple)) else [sr] * len(audio)
        if len(srs) != len(audio):
            raise ValueError(
                f"{len(audio)} audio arrays but {len(srs)} sample rates"
            )
        pairs = [
            get_audio_embedding(
                a, s, model=model, hop_size=hop_size, center=center,
                reference_framing=reference_framing,
            )
            for a, s in zip(audio, srs)
        ]
        return [e for e, _ in pairs], [t for _, t in pairs]
    audio = _to_mono_float(audio)
    target_sr = getattr(model, "sr", TARGET_SR)
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
    if reference_framing:
        windows = frame_uniform(audio, target_sr, hop_size)
    else:
        windows = _frame_openl3(audio, target_sr, hop_size, center)
    embedding = model.embed_windows(windows)
    timestamps = np.arange(embedding.shape[0], dtype=np.float64) * hop_size
    return embedding, timestamps


def process_audio_file(
    filepath: str | list[str] | tuple[str, ...],
    output_dir: str | None = None,
    suffix: str | None = None,
    model=None,
    *,
    overwrite: bool = True,
    hop_size: float = 0.1,
    center: bool = True,
    **model_kwargs,
):
    """Embed audio file(s) → ``<name>[_<suffix>].npz`` with keys
    ``embedding`` and ``timestamps`` (the openl3 on-disk convention).

    Returns the output path (or list of paths). A shared ``model`` is
    built once when processing a list.
    """
    paths = [filepath] if isinstance(filepath, (str, os.PathLike)) else list(filepath)
    if model is None and paths:
        model = load_audio_embedding_model(**model_kwargs)
    from .data.audio_io import load_audio

    target_sr = getattr(model, "sr", TARGET_SR)
    outputs = []
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        name = f"{stem}_{suffix}.npz" if suffix else f"{stem}.npz"
        out = os.path.join(output_dir or os.path.dirname(path) or ".", name)
        if not overwrite and os.path.exists(out):
            outputs.append(out)
            continue
        audio = load_audio(path, target_sr)
        emb, ts = get_audio_embedding(
            audio, target_sr, model=model, hop_size=hop_size, center=center
        )
        tmp = out + ".tmp.npz"
        np.savez(tmp, embedding=emb, timestamps=ts)
        os.replace(tmp, out)
        outputs.append(out)
    if isinstance(filepath, (str, os.PathLike)):
        return outputs[0]
    return outputs


def _resize_min_side(frame: np.ndarray, min_side: int = 256) -> np.ndarray:
    """(H, W, 3) uint8 → min(H, W) == min_side (reference
    data/avc/sample.py:303-305 scaling, ceil semantics)."""
    h, w = frame.shape[:2]
    if min(h, w) == min_side:
        return frame
    from .data.video_io import scaled_dims

    new_w, new_h = scaled_dims(w, h, min_side)
    try:
        from PIL import Image

        return np.asarray(
            Image.fromarray(frame).resize((new_w, new_h), Image.BILINEAR)
        )
    except ImportError:
        yi = np.clip((np.arange(new_h) * h / new_h).astype(int), 0, h - 1)
        xi = np.clip((np.arange(new_w) * w / new_w).astype(int), 0, w - 1)
        return frame[yi][:, xi]


def _center_crop(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """(N, H, W, 3) → (N, size, size, 3), centered (the deterministic
    inference counterpart of training's random 224-crop,
    reference data/avc/sample.py:318-328)."""
    h, w = frames.shape[1:3]
    if h < size or w < size:
        raise ValueError(f"frames {h}x{w} smaller than crop {size}")
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return frames[:, y0 : y0 + size, x0 : x0 + size]


def preprocess_frames(frames: np.ndarray) -> np.ndarray:
    """Arbitrary-size (N|1, H, W, 3) uint8 frames → (N, 224, 224, 3):
    min-side resize to 256, center crop 224."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    if frames.shape[1:3] == (224, 224):
        return frames
    frames = np.stack([_resize_min_side(f) for f in frames])
    return _center_crop(frames)


class ImageEmbeddingModel:
    """Resident vision-embedding extractor (8192-d,
    reference vision_model.py:198-218), with the same power-of-two batch
    bucketing as the audio path so repeated calls reuse compiles."""

    def __init__(self, weights_path: str | None = None,
                 input_repr: str = "mel256",
                 model_type: str | None = None):
        import jax

        from .models import load_model, vision_embedding_fn

        self.model_type = _resolve_model_type(input_repr, model_type)
        _, variables = load_model(weights_path, self.model_type)
        self.variables = jax.device_put(variables)
        self._fn = jax.jit(vision_embedding_fn(self.model_type))

    def embed_frames(self, frames: np.ndarray) -> np.ndarray:
        """(N, 224, 224, 3) uint8 [0,255] or float [-1,1] → (N, 8192)."""
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        if frames.dtype == np.uint8:
            # Training preprocessing convention (training/steps.py).
            frames = 2.0 * (frames.astype(np.float32) / 255.0) - 1.0
        frames = frames.astype(np.float32, copy=False)
        n = frames.shape[0]
        bucket = _bucket(n)
        if bucket != n:
            frames = np.concatenate(
                [frames, np.zeros((bucket - n,) + frames.shape[1:], np.float32)]
            )
        return np.asarray(self._fn(self.variables, frames))[:n]


def get_image_embedding(
    images: np.ndarray,
    frame_rate: float | None = None,
    model: ImageEmbeddingModel | None = None,
    *,
    weights_path: str | None = None,
    input_repr: str = "mel256",
    model_type: str | None = None,
):
    """(N, H, W, 3) images (uint8 or [-1,1] float) → (N, 8192).

    Arbitrary H/W are min-side-resized to 256 and center-cropped to 224
    (uint8 only; pre-scaled float input must already be 224x224). With
    ``frame_rate`` (video frames), returns ``(embedding, timestamps)``
    where ``timestamps[k] = k / frame_rate`` — openl3's video semantics.

    A list/tuple of image arrays returns per-input results (one shared
    model — openl3's list semantics): a list of embeddings, or
    ``(embeddings, timestamps)`` lists when ``frame_rate`` is given
    (scalar or per-input list).
    """
    if model is None:
        model = ImageEmbeddingModel(weights_path, input_repr, model_type)
    if isinstance(images, (list, tuple)):
        frs = (frame_rate if isinstance(frame_rate, (list, tuple))
               else [frame_rate] * len(images))
        if len(frs) != len(images):
            raise ValueError(
                f"{len(images)} image arrays but {len(frs)} frame rates"
            )
        outs = [get_image_embedding(im, fr, model=model)
                for im, fr in zip(images, frs)]
        if frame_rate is None:
            return outs
        return [e for e, _ in outs], [t for _, t in outs]
    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = preprocess_frames(images)
    emb = model.embed_frames(images)
    if frame_rate is not None:
        ts = np.arange(emb.shape[0], dtype=np.float64) / float(frame_rate)
        return emb, ts
    return emb


def process_image_file(
    filepath: str | list[str] | tuple[str, ...],
    output_dir: str | None = None,
    suffix: str | None = None,
    model: ImageEmbeddingModel | None = None,
    *,
    overwrite: bool = True,
    **model_kwargs,
):
    """Embed image file(s) → ``<name>[_<suffix>].npz`` with key
    ``embedding`` (openl3's image on-disk convention). PNG/JPEG via PIL;
    ``.npy`` pre-decoded (H, W, 3) uint8 arrays always work."""
    paths = [filepath] if isinstance(filepath, (str, os.PathLike)) else list(filepath)
    if model is None and paths:
        model = ImageEmbeddingModel(**model_kwargs)
    outputs = []
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        name = f"{stem}_{suffix}.npz" if suffix else f"{stem}.npz"
        out = os.path.join(output_dir or os.path.dirname(path) or ".", name)
        if not overwrite and os.path.exists(out):
            outputs.append(out)
            continue
        if path.lower().endswith(".npy"):
            image = np.load(path, allow_pickle=False)
        else:
            from PIL import Image

            image = np.asarray(Image.open(path).convert("RGB"))
        emb = get_image_embedding(image, model=model)
        tmp = out + ".tmp.npz"
        np.savez(tmp, embedding=emb[0] if emb.shape[0] == 1 else emb)
        os.replace(tmp, out)
        outputs.append(out)
    if isinstance(filepath, (str, os.PathLike)):
        return outputs[0]
    return outputs


def _video_audio_track(path: str, target_sr: int) -> np.ndarray | None:
    """Mono f32 audio track of a video, or None when the container has
    no decodable audio (pre-decoded .npy frame dumps)."""
    if path.lower().endswith(".npz"):
        with np.load(path, allow_pickle=False) as obj:
            if "audio" not in obj.files:
                return None
        from .data.audio_io import load_audio

        return load_audio(path, target_sr)
    if path.lower().endswith(".npy"):
        return None
    from .data.audio_io import read_via_ffmpeg

    try:
        data, sr = read_via_ffmpeg(path, target_sr=target_sr)
    except Exception:  # no ffmpeg binary, or a video-only container
        return None
    if data.size == 0:
        return None
    return pcm2float(data[:, 0])


def _video_fps(path: str, source_fps: float | None) -> float:
    if source_fps is not None:
        return float(source_fps)
    if path.lower().endswith(".npz"):
        with np.load(path, allow_pickle=False) as obj:
            if "fps" in obj.files:
                return float(obj["fps"])
    if not path.lower().endswith((".npy", ".npz")):
        from .data.video_io import _ffprobe_path, probe_video

        if _ffprobe_path() is not None:
            return probe_video(path)[2]
    return 30.0


def process_video_file(
    filepath: str | list[str] | tuple[str, ...],
    output_dir: str | None = None,
    suffix: str | None = None,
    audio_model=None,
    image_model: ImageEmbeddingModel | None = None,
    *,
    overwrite: bool = True,
    hop_size: float = 0.1,
    frame_rate: float = 1.0,
    source_fps: float | None = None,
    **model_kwargs,
):
    """Embed both modalities of video file(s) → ``<name>_audio[_<suffix>]
    .npz`` and ``<name>_image[_<suffix>].npz`` (openl3's convention),
    each with ``embedding`` + ``timestamps`` keys.

    Frames are sampled at ``frame_rate`` fps (source fps from ffprobe,
    an ``fps`` npz key, or ``source_fps=``; defaults to 30 for bare
    ``.npy`` dumps). Containers without an audio track (``.npy``/
    audio-less ``.npz``) produce only the image file. ``model_kwargs``
    (input_repr/embedding_size/weights_path/...) build the audio model
    when ``audio_model`` is omitted; the vision model shares
    input_repr/weights_path.
    """
    from .data.video_io import read_video

    paths = [filepath] if isinstance(filepath, (str, os.PathLike)) else list(filepath)
    if image_model is None and paths:
        image_model = ImageEmbeddingModel(
            weights_path=model_kwargs.get("weights_path"),
            input_repr=model_kwargs.get("input_repr", "mel256"),
            model_type=model_kwargs.get("model_type"),
        )
    outputs = []
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        tag = f"_{suffix}" if suffix else ""
        base = output_dir or os.path.dirname(path) or "."
        out_audio = os.path.join(base, f"{stem}_audio{tag}.npz")
        out_image = os.path.join(base, f"{stem}_image{tag}.npz")
        entry = {"audio": None, "image": out_image}

        if overwrite or not os.path.exists(out_image):
            frames = read_video(path)  # may be an mmap for .npy
            fps = _video_fps(path, source_fps)
            step = max(1, int(round(fps / frame_rate)))
            sampled = np.asarray(frames[::step])  # page in only these
            emb, ts = get_image_embedding(
                sampled, frame_rate=fps / step, model=image_model
            )
            tmp = out_image + ".tmp.npz"
            np.savez(tmp, embedding=emb, timestamps=ts)
            os.replace(tmp, out_image)

        target_sr = getattr(audio_model, "sr", TARGET_SR)
        audio = _video_audio_track(path, target_sr)
        if audio is not None:
            entry["audio"] = out_audio
            if overwrite or not os.path.exists(out_audio):
                if audio_model is None:
                    audio_model = load_audio_embedding_model(**model_kwargs)
                emb, ts = get_audio_embedding(
                    audio, target_sr, model=audio_model, hop_size=hop_size
                )
                tmp = out_audio + ".tmp.npz"
                np.savez(tmp, embedding=emb, timestamps=ts)
                os.replace(tmp, out_audio)
        outputs.append(entry)
    if isinstance(filepath, (str, os.PathLike)):
        return outputs[0]
    return outputs


def main(argv=None):
    """openl3-style CLI: ``python -m l3embedding_tpu.api FILES...``."""
    import argparse

    p = argparse.ArgumentParser(
        prog="l3embedding_tpu.api",
        description="Extract L3 embeddings from audio/image/video files "
        "(one .npz per input, openl3 on-disk conventions).",
    )
    p.add_argument("inputs", nargs="+", help="audio/image/video files")
    p.add_argument("--modality", choices=["audio", "image", "video"],
                   default="audio")
    p.add_argument("--weights-path", default=None,
                   help=".ckpt pytree or reference Keras .h5")
    p.add_argument("--input-repr", default="mel256",
                   choices=sorted(INPUT_REPRS))
    p.add_argument("--embedding-size", type=int, default=512,
                   choices=sorted(AUDIO_EMBEDDING_SIZES))
    p.add_argument("--model-type", default=None,
                   help="registry name override (e.g. tiny_L3)")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--suffix", default=None)
    p.add_argument("--hop-size", type=float, default=0.1)
    p.add_argument("--no-centering", action="store_true")
    p.add_argument("--video-frame-rate", type=float, default=1.0,
                   help="frames/sec to embed from videos")
    p.add_argument("--fast", action="store_true", help="bf16 tower")
    p.add_argument("--int8-artifact", default=None,
                   help="calibrated int8 deployment artifact")
    p.add_argument("--no-overwrite", action="store_true")
    args = p.parse_args(argv)

    common = dict(output_dir=args.output_dir, suffix=args.suffix,
                  overwrite=not args.no_overwrite)
    if args.modality == "image":
        outs = process_image_file(
            list(args.inputs),
            weights_path=args.weights_path, input_repr=args.input_repr,
            model_type=args.model_type, **common)
    elif args.modality == "video":
        entries = process_video_file(
            list(args.inputs), hop_size=args.hop_size,
            frame_rate=args.video_frame_rate,
            weights_path=args.weights_path, input_repr=args.input_repr,
            embedding_size=args.embedding_size, model_type=args.model_type,
            fast=args.fast, int8_artifact=args.int8_artifact, **common)
        outs = [o for e in entries
                for o in (e["audio"], e["image"]) if o]
    else:
        model = load_audio_embedding_model(
            args.weights_path, args.input_repr, args.embedding_size,
            model_type=args.model_type, fast=args.fast,
            int8_artifact=args.int8_artifact)
        outs = process_audio_file(
            list(args.inputs), model=model, hop_size=args.hop_size,
            center=not args.no_centering, **common)
    for out in outs:
        print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
