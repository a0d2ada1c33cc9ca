"""Downstream feature computation and preprocessing
(reference data/usc/features.py).

`compute_file_features` dispatches 'l3' (our EmbeddingExtractor) or
'vggish' (the flax VGGish port). Preprocessing (overlap removal,
framewise↔stats modes, MinMax/Standard scaling, label expansion, train
shuffle) matches the reference's sklearn-based semantics exactly — this
is cheap host-side work and sklearn on CPU is the right tool
(SURVEY.md §2.3)."""

from __future__ import annotations

import logging

import numpy as np
import scipy.stats
from sklearn.preprocessing import MinMaxScaler, StandardScaler

from ..audio_io import load_audio

LOGGER = logging.getLogger("l3embedding_tpu.cls-data")


def one_hot(idx, n_classes=10):
    y = np.zeros((n_classes,))
    y[idx] = 1
    return y


def sample_non_overlap_file(X, chunk_size=10):
    """First frame of every chunk_size-frame chunk
    (reference features.py:52-57)."""
    return np.array([X[i] for i in range(0, len(X), chunk_size)])


def remove_data_overlap(data, chunk_size=10):
    """Decimate overlapping frames per file, in place
    (reference features.py:60-74)."""
    X, file_idxs = [], []
    new_start = 0
    for start, end in data["file_idxs"]:
        feats = sample_non_overlap_file(data["features"][start:end], chunk_size)
        X.append(feats)
        file_idxs.append([new_start, new_start + feats.shape[0]])
        new_start += feats.shape[0]
    data["features"] = np.vstack(X)
    data["file_idxs"] = np.array(file_idxs)


def compute_stats_features(embeddings):
    """7 summary stats over the frame axis (reference features.py:243-253)."""
    return np.concatenate(
        (
            np.min(embeddings, axis=0),
            np.max(embeddings, axis=0),
            np.median(embeddings, axis=0),
            np.mean(embeddings, axis=0),
            np.var(embeddings, axis=0),
            scipy.stats.skew(embeddings, axis=0),
            scipy.stats.kurtosis(embeddings, axis=0),
        )
    )


def framewise_to_stats(data):
    X = [
        compute_stats_features(data["features"][start:end])
        for start, end in data["file_idxs"]
    ]
    data["features"] = np.vstack(X)
    idxs = np.arange(data["features"].shape[0])
    data["file_idxs"] = np.column_stack((idxs, idxs + 1))


def expand_framewise_labels(data):
    labels = [
        np.tile(y, end - start)
        for y, (start, end) in zip(data["labels"], data["file_idxs"])
    ]
    data["labels"] = np.concatenate(labels)


def preprocess_split_data(
    train_data,
    valid_data,
    test_data,
    feature_mode="framewise",
    non_overlap=False,
    non_overlap_chunk_size=10,
    use_min_max=False,
):
    """Mutating preprocessing pipeline (reference features.py:98-163):
    overlap removal → optional MinMax → framewise/stats mode → Standard
    scaling → train shuffle. Returns the fitted scalers for persistence.
    """
    if non_overlap:
        remove_data_overlap(train_data, chunk_size=non_overlap_chunk_size)
        if valid_data:
            remove_data_overlap(valid_data, chunk_size=non_overlap_chunk_size)
        remove_data_overlap(test_data, chunk_size=non_overlap_chunk_size)

    min_max_scaler = MinMaxScaler()
    if use_min_max:
        train_data["features"] = min_max_scaler.fit_transform(train_data["features"])
        if valid_data:
            valid_data["features"] = min_max_scaler.transform(valid_data["features"])
        test_data["features"] = min_max_scaler.transform(test_data["features"])

    if feature_mode == "framewise":
        expand_framewise_labels(train_data)
        if valid_data:
            expand_framewise_labels(valid_data)
    elif feature_mode == "stats":
        framewise_to_stats(train_data)
        if valid_data:
            framewise_to_stats(valid_data)
        framewise_to_stats(test_data)
    else:
        raise ValueError(f"Invalid feature mode: {feature_mode}")

    stdizer = StandardScaler()
    train_data["features"] = stdizer.fit_transform(train_data["features"])
    if valid_data:
        valid_data["features"] = stdizer.transform(valid_data["features"])
    test_data["features"] = stdizer.transform(test_data["features"])

    num_train = len(train_data["labels"])
    shuffle_idxs = np.random.permutation(num_train)
    reverse = np.argsort(shuffle_idxs)
    train_data["features"] = train_data["features"][shuffle_idxs]
    train_data["labels"] = train_data["labels"][shuffle_idxs]
    train_data["file_idxs"] = [
        reverse[slice(*pair)] for pair in train_data["file_idxs"]
    ]
    return min_max_scaler, stdizer


def preprocess_features(data, min_max_scaler, stdizer, feature_mode="framewise"):
    """Apply previously-fitted scalers + feature mode to new data.

    Fixed vs the reference (features.py:152-163), which called
    min_max_scaler.fit_transform here — REFITTING the "previously-
    fitted" scaler on the new data's own min/max (and silently applying
    min-max even when training skipped it), then standardizing inputs
    whose distribution no longer matches what stdizer was fitted on.
    (Dead code there; a real API here, so it does what it says.)"""
    # preprocess_split_data returns an UNFITTED MinMaxScaler when
    # use_min_max=False — only apply a scaler that was actually fitted.
    if min_max_scaler is not None and hasattr(min_max_scaler, "data_min_"):
        data["features"] = min_max_scaler.transform(data["features"])
    if feature_mode == "framewise":
        expand_framewise_labels(data)
    elif feature_mode == "stats":
        framewise_to_stats(data)
    else:
        raise ValueError(f"Invalid feature mode: {feature_mode}")
    data["features"] = stdizer.transform(data["features"])


def flatten_file_frames(X, y):
    """Flatten per-file frame features and repeat labels per frame
    (reference features.py:329-365)."""
    if X.ndim == 1:
        num_frames_per_file = []
        X_flat = []
        for X_file in X:
            num_frames_per_file.append(len(X_file))
            X_flat += list(X_file)
        X_flat = np.array(X_flat)
    else:
        num_files, num_frames_per_file = X.shape[0], X.shape[1]
        X_flat = X.reshape((num_files * num_frames_per_file,) + X.shape[2:])
    y_flat = np.repeat(y, num_frames_per_file)
    return X_flat, y_flat


def get_l3_frames_uniform(audio, extractor, hop_size=0.1, sr=48000,
                          defer=False):
    """L3 embedding per overlapping 1 s window
    (reference features.py:256-306); `extractor` is an
    embed.EmbeddingExtractor. defer=True returns a lazy device handle
    (np.asarray materializes) so a file loop can overlap this file's
    device compute with the previous file's npz write."""
    if isinstance(audio, str):
        audio = load_audio(audio, sr)
    if defer:
        return extractor.embed_audio_async(audio, hop_size=hop_size)
    return extractor.embed_audio(audio, hop_size=hop_size)


def get_vggish_frames_uniform(audio_path, hop_size=0.1, resources_dir=None):
    """VGGish embedding frames (reference features.py:166-238), via the
    flax port — one resident model, not a fresh graph per file."""
    from ...models.vggish import VGGishExtractor

    extractor = VGGishExtractor.get_cached(resources_dir)
    return extractor.embed_file(audio_path, hop_size=hop_size)


def compute_file_features(path, feature_type, l3embedding_model=None,
                           defer=False, **feature_args):
    """Dispatch (reference features.py:309-323). `l3embedding_model` is
    an EmbeddingExtractor (name kept for CLI-surface parity).

    defer=True may return a lazy device handle instead of an ndarray
    (np.asarray materializes it) — used by the datasets' write-behind
    file loops. Feature types without an async path return a plain
    ndarray, which duck-types as an already-materialized handle."""
    if feature_type == "l3":
        if not l3embedding_model:
            raise ValueError(
                f"Must provide L3 embedding model to use {feature_type} features"
            )
        hop_size = feature_args.get("hop_size", 0.1)
        return get_l3_frames_uniform(path, l3embedding_model,
                                     hop_size=hop_size, defer=defer)
    elif feature_type == "vggish":
        hop_size = feature_args.get("hop_size", 0.1)
        return get_vggish_frames_uniform(
            path, hop_size=hop_size,
            resources_dir=feature_args.get("resources_dir"),
        )
    raise ValueError(f"Invalid feature type: {feature_type}")
