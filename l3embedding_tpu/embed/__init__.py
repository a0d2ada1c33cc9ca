"""Embedding extraction: windowed batched inference over audio files."""

from .extract import EmbeddingExtractor, frame_uniform  # noqa: F401
from .quantized import (  # noqa: F401
    QuantizedAudioEmbedder,
    QuantizedEmbeddingExtractor,
)
from .stream import StreamingEmbedder  # noqa: F401
