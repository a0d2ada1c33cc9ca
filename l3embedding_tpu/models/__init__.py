"""L3 model zoo: flax audio/vision towers, AVC head, registry, embedding
extractors, and the VGGish baseline."""

from .registry import MODELS, ModelSpec, build_model  # noqa: F401
from .embedding import (  # noqa: F401
    AUDIO_POOLINGS,
    VISION_POOLING,
    audio_embedding_fn,
    vision_embedding_fn,
)
from .loading import load_embedding, load_model  # noqa: F401
