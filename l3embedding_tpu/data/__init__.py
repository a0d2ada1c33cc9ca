"""Data layers: AudioSet curation, AVC sample factory, downstream (USC)
dataset feature generation, host-side audio/video IO."""
