"""l3embedding_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for deep
audio-visual embeddings.

Re-implements the full capability surface of marl/l3embedding — the
Audio-Visual Correspondence (AVC) self-supervised training pipeline, the
L3 audio/vision embedding model zoo, the downstream urban-sound
classification stack, and the VGGish baseline — designed from scratch for
TPU hardware:

  * The spectrogram/mel front-end is a framing + DFT-as-matmul formulation
    that runs on the MXU (with a fused Pallas kernel for the hot path),
    replacing the reference's kapre TF-op layers
    (reference: l3embedding/audio_model.py:28-43).
  * Models are flax modules compiled once under jit; NHWC layout.
  * Data parallelism is jax.sharding/pjit over a device mesh with XLA
    collectives over ICI, replacing in-graph replication
    (reference: l3embedding/training_utils.py:21-170).
  * Checkpoints are topology-independent pytrees (orbax), making the
    reference's multi-GPU weight conversion machinery obsolete
    (reference: l3embedding/model.py:38-82).
"""

__version__ = "0.1.0"
