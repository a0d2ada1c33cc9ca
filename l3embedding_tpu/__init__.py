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

import os as _os

_forced = _os.environ.get("L3_FORCE_PLATFORM")
if _forced:
    # Test/CI hook honored by every CLI and tool that imports this
    # package: pin the JAX backend before anything initializes it. On
    # the dev image the JAX_PLATFORMS env var alone is NOT enough — a
    # sitecustomize registers the axon TPU tunnel plugin at interpreter
    # start and the first backend lookup still initializes (and, during
    # a tunnel outage, hangs on) it unless the config is pinned first.
    # Tests that spawn CLI subprocesses set L3_FORCE_PLATFORM=cpu so a
    # suite run can never ride — or be wedged by — the TPU tunnel.
    _os.environ["JAX_PLATFORMS"] = _forced

    import jax as _jax

    _jax.config.update("jax_platforms", _forced)
