"""Multi-host initialization.

The reference never runs multi-node training (single-node in-graph GPU
replication only; SURVEY.md §2.6). The TPU-native design extends to
multi-host pods for free: once `initialize_distributed()` has run on
every host, `jax.devices()` spans the pod and the existing
mesh/pjit/train-step code paths shard across it unchanged — the
gradient psum and BN sync ride ICI within a slice and DCN across
slices, chosen by XLA from the mesh layout.

On single-host (including this framework's tests and the v5e-8 target
configuration) this is a no-op.
"""

from __future__ import annotations

import logging
import os

import jax

LOGGER = logging.getLogger("l3embedding_tpu.parallel")


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running in a multi-host job.

    Detection order: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars → TPU pod metadata
    (handled by jax.distributed.initialize() itself with no args).
    Returns True if distributed mode was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Single-host / auto-detected TPU pod: only initialize when the
        # runtime says we're part of a pod job.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") == 0:
            return False
        try:
            jax.distributed.initialize()
            LOGGER.info(
                "jax.distributed initialized (auto): process %d/%d",
                jax.process_index(), jax.process_count(),
            )
            return True
        except Exception as e:  # pragma: no cover - env dependent
            LOGGER.warning("jax.distributed auto-init failed: %s", e)
            return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    LOGGER.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(), jax.process_count(),
    )
    return True
