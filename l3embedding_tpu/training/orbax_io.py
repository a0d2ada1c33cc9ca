"""Optional orbax checkpoint backend.

The default checkpoint format (training/checkpoints.py) is flax msgpack —
single-file, atomic, dependency-light, and ample for L3-scale models
(~9M params). For larger models or async/multi-host checkpointing, this
module provides the same save/load surface backed by
orbax.checkpoint.StandardCheckpointer (directory-per-snapshot).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state_orbax(path: str, state) -> None:
    """Write {step, params, batch_stats, opt_state} as an orbax dir."""
    ckptr = _checkpointer()
    payload = {
        "step": np.asarray(state.step),
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    path = os.path.abspath(path)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str, state):
    """Restore into a template AVCTrainState."""
    ckptr = _checkpointer()
    template = {
        "step": np.asarray(state.step),
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
