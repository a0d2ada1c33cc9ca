"""Checkpointing: topology-independent pytree snapshots + run artifacts.

The reference keeps 4 Keras weight files per run (latest / best-val-acc /
best-val-loss / periodic; reference l3embedding/train.py:316-355). We
keep the same four roles with the same filenames (`.ckpt` instead of
`.h5`) so the CLI surface and resume logic carry over. Snapshots are
flax msgpack pytrees written atomically (tmp + rename); they restore
onto any mesh because sharding is applied at load time, not bake time.
"""

from __future__ import annotations

import os

import flax.serialization
import jax
import numpy as np

LATEST = "model_latest.ckpt"
BEST_VALID_ACC = "model_best_valid_accuracy.ckpt"
BEST_VALID_LOSS = "model_best_valid_loss.ckpt"
PERIODIC_FMT = "model_checkpoint.{epoch:02d}.ckpt"


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def save_state(path: str, state) -> None:
    """Atomically serialize {step, params, batch_stats, opt_state}."""
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    blob = flax.serialization.to_bytes(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_state(path: str, state):
    """Restore into a template AVCTrainState (created by
    create_train_state); returns the updated state."""
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = flax.serialization.from_bytes(_to_host(template), blob)
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def save_variables(path: str, params, batch_stats) -> None:
    """Weights-only snapshot (for embedding extraction / export)."""
    blob = flax.serialization.to_bytes(
        _to_host({"params": params, "batch_stats": batch_stats})
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_variables(path: str, template_variables):
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "params": template_variables["params"],
        "batch_stats": template_variables["batch_stats"],
    }
    restored = flax.serialization.from_bytes(_to_host(template), blob)
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
