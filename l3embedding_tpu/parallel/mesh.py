"""Mesh construction and sharding rules.

The reference scales with single-node data parallelism by replicating the
Keras graph once per GPU, slicing the input batch with tf.slice and
concatenating outputs on the CPU (reference training_utils.py:121-170) —
gradient aggregation happens implicitly through backprop into shared
variables hosted on one device.

The TPU-native design: one jitted train step, parameters replicated,
batch sharded over a ('data',) mesh axis. XLA inserts psum over ICI for
the gradient reduction — no replication machinery, no per-topology
weight surgery (reference model.py:38-82 becomes obsolete: checkpointed
pytrees are topology-independent).

An optional 'model' axis is reserved for sharding the widest layers
(block-4 convs / dense head) when chips-per-replica > 1; the L3 family
is small enough that pure DP is the production configuration, matching
SURVEY.md §2.6 (TP/PP/SP/EP: N/A for parity).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices=None, data_axis: int | None = None, model_axis: int = 1
) -> Mesh:
    """Build a (data[, model]) mesh over the available devices.

    By default all devices go on the 'data' axis. Pass model_axis > 1 to
    carve a model-parallel dimension out of the device grid.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_axis is None:
        if n % model_axis:
            raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
        data_axis = n // model_axis
    grid = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a leading-batch-dim array: batch split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Device_put a host batch with the batch dim split over 'data'.

    Works for dict / tuple pytrees whose leaves all have a leading batch
    dimension divisible by the data-axis size. Single-process form: the
    caller holds the full global batch. For multi-host pods use
    shard_batch_local.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch_local(local_batch, mesh: Mesh):
    """Assemble a global batch-sharded array from PER-PROCESS data.

    Multi-host form of shard_batch: every process passes only its own
    slice of the global batch (global_batch // process_count rows,
    e.g. from `data_generator(..., shard_index=process_index,
    shard_count=process_count)`), and the returned jax.Arrays are
    globally sharded over the mesh's 'data' axis without any host ever
    materializing the full batch. On a single process this degenerates
    to shard_batch exactly.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )
