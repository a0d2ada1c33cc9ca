"""Device-mesh parallelism: the TPU-native replacement for the
reference's in-graph GPU replication (reference
l3embedding/training_utils.py:21-170)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
    shard_batch_local,
)
