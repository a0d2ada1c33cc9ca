"""Tensor parallelism over the mesh's 'model' axis.

The L3 family needs only data parallelism for parity (SURVEY.md §2.6),
but the mesh reserves a 'model' axis and this module gives it real
semantics: the widest parameters — the block-4 convs / embedding convs
(512 output channels) and the merge-head dense kernels — are sharded
over 'model', and XLA's sharding propagation inserts the all-gathers /
reduce-scatters where activations change layout. Everything else stays
replicated. With model_axis=1 this degrades to pure DP.

This is layout-only: the train step, model code, and checkpoints are
unchanged (checkpoints save gathered host arrays, so snapshots remain
topology-independent).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Parameters worth sharding: (path-suffix match, PartitionSpec).
# Conv kernels are HWIO. The block-4 convs (ConvBNRelu_6, 256→512 in both
# towers) shard their *output* channels — along with their bias and BN
# vectors so the whole channel-sharded layer group stays local. The
# embedding convs then shard their *input* dim (consuming the sharded
# activations; XLA inserts the psum over the contraction). merge_dense
# kernels shard the input dim — partial products reduce into the 128-d
# head. Tiny towers' 'embedding_conv' gets the output-shard rule so the
# model axis carries real shardings in the cheap dry-run config too.
_RULES = (
    (("ConvBNRelu_6", "Conv_0", "kernel"), P(None, None, None, "model")),
    (("ConvBNRelu_6", "Conv_0", "bias"), P("model")),
    (("ConvBNRelu_6", "BatchNorm_0", "scale"), P("model")),
    (("ConvBNRelu_6", "BatchNorm_0", "bias"), P("model")),
    (("ConvBNRelu_6", "BatchNorm_0", "mean"), P("model")),
    (("ConvBNRelu_6", "BatchNorm_0", "var"), P("model")),
    (("audio_embedding_layer", "kernel"), P(None, None, "model", None)),
    (("vision_embedding_layer", "kernel"), P(None, None, "model", None)),
    (("embedding_conv", "kernel"), P(None, None, None, "model")),
    (("embedding_conv", "bias"), P("model")),
    (("merge_dense", "kernel"), P("model", None)),
)


def _spec_for(path) -> P | None:
    keys = tuple(getattr(p, "key", "") for p in path)
    for suffix, spec in _RULES:
        if keys[-len(suffix):] == suffix:
            return spec
    return None


def tp_shard_state(state, mesh: Mesh):
    """Place a train state on the mesh with model-axis sharding applied
    to the widest parameters (and their Adam moments); everything else
    replicated. Batch sharding over 'data' is unchanged."""
    replicated = NamedSharding(mesh, P())

    def place(tree):
        def leaf(path, x):
            spec = _spec_for(path)
            sh = NamedSharding(mesh, spec) if spec is not None else replicated
            return jax.device_put(x, sh)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    return state.replace(
        step=jax.device_put(state.step, replicated),
        params=place(state.params),
        batch_stats=place(state.batch_stats),
        opt_state=place(state.opt_state),
    )
