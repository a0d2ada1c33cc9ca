"""Training state: parameters + BN statistics + optimizer state as one
topology-independent pytree.

Replaces the reference's Keras compile/checkpoint machinery
(reference l3embedding/train.py:282-284, 316-355). Because the state is
a plain pytree sharded by pjit at run time, the reference's
multi-GPU↔single-GPU weight conversions (model.py:38-82 and the
convert_multigpu_singlegpu notebook) have no equivalent here — the same
checkpoint restores onto any mesh.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class AVCTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    learning_rate: float, flatten: bool = False
) -> optax.GradientTransformation:
    # Keras 2.0.9 Adam defaults (reference train.py:282): beta1=0.9,
    # beta2=0.999, eps=1e-8. L2 regularization enters through the loss
    # (Keras adds kernel_regularizer losses to the objective), not as
    # decoupled weight decay.
    #
    # flatten=True runs the update on one contiguous vector instead of
    # per-leaf kernels (optax.flatten; mathematically identical — pinned
    # by tests/test_training.py::test_flattened_optimizer_equivalence).
    # Measured on the v5e melspec2 step it *loses*: the gradient
    # ravel+concat appears as a 7.1 ms data-formatting pass (tiled→linear
    # relayout per leaf), more than the ~5 ms of per-leaf update kernels
    # it replaces (174.4 vs 166.9 ms/step; tools/profile_step.py). Kept
    # selectable for re-evaluation on other hardware. Note the opt_state
    # pytree differs between the two settings, so a checkpoint written
    # with one cannot restore onto the other.
    tx = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    return optax.flatten(tx) if flatten else tx


def create_train_state(
    model, rng, video_shape, audio_shape, learning_rate: float
) -> AVCTrainState:
    video = jnp.zeros((1,) + tuple(video_shape), jnp.float32)
    audio = jnp.zeros((1,) + tuple(audio_shape), jnp.float32)
    variables = model.init(rng, video, audio, train=False)
    tx = make_optimizer(learning_rate)
    return AVCTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
