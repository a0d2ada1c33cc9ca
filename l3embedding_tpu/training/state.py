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


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    # Keras 2.0.9 Adam defaults (reference train.py:282): beta1=0.9,
    # beta2=0.999, eps=1e-8. L2 regularization enters through the loss
    # (Keras adds kernel_regularizer losses to the objective), not as
    # decoupled weight decay.
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


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
