"""Jitted AVC train/eval steps.

Design notes (TPU-first):
  * Raw batches cross the PCIe/host boundary in their storage dtypes
    (video uint8, audio int16) and are converted to float *on device*
    inside the jitted step — 4x/2x less host→device traffic than the
    reference, which converts in the Python generator before feeding TF
    (reference l3embedding/train.py:186-189).
  * L2 regularization (1e-5 on conv/dense kernels, reference
    audio_model.py:24 etc.) is added to the loss exactly like Keras
    kernel_regularizer: wd * sum(w^2), no 1/2 factor.
  * Loss is softmax cross-entropy on logits == categorical crossentropy
    on the reference's softmax outputs (including its two-class
    "twice the loss" behavior, reference train.py:269).
  * Under a sharded batch, BatchNorm statistics are computed over the
    *global* batch (XLA inserts the cross-replica reduction over ICI).
    The reference's per-replica BN (an artifact of in-graph replication)
    is strictly noisier; sync-BN is the TPU-native semantics and keeps
    results independent of mesh size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

WEIGHT_DECAY = 1e-5


def preprocess_batch(video, audio):
    """On-device conversion to the reference's float conventions:
    video uint8 → [-1, 1] (train.py:186), audio int16 → [-1, 1)
    (audio.py:1-31 pcm2float)."""
    if video.dtype == jnp.uint8:
        video = 2.0 * (video.astype(jnp.float32) / 255.0) - 1.0
    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    return video, audio


def l2_penalty(params):
    """Keras-style kernel L2: applies to conv/dense kernels only."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        if path and getattr(path[-1], "key", None) == "kernel":
            total = total + jnp.sum(jnp.square(leaf))
    return WEIGHT_DECAY * total


def make_train_step(
    model,
    donate: bool = True,
    accum_steps: int = 1,
    bn_mode: str = "sync",
    mesh=None,
):
    """Returns jitted fn(state, batch) -> (state, metrics).

    batch: dict with 'video' (B,224,224,3 uint8|f32), 'audio'
    (B,1,48000 int16|f32), 'label' (B,2 float).

    accum_steps > 1 splits the batch into that many microbatches and
    accumulates gradients under lax.scan before one optimizer update —
    large effective batches at microbatch-sized activation memory (and,
    in this dev environment, beyond the remote compiler's per-program
    batch ceiling; docs/ROUND_NOTES.md). BatchNorm statistics update
    sequentially per microbatch (momentum applied accum_steps times per
    step), matching what sequential small batches would do.

    bn_mode='per_replica' (requires `mesh`) reproduces the reference's
    BN semantics for apples-to-apples training-curve comparison: each
    replica of the in-graph-replicated Keras model computed BN batch
    statistics on its own slice of the batch (reference
    training_utils.py:121-170). The step runs under shard_map so BN sees
    only the local shard; gradients/metrics are pmean'd across replicas,
    and the (per-replica) running-stat updates are averaged into the
    single stored pytree — the deterministic stand-in for Keras's
    racy shared-variable assignment. Default 'sync' computes BN over the
    global batch (XLA cross-replica reduction), the TPU-native choice.
    """
    if bn_mode == "per_replica":
        if accum_steps > 1:
            raise NotImplementedError(
                "per_replica BN with gradient accumulation"
            )
        if mesh is None:
            raise ValueError("bn_mode='per_replica' requires a mesh")
        return _make_per_replica_train_step(model, donate, mesh)
    if bn_mode != "sync":
        raise ValueError(f"unknown bn_mode {bn_mode!r}")
    if accum_steps > 1:
        return _make_accum_train_step(model, donate, accum_steps)

    def train_step(state, batch):
        video, audio = preprocess_batch(batch["video"], batch["audio"])
        labels = batch["label"].astype(jnp.float32)

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                video,
                audio,
                train=True,
                mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy(logits, labels).mean()
            loss = ce + l2_penalty(params)
            return loss, (logits, updates["batch_stats"], ce)

        (loss, (logits, new_bs, ce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(jnp.float32)
        )
        metrics = {"loss": ce, "acc": acc, "reg_loss": loss - ce}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _make_per_replica_train_step(model, donate: bool, mesh):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if "model" in mesh.shape and mesh.shape["model"] != 1:
        raise ValueError("per_replica BN supports data-parallel meshes only")

    def shard_fn(params, batch_stats, video, audio, label):
        video, audio = preprocess_batch(video, audio)
        labels = label.astype(jnp.float32)

        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                video,
                audio,
                train=True,
                mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy(logits, labels).mean()
            return ce + l2_penalty(p), (updates["batch_stats"], logits, ce)

        (loss, (new_bs, logits, ce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(
                jnp.float32
            )
        )
        pmean = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.lax.pmean(x, "data"), t
        )
        metrics = pmean({"loss": ce, "acc": acc, "reg_loss": loss - ce})
        return pmean(grads), pmean(new_bs), metrics

    def train_step(state, batch):
        grads, new_bs, metrics = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(
            state.params,
            state.batch_stats,
            batch["video"],
            batch["audio"],
            batch["label"],
        )
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _make_accum_train_step(model, donate: bool, accum_steps: int):
    def train_step(state, batch):
        def reshape(x):
            b = x.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch size {b} not divisible by accum_steps "
                    f"{accum_steps}"
                )
            return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

        micro = jax.tree.map(reshape, batch)

        def loss_fn(params, batch_stats, mb):
            video, audio = preprocess_batch(mb["video"], mb["audio"])
            labels = mb["label"].astype(jnp.float32)
            logits, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                video,
                audio,
                train=True,
                mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy(logits, labels).mean()
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(
                    jnp.float32
                )
            )
            return ce + l2_penalty(params), (updates["batch_stats"], ce, acc)

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def body(carry, mb):
            grads_acc, batch_stats = carry
            grads, (new_bs, ce, acc) = grad_fn(state.params, batch_stats, mb)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_bs), (ce, acc)

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads_sum, new_bs), (ces, accs) = jax.lax.scan(
            body, (zero_grads, state.batch_stats), micro
        )
        grads = jax.tree.map(lambda g: g / accum_steps, grads_sum)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {
            "loss": ces.mean(),
            "acc": accs.mean(),
            "reg_loss": l2_penalty(state.params),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Returns jitted fn(state, batch) -> metrics (loss without L2 term,
    matching Keras val_loss which does include regularization... see note).

    Keras's reported val_loss includes the regularization term (the
    compiled loss adds layer losses in both phases), so we add it here
    too for history-file parity.
    """

    def eval_step(state, batch):
        video, audio = preprocess_batch(batch["video"], batch["audio"])
        labels = batch["label"].astype(jnp.float32)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            video,
            audio,
            train=False,
        )
        ce = optax.softmax_cross_entropy(logits, labels).mean()
        loss = ce + l2_penalty(state.params)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(jnp.float32)
        )
        return {"loss": loss, "acc": acc}

    return jax.jit(eval_step)
