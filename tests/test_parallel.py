"""Data-parallel semantics on the virtual 8-device mesh.

Key property of the TPU-native design: results are independent of mesh
size. Because BatchNorm statistics are computed over the global batch
(XLA inserts the cross-replica reduction) and gradients are psum'd, a
train step on 8 devices must match the same step on 1 device bit-for-
tolerance — unlike the reference's per-replica BN under in-graph
replication (reference training_utils.py:21-170)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l3embedding_tpu.models import build_model
from l3embedding_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from l3embedding_tpu.training.state import create_train_state
from l3embedding_tpu.training.steps import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    spec = build_model("tiny_L3")
    model = spec.module()
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        spec.video_input_shape,
        spec.audio_input_shape,
        learning_rate=1e-3,
    )
    rng = np.random.RandomState(0)
    batch = {
        "video": rng.randint(0, 256, size=(16, 224, 224, 3)).astype(np.uint8),
        "audio": (rng.randn(16, 1, 48000) * 3000).astype(np.int16),
        "label": np.stack(
            [rng.randint(0, 2, 16)] * 2, axis=1
        ).astype(np.float32),
    }
    batch["label"][:, 1] = 1 - batch["label"][:, 0]
    return model, state, batch


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data", "model")
    mesh2 = create_mesh(model_axis=2)
    assert mesh2.shape["data"] == jax.device_count() // 2
    assert mesh2.shape["model"] == 2


def test_shard_batch_layout(setup):
    _, _, batch = setup
    mesh = create_mesh()
    sharded = shard_batch(batch, mesh)
    sh = sharded["video"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), ndim=4)
    np.testing.assert_array_equal(np.asarray(sharded["video"]), batch["video"])


def test_train_step_mesh_invariance(setup):
    model, state, batch = setup
    train_step_1 = make_train_step(model, donate=False)
    # Single device.
    state1, metrics1 = train_step_1(state, batch)

    # 8-device mesh: replicated state, sharded batch.
    mesh = create_mesh()
    state8 = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    train_step_8 = make_train_step(model, donate=False)
    state8_new, metrics8 = train_step_8(state8, sharded)

    # Same loss/acc: sync-BN + psum make the computation mesh-size
    # independent.
    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics1["acc"]), float(metrics8["acc"]), rtol=0
    )

    # Gradients are mesh-size independent up to f32 reduction-order
    # noise. (Raw parameters after an Adam step are NOT comparable
    # elementwise: with near-zero grads, Adam normalizes sign noise to
    # full-size updates — so the invariance check belongs on grads.)
    import optax

    def loss_fn(params, batch_stats, video, audio, label):
        from l3embedding_tpu.training.steps import l2_penalty, preprocess_batch

        v, a = preprocess_batch(video, audio)
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            v, a, train=True, mutable=["batch_stats"],
        )
        ce = optax.softmax_cross_entropy(logits, label).mean()
        return ce + l2_penalty(params)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g1 = grad_fn(state.params, state.batch_stats,
                 batch["video"], batch["audio"], batch["label"])
    sharded = shard_batch(batch, mesh)
    g8 = grad_fn(state8.params, state8.batch_stats,
                 sharded["video"], sharded["audio"], sharded["label"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(jax.device_get(g8))):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=max(2e-4 * scale, 1e-5), rtol=1e-2)


def test_eval_step_on_mesh(setup):
    model, state, batch = setup
    mesh = create_mesh()
    state8 = replicate(state, mesh)
    eval_step = make_eval_step(model)
    m = eval_step(state8, shard_batch(batch, mesh))
    m1 = eval_step(state, batch)
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]), rtol=1e-5)


def test_checkpoint_is_topology_independent(setup, tmp_path):
    from l3embedding_tpu.training import checkpoints

    model, state, batch = setup
    mesh = create_mesh()
    # Save from a mesh-replicated state, restore onto a plain one.
    state8 = replicate(state, mesh)
    path = str(tmp_path / "state.ckpt")
    checkpoints.save_state(path, state8)
    restored = checkpoints.load_state(path, state)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tensor_parallel_matches_dp(setup):
    """Model-axis sharding of the widest parameters (parallel/tp.py) must
    produce the same step results as pure DP — XLA inserts the layout
    collectives, the math is unchanged."""
    from l3embedding_tpu.parallel.tp import tp_shard_state

    model, state, batch = setup
    mesh = create_mesh(model_axis=2)  # (data=4, model=2)

    step = make_train_step(model, donate=False)
    # Pure DP on the same 2D mesh.
    dp_state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    _, m_dp = step(dp_state, sharded)

    tp_state = tp_shard_state(state, mesh)
    new_tp, m_tp = step(tp_state, sharded)

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_dp["acc"]), float(m_tp["acc"]), rtol=0
    )
    # Sharded params survived the update with correct values vs host DP.
    _, m_tp2 = step(new_tp, sharded)
    assert np.isfinite(float(m_tp2["loss"]))


def test_per_replica_bn_mode(setup):
    """bn_mode='per_replica' (reference training_utils.py:121-170
    semantics): BN statistics come from each replica's batch slice. On a
    1-replica mesh it must equal sync-BN exactly; on 8 replicas the
    running stats must differ from sync-BN (local vs global batch
    statistics) while gradients stay pmean'd and metrics finite."""
    model, state, batch = setup

    mesh8 = create_mesh(jax.devices()[:8], model_axis=1)
    state8 = replicate(state, mesh8)
    sharded8 = shard_batch(batch, mesh8)

    sync_step = make_train_step(model, donate=False)
    pr_step = make_train_step(
        model, donate=False, bn_mode="per_replica", mesh=mesh8
    )

    s_sync, m_sync = sync_step(state8, sharded8)
    s_pr, m_pr = pr_step(state8, sharded8)

    assert np.isfinite(float(m_pr["loss"])) and np.isfinite(
        float(m_pr["acc"])
    )
    # Same data, same params: the loss (pre-update forward) differs only
    # through BN batch statistics — local vs global. They must disagree.
    bn_sync = jax.device_get(s_sync.batch_stats)
    bn_pr = jax.device_get(s_pr.batch_stats)
    diffs = [
        np.max(np.abs(a - b))
        for a, b in zip(jax.tree.leaves(bn_sync), jax.tree.leaves(bn_pr))
    ]
    assert max(diffs) > 1e-6, "per-replica BN stats identical to sync BN"

    # Single-replica mesh: per_replica degenerates to sync exactly.
    mesh1 = create_mesh(jax.devices()[:1], model_axis=1)
    state1 = replicate(state, mesh1)
    sharded1 = shard_batch(batch, mesh1)
    pr1 = make_train_step(
        model, donate=False, bn_mode="per_replica", mesh=mesh1
    )
    s_a, m_a = make_train_step(model, donate=False)(state1, sharded1)
    s_b, m_b = pr1(state1, sharded1)
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_a.params)),
        jax.tree.leaves(jax.device_get(s_b.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_rules_fire_on_tiny_and_full():
    """The 'model' axis must carry real shardings in both the dry-run
    config (tiny_L3) and the production models: count parameters whose
    placement is not fully replicated after tp_shard_state."""
    from l3embedding_tpu.parallel.tp import tp_shard_state

    mesh = create_mesh(jax.devices()[:8], model_axis=2)

    def count_sharded(model_type):
        spec = build_model(model_type)
        model = spec.module()
        state = create_train_state(
            model, jax.random.PRNGKey(0), spec.video_input_shape,
            spec.audio_input_shape, learning_rate=1e-3,
        )
        state = tp_shard_state(state, mesh)
        n = 0
        for leaf in jax.tree.leaves(state.params):
            sh = leaf.sharding
            if any(s is not None for s in sh.spec):
                n += 1
        return n

    # tiny: embedding_conv kernel+bias per tower + merge_dense = 5.
    assert count_sharded("tiny_L3") >= 5
    # full: block-4 conv group (kernel+bias+BN scale/bias) x2 towers +
    # embedding convs x2 + merge_dense = 11.
    assert count_sharded("cnn_L3_melspec2") >= 11
