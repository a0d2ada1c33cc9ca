"""Substrate tests: timers, loggers, profile hook."""

import logging
import os
import time

from l3embedding_tpu.utils.log import LogTimer, StepTimer, init_console_logger


def test_log_timer(caplog):
    logger = logging.getLogger("t.logtimer")
    logger.setLevel(logging.DEBUG)
    with caplog.at_level(logging.DEBUG, logger="t.logtimer"):
        with LogTimer(logger, "block") as t:
            time.sleep(0.01)
    assert t.elapsed >= 0.01
    assert any("block took" in r.message for r in caplog.records)


def test_step_timer_blocks_on_result():
    import jax.numpy as jnp

    with StepTimer() as t:
        out = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        t.observe(out)
    assert t.elapsed > 0


def test_profile_steps_writes_trace(tmp_path):
    from tests.test_training import make_synthetic_corpus

    from l3embedding_tpu.training.loop import train

    train_dir = str(tmp_path / "train_h5")
    valid_dir = str(tmp_path / "valid_h5")
    make_synthetic_corpus(train_dir, num_blobs=1, blob_size=16, seed=0)
    make_synthetic_corpus(valid_dir, num_blobs=1, blob_size=8, seed=1)
    model_dir, _ = train(
        train_dir, valid_dir, str(tmp_path / "out"),
        num_epochs=1, train_epoch_size=2, validation_epoch_size=1,
        train_batch_size=8, validation_batch_size=8, model_type="tiny_L3",
        disable_logging=True, profile_steps=1,
    )
    prof_dir = os.path.join(model_dir, "profile")
    assert os.path.isdir(prof_dir)
    # A plugins/profile/<ts>/ tree with at least one trace artifact.
    found = []
    for root, _, files in os.walk(prof_dir):
        found += files
    assert found
