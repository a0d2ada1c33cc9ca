"""Logging substrate: timed blocks + console/rotating-file handlers.

Same public surface as the reference's log.py (`LogTimer`,
`init_console_logger`, `init_file_logger`; reference log.py:6-137), plus
a `StepTimer` that understands JAX's async dispatch (it blocks on the
result before taking the end timestamp, so device time is measured
rather than dispatch time).
"""

from __future__ import annotations

import logging
import logging.handlers
import time

import jax


class LogTimer:
    """Context manager that logs the wall time of a block."""

    def __init__(self, logger, desc, level=logging.DEBUG):
        self.logger = logger
        self.desc = desc
        self.level = level

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, exc_type, exc, tb):
        self.elapsed = time.time() - self.start
        self.logger.log(self.level, "%s took %f seconds", self.desc, self.elapsed)
        return False


class StepTimer:
    """Measures jitted-step time correctly under async dispatch.

    Usage:
        with StepTimer() as t:
            out = step(...)
            t.observe(out)   # blocks until the device result is ready
        t.elapsed
    """

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def observe(self, out):
        jax.block_until_ready(out)
        return out

    def __exit__(self, exc_type, exc, tb):
        self.elapsed = time.perf_counter() - self.start
        return False


def init_console_logger(logger, verbose=False):
    ch = logging.StreamHandler()
    ch.setLevel(logging.DEBUG if verbose else logging.INFO)
    ch.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    )
    logger.addHandler(ch)


def init_file_logger(logger, log_path=None):
    if log_path is None:
        log_path = "./l3embedding_tpu.log"
    fh = logging.handlers.RotatingFileHandler(
        log_path, maxBytes=1024 * 1024, backupCount=10
    )
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    )
    logger.addHandler(fh)
