"""Driver entry points stay green: entry() compiles, dryrun_multichip
runs a sharded train step on the 8-device CPU mesh."""

import importlib.util
import os

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_jits():
    ge = _load()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    ge = _load()
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(2)  # non-2D-mesh path
