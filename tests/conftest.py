"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so mesh/sharding logic is
exercised without TPU hardware (the driver dry-runs the multi-chip path
separately via __graft_entry__.dryrun_multichip).
"""

import os
import sys

# Must be set before jax initializes a backend. The image's sitecustomize
# pins JAX_PLATFORMS=axon (the TPU tunnel), so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (verified to work on XLA:CPU in this jax):
# the suite's dominant cost is re-compiling the full towers every run —
# cached, repeat runs skip it. Keyed by backend+HLO, so it is
# correctness-safe and separate from the TPU cache (~/.cache/jax_comp).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_comp_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
