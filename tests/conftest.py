"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so mesh/sharding logic is
exercised without TPU hardware (the driver dry-runs the multi-chip path
separately via __graft_entry__.dryrun_multichip).
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
