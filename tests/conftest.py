"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by asking XLA for
eight host-platform devices (the technique SURVEY.md §4(e) prescribes).
Must run before the first jax import anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

