"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by asking XLA for
eight host-platform devices (the technique SURVEY.md §4(e) prescribes).

Note: this environment's axon TPU plugin (sitecustomize in
/root/.axon_site) force-sets ``jax_platforms="axon,cpu"`` at interpreter
start, so the JAX_PLATFORMS env var alone is NOT enough — we must override
the config after import.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
