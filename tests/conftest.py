"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

The container's sitecustomize registers the remote-TPU ('axon') PJRT plugin
at interpreter start and forces jax_platforms to it, so plain env vars are
not enough -- force the cpu platform via jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
