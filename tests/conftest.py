"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 forced devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

IMPORTANT platform gotcha: this machine's sitecustomize registers the axon
TPU plugin at interpreter start and sets jax.config.jax_platforms to
"axon,cpu" — *before* any user code runs. Env vars alone cannot override
that; jax.config.update after importing jax is the only reliable switch.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
