"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 forced devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The machine profile exports JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on the virtual CPU mesh, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
