"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective
correctness is validated on virtual CPU devices, and the driver
separately dry-run-compiles the multi-chip path (__graft_entry__.py).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
