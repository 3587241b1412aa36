"""Root pytest config: force tests onto a simulated 8-device CPU mesh.

Loaded before tests/ conftest. The jaxtyping pytest plugin imports jax
before any conftest runs, so setting JAX_PLATFORMS here is not enough —
we also update the jax config directly (backends initialize lazily, at
first device use inside a test, so this still takes effect).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
