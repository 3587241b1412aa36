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

# Import jax and pin the platform via config unconditionally: when the
# axon plugin is registered (sitecustomize, before any conftest) a
# black-holing tunnel hangs backend init even under JAX_PLATFORMS=cpu —
# the config update is what reliably wins (docs/NEXT.md, memory
# axon-tunnel-blackhole). Backends initialize lazily, so doing this
# before any device use is sufficient.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
