"""Test configuration: force an 8-device virtual CPU mesh.

Real-TPU benchmarks live in benchmarks/, not here; the test suite must run
anywhere. Multi-chip sharding tests use the virtual devices.
"""

import os

# Force CPU: the CI suite must not depend on (or pay the tunnel latency of)
# the real TPU. The environment pre-sets JAX_PLATFORMS=axon AND pre-imports
# jax via sitecustomize, so an env-var override is too late — we must go
# through jax.config.update before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from fhestring_tpu.compat import enable_compile_cache  # noqa: E402

enable_compile_cache()
