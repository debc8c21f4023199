"""Test configuration: force an 8-device virtual CPU mesh.

Real-TPU benchmarks live in benchmarks/, not here; the test suite must run
anywhere. Multi-chip sharding tests use the virtual devices.
"""

import os

# Force CPU: the CI suite must not depend on (or pay the tunnel latency of)
# the real TPU. Note the environment pre-sets JAX_PLATFORMS=axon, so an
# explicit override (not setdefault) is required.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from fhestring_tpu.compat import enable_compile_cache  # noqa: E402

enable_compile_cache()
