"""Test configuration: force an 8-device virtual CPU mesh.

Real-TPU benchmarks live in benchmarks/, not here; the test suite must run
anywhere. Multi-chip sharding tests use the virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
