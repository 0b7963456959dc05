"""Test configuration: force CPU with 8 virtual devices.

Must run before jax initializes its backend — pytest imports conftest
first, so setting the env here is sufficient as long as no test module
imports jax at collection time outside a function/fixture.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
