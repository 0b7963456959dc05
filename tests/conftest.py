"""Test configuration: force CPU with 8 virtual devices.

Must run before jax initializes its backend — pytest imports conftest
first, so setting the env here is sufficient as long as no test module
imports jax at collection time outside a function/fixture.
"""

import os

# NEURST_TEST_BACKEND=tpu opts out of the CPU forcing for on-device
# kernel tests (hardware PRNG, Pallas compile paths).
_KEEP_TPU = os.environ.get("NEURST_TEST_BACKEND") == "tpu"

if not _KEEP_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The default matmul precision is bf16-grade even for f32 operands (TPU
# MXU semantics); force true f32 accumulation for numeric parity tests.
# NOTE: a pytest plugin (flax/chex) may import jax before this conftest,
# and the axon TPU plugin ignores the JAX_PLATFORMS env var — set both
# configs directly.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
if not _KEEP_TPU:
    jax.config.update("jax_platforms", "cpu")
