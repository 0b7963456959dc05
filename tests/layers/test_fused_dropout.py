"""Fused (hardware-PRNG) dropout kernel: statistics, mean preservation,
and bit-identical forward/backward masks (real TPU only)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.fused_dropout import fused_dropout  # noqa: E402

# The Pallas interpreters stub the hardware PRNG to zeros, so these
# tests are meaningful only on a real TPU (run manually / by the
# driver; the CPU suite skips them).
pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="hardware PRNG needs a real TPU")


def test_mask_statistics_and_scaling():
    rate = 0.3
    x = jnp.ones((512, 768), jnp.float32)
    out = np.asarray(fused_dropout(x, jax.random.PRNGKey(0), rate))
    kept = out != 0.0
    # kept entries are scaled by 1/(1-rate)
    np.testing.assert_allclose(out[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    # keep fraction within 4 sigma of 1-rate
    n = out.size
    frac = kept.mean()
    sigma = np.sqrt(rate * (1 - rate) / n)
    assert abs(frac - (1 - rate)) < 4 * sigma, (frac, sigma)
    # expectation preserved
    assert abs(out.mean() - 1.0) < 0.01


def test_different_keys_different_masks():
    x = jnp.ones((256, 384), jnp.float32)
    a = np.asarray(fused_dropout(x, jax.random.PRNGKey(1), 0.5))
    b = np.asarray(fused_dropout(x, jax.random.PRNGKey(2), 0.5))
    assert (a != b).mean() > 0.1


def test_backward_uses_identical_mask():
    """grad(sum(dropout(x))) must equal mask/keep — i.e. the backward
    regenerates exactly the forward's bits."""
    rate = 0.4
    x = jnp.asarray(np.random.RandomState(0).randn(300, 512), jnp.float32)
    key = jax.random.PRNGKey(3)

    out, vjp = jax.vjp(lambda v: fused_dropout(v, key, rate), x)
    (dx,) = vjp(jnp.ones_like(out))
    out = np.asarray(out)
    dx = np.asarray(dx)
    mask = out != 0.0
    np.testing.assert_allclose(dx[mask], 1.0 / (1.0 - rate), rtol=1e-6)
    np.testing.assert_allclose(dx[~mask], 0.0)


def test_rate_zero_is_identity_and_dtype_preserved():
    x = jnp.asarray(np.random.RandomState(1).randn(64, 128), jnp.bfloat16)
    assert fused_dropout(x, jax.random.PRNGKey(0), 0.0) is x
    y = fused_dropout(x, jax.random.PRNGKey(0), 0.2)
    assert y.dtype == jnp.bfloat16
    assert y.shape == x.shape
