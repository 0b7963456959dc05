"""Fused (hardware-PRNG) dropout: statistics, mean preservation,
and bit-identical forward/backward masks (real TPU only).

The v2 op draws one random BYTE per element (mask compare + scale
happen in XLA so they fuse into the activation's producer), so the
realized drop rate is quantized to 1/256 and the inverted-dropout
scale uses the REALIZED rate — assertions below use
_threshold_and_scale, the op's own quantization."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.fused_dropout import (_threshold_and_scale,  # noqa: E402
                                          fused_dropout)

# The Pallas interpreters stub the hardware PRNG to zeros, so these
# tests are meaningful only on a real TPU (run manually / by the
# driver; the CPU suite skips them).
pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="hardware PRNG needs a real TPU")


def test_mask_statistics_and_scaling():
    rate = 0.3
    t8, inv_keep = _threshold_and_scale(rate)
    realized = t8 / 256.0
    x = jnp.ones((512, 768), jnp.float32)
    out = np.asarray(fused_dropout(x, jax.random.PRNGKey(0), rate))
    kept = out != 0.0
    # kept entries are scaled by 1/(1-realized_rate)
    np.testing.assert_allclose(out[kept], inv_keep, rtol=1e-6)
    # keep fraction within 4 sigma of 1-realized_rate
    n = out.size
    frac = kept.mean()
    sigma = np.sqrt(realized * (1 - realized) / n)
    assert abs(frac - (1 - realized)) < 4 * sigma, (frac, sigma)
    # expectation preserved exactly in design: E[out] = 1
    assert abs(out.mean() - 1.0) < 0.01


def test_different_keys_different_masks():
    x = jnp.ones((256, 384), jnp.float32)
    a = np.asarray(fused_dropout(x, jax.random.PRNGKey(1), 0.5))
    b = np.asarray(fused_dropout(x, jax.random.PRNGKey(2), 0.5))
    assert (a != b).mean() > 0.1


def test_backward_uses_identical_mask():
    """grad(sum(dropout(x))) must equal mask/keep — i.e. the backward
    regenerates exactly the forward's bytes."""
    rate = 0.4
    _, inv_keep = _threshold_and_scale(rate)
    x = jnp.asarray(np.random.RandomState(0).randn(300, 512), jnp.float32)
    key = jax.random.PRNGKey(3)

    out, vjp = jax.vjp(lambda v: fused_dropout(v, key, rate), x)
    (dx,) = vjp(jnp.ones_like(out))
    out = np.asarray(out)
    dx = np.asarray(dx)
    mask = out != 0.0
    np.testing.assert_allclose(dx[mask], inv_keep, rtol=1e-6)
    np.testing.assert_allclose(dx[~mask], 0.0)


def test_ragged_rows_and_jit():
    """rows not a multiple of the block (and of 4): the ragged final
    block and the per-word fallback still give a valid mask."""
    rate = 0.25
    _, inv_keep = _threshold_and_scale(rate)
    x = jnp.ones((3, 7, 128), jnp.float32)  # rows=21, not mult of 4
    out = np.asarray(jax.jit(
        lambda v: fused_dropout(v, jax.random.PRNGKey(5), rate))(x))
    kept = out != 0.0
    np.testing.assert_allclose(out[kept], inv_keep, rtol=1e-6)
    assert 0.5 < kept.mean() < 0.95


def test_rate_zero_is_identity_and_dtype_preserved():
    x = jnp.asarray(np.random.RandomState(1).randn(64, 128), jnp.bfloat16)
    assert fused_dropout(x, jax.random.PRNGKey(0), 0.0) is x
    y = fused_dropout(x, jax.random.PRNGKey(0), 0.2)
    assert y.dtype == jnp.bfloat16
    assert y.shape == x.shape
