"""Layer-level tests (parity strategy: tests/neurst/layers/*_test.py)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.layers import layer_utils  # noqa: E402
from neurst_tpu.layers.common_layers import (LayerNorm,  # noqa: E402
                                             sinusoidal_position_signal)
from neurst_tpu.layers.attentions.multi_head_attention import (  # noqa: E402
    MultiHeadAttention, MultiHeadSelfAttention)


def test_sinusoid_signal_matches_t2t_formula():
    """The reference layout: [sin(all timescales) | cos(all timescales)],
    log-increment / (num_timescales - 1) (common_layers.py:357-409)."""
    length, channels = 5, 8
    sig = np.asarray(sinusoidal_position_signal(length, channels))
    num_ts = channels // 2
    inc = math.log(1e4) / (num_ts - 1)
    for pos in range(length):
        for i in range(num_ts):
            inv = math.exp(i * -inc)
            assert abs(sig[pos, i] - math.sin(pos * inv)) < 1e-5
            assert abs(sig[pos, num_ts + i] - math.cos(pos * inv)) < 1e-5


def test_sinusoid_time_offset():
    full = np.asarray(sinusoidal_position_signal(8, 6))
    shifted = np.asarray(sinusoidal_position_signal(4, 6, start=4))
    np.testing.assert_allclose(full[4:], shifted, atol=1e-5)


def test_layer_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8)) * 5 + 3
    ln = LayerNorm()
    params = ln.init(jax.random.PRNGKey(1), x)["params"]
    y = np.asarray(ln.apply({"params": params}, x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)


def test_padding_bias_masks_attention():
    """Attention output must ignore masked memory positions."""
    mha = MultiHeadAttention(num_heads=2, num_units=8, dtype=jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8))
    mem = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
    params = mha.init(jax.random.PRNGKey(2), q, mem)["params"]
    padding = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    bias = layer_utils.input_padding_to_bias(padding)
    out1, _ = mha.apply({"params": params}, q, mem, bias=bias)
    # change the masked memory rows: output must be identical
    mem2 = mem.at[:, 2:].set(99.0)
    out2, _ = mha.apply({"params": params}, q, mem2, bias=bias)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_causal_bias_blocks_future():
    sa = MultiHeadSelfAttention(num_heads=2, num_units=8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    params = sa.init(jax.random.PRNGKey(1), x)["params"]
    bias = layer_utils.causal_self_attention_bias(4)
    out1, _ = sa.apply({"params": params}, x, bias=bias)
    # mutate the future: position 0's output must not change
    x2 = x.at[:, 2:].set(-5.0)
    out2, _ = sa.apply({"params": params}, x2, bias=bias)
    np.testing.assert_allclose(np.asarray(out1[:, 0]),
                               np.asarray(out2[:, 0]), atol=1e-5)


def test_waitk_bias():
    bias = np.asarray(layer_utils.waitk_cross_attention_bias(3, 5, 2))
    # position i attends source < i + 2
    for i in range(3):
        for j in range(5):
            if j < i + 2:
                assert bias[0, 0, i, j] == 0.0
            else:
                assert bias[0, 0, i, j] < -1e8


def test_self_attention_cache_step_equals_full():
    sa = MultiHeadSelfAttention(num_heads=2, num_units=8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    params = sa.init(jax.random.PRNGKey(1), x)["params"]
    full_bias = layer_utils.causal_self_attention_bias(4)
    out_full, _ = sa.apply({"params": params}, x, bias=full_bias)
    cache = {"keys": jnp.zeros((2, 4, 2, 4)),
             "values": jnp.zeros((2, 4, 2, 4))}
    outs = []
    for t in range(4):
        step_bias = jnp.where(jnp.arange(4) <= t, 0.0,
                              layer_utils.NEG_INF)[None, None, None, :]
        out, cache = sa.apply({"params": params}, x[:, t:t + 1],
                              bias=step_bias, cache=cache, decode_step=t)
        outs.append(out[:, 0])
    stacked = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(stacked),
                               atol=2e-5)
