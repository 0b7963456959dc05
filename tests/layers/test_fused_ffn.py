# Copyright 2026 The NeurST-TPU Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
"""Fused FFN kernels (ops/fused_ffn.py) vs the plain jnp math
(interpret mode on CPU; the same kernels compile on TPU), the
TransformerFFN raw-params integration, and the bf16-residual softmax
vjp (attentions)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.fused_ffn import fused_ffn  # noqa: E402


def _ref(x, w1, b1, w2, b2):
    return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2


@pytest.mark.parametrize("r", [12, 9, 2000])  # incl. ragged tails
def test_fused_ffn_forward_and_grads(r):
    rng = np.random.RandomState(0)
    d, f = 128, 256
    x = jnp.asarray(rng.randn(r, d), jnp.float32)
    w1 = jnp.asarray(rng.randn(d, f) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    gw = jnp.asarray(rng.rand(r, d), jnp.float32)

    y = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_ref(x, w1, b1, w2, b2)),
                               rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda *a: jnp.sum(fused_ffn(*a, interpret=True) * gw),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(lambda *a: jnp.sum(_ref(*a) * gw),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, n in zip(g1, g2, ["dx", "dw1", "db1", "dw2", "db2"]):
        e = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        assert e / s < 2e-5, (n, e, s)


def test_transformer_ffn_raw_params_checkpoint_layout():
    """The raw-params FFN (fused-eligible construction) produces the
    SAME parameter tree as the dense-module construction, and the same
    outputs for the same parameters."""
    import os

    from neurst_tpu.layers.common_layers import TransformerFFN
    ffn = TransformerFFN(filter_size=64, output_size=32,
                         activation="relu", dropout_rate=0.0,
                         dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32), jnp.float32)
    params = ffn.init({"params": jax.random.PRNGKey(0)}, x)
    y_raw = ffn.apply(params, x)

    os.environ["NEURST_FUSED_FFN"] = "0"
    try:
        ffn_dense = TransformerFFN(filter_size=64, output_size=32,
                                   activation="relu", dropout_rate=0.0,
                                   dtype=jnp.float32)
        params_dense = ffn_dense.init({"params": jax.random.PRNGKey(0)},
                                      x)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(params_dense)
        assert [str(p) for p, _ in flat_a] == [str(p) for p, _ in flat_b]
        assert [v.shape for _, v in flat_a] == [v.shape for _, v in flat_b]
        # same params -> same output through the other construction
        y_dense = ffn_dense.apply(params, x)
    finally:
        os.environ.pop("NEURST_FUSED_FFN", None)
    np.testing.assert_allclose(np.asarray(y_raw), np.asarray(y_dense),
                               rtol=1e-6, atol=1e-6)


def test_softmax_bf16_residual_grads_close():
    """The bf16-residual softmax vjp matches exact dsoftmax within
    bf16 rounding (~0.4% relative)."""
    from neurst_tpu.layers.attentions.multi_head_attention import \
        _softmax_bf16_residual
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(4, 2, 8, 16) * 3.0, jnp.float32)
    gw = jnp.asarray(rng.rand(4, 2, 8, 16), jnp.float32)

    g1 = jax.grad(lambda zz: jnp.sum(
        _softmax_bf16_residual(zz).astype(jnp.float32) * gw))(z)
    g2 = jax.grad(lambda zz: jnp.sum(
        jax.nn.softmax(zz, axis=-1) * gw))(z)
    e = float(jnp.max(jnp.abs(g1 - g2)))
    s = float(jnp.max(jnp.abs(g2))) + 1e-9
    assert e / s < 2e-2, (e, s)
    # forward is the rounded exact softmax
    np.testing.assert_allclose(
        np.asarray(_softmax_bf16_residual(z).astype(jnp.float32)),
        np.asarray(jax.nn.softmax(z, axis=-1)), rtol=1e-2, atol=4e-3)
