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
"""Fused projection+CE kernels on the REAL TPU (compiled Mosaic, bf16
and f32, VMEM-resident W) — the interpret-mode tests cover semantics;
these cover the compiled path.  Run via NEURST_TEST_BACKEND=tpu."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.fused_ce import (fused_linear_xent,  # noqa: E402
                                     linear_xent_reference)

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="compiled-Mosaic tests need a TPU")


@pytest.mark.parametrize("dtype,rtol", [(jnp.float32, 1e-4),
                                        (jnp.bfloat16, 2e-2)])
def test_linear_ce_compiled(dtype, rtol):
    rng = np.random.RandomState(0)
    r, d, v = 1000, 256, 4096  # ragged rows, multi-block vocab
    c, low = 0.9, 0.1 / (v - 1)
    x = jnp.asarray(rng.randn(r, d), dtype)
    w = jnp.asarray(rng.randn(v, d) * 0.1, dtype)
    labels = jnp.asarray(rng.randint(0, v, size=(r,)), jnp.int32)
    gw = jnp.asarray(rng.rand(r), jnp.float32)

    @jax.jit
    def fused(x, w):
        return fused_linear_xent(x, w, labels, c, low)

    ours = np.asarray(fused(x, w))
    ref = np.asarray(linear_xent_reference(
        x.astype(jnp.float32), w.astype(jnp.float32), labels, c, low))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(ours - ref).max() / scale < rtol

    @jax.jit
    def gboth(x, w):
        return jax.grad(
            lambda xx, ww: jnp.sum(
                fused_linear_xent(xx, ww, labels, c, low) * gw),
            argnums=(0, 1))(x, w)

    dx, dw = gboth(x, w)
    x32, w32 = x.astype(jnp.float32), w.astype(jnp.float32)
    dx_r, dw_r = jax.grad(
        lambda xx, ww: jnp.sum(
            linear_xent_reference(xx, ww, labels, c, low) * gw),
        argnums=(0, 1))(x32, w32)
    for a, b, name in ((dx, dx_r, "dx"), (dw, dw_r, "dw")):
        e = np.abs(np.asarray(a, np.float32) - np.asarray(b)).max()
        s = np.abs(np.asarray(b)).max() + 1e-9
        assert e / s < max(rtol, 2e-2), (name, e, s)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_fused_ffn_compiled(rate):
    """Fused FFN on the chip: no-dropout equals the jnp math; with
    dropout, the mean over seeds approaches the no-dropout output and
    gradients flow finite (the mask regenerates in-kernel)."""
    from neurst_tpu.ops.fused_ffn import fused_ffn
    rng = np.random.RandomState(0)
    r, d, f = 2048, 256, 512
    x = jnp.asarray(rng.randn(r, d), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(d, f) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(11)

    @jax.jit
    def run(x):
        return fused_ffn(x, w1, b1, w2, b2, dropout_rate=rate,
                         dropout_key=key)

    y = np.asarray(run(x), np.float32)
    if rate == 0.0:
        dt = jnp.bfloat16
        h = jnp.maximum(x @ w1.astype(dt) + b1.astype(dt), 0)
        ref = np.asarray(h @ w2.astype(dt) + b2.astype(dt), np.float32)
        s = np.abs(ref).max() + 1e-9
        assert np.abs(y - ref).max() / s < 2e-2
    else:
        # E over masks is tested in interpret-free fashion: mean of y
        # over many keys approaches the no-dropout output
        outs = [np.asarray(jax.jit(lambda x, k: fused_ffn(
            x, w1, b1, w2, b2, dropout_rate=rate, dropout_key=k))(
                x, jax.random.PRNGKey(100 + i)), np.float32)
            for i in range(16)]
        base = np.asarray(jax.jit(lambda x: fused_ffn(
            x, w1, b1, w2, b2))(x), np.float32)
        err = np.abs(np.mean(outs, axis=0) - base).max()
        assert err < np.abs(base).max() * 0.5
        # grads flow and are finite
        g = jax.jit(jax.grad(lambda xx: jnp.sum(fused_ffn(
            xx, w1, b1, w2, b2, dropout_rate=rate,
            dropout_key=key).astype(jnp.float32))))(x)
        assert np.isfinite(np.asarray(g, np.float32)).all()
