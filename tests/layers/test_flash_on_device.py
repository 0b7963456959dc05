"""Flash-attention kernel on the REAL TPU (compiled Mosaic, bf16,
ragged block boundaries) — the interpret-mode tests cover semantics;
these cover the compiled path.  Run via NEURST_TEST_BACKEND=tpu."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.flash_attention import flash_attention  # noqa: E402

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="compiled-Mosaic tests need a TPU")


def _reference(q, k, v, lengths, causal):
    h = q.shape[-1]
    t_q, t_k = q.shape[1], k.shape[1]
    s = jnp.einsum("BqNH,BkNH->BNqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(h)
    mask = jnp.arange(t_k)[None, :] < lengths[:, None]
    s = s + jnp.where(mask, 0, -1e30)[:, None, None, :]
    if causal:
        cm = jnp.tril(jnp.ones((t_q, t_k)))[None, None]
        s = jnp.where(cm > 0, s, -1e30)
    return jnp.einsum("BNqk,BkNH->BqNH", jax.nn.softmax(s, -1),
                      v.astype(jnp.float32))


@pytest.mark.parametrize("causal", [False, True])
def test_flash_bf16_ragged_on_device(causal):
    """bf16 inputs, t_q/t_k NOT multiples of the block sizes, ragged
    valid lengths — compiled on the chip."""
    rng = np.random.RandomState(0)
    b, t_q, t_k, n, h = 2, 200, 330, 4, 64
    q = jnp.asarray(rng.randn(b, t_q, n, h), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t_k, n, h), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t_k, n, h), jnp.bfloat16)
    lengths = jnp.asarray([330, 97], jnp.int32)
    ours = np.asarray(flash_attention(q, k, v, lengths, causal=causal,
                                      block_q=128, block_k=128)
                      ).astype(np.float32)
    ref = np.asarray(_reference(q, k, v, lengths, causal))
    # bf16 inputs: tolerance at bf16 resolution of O(1) outputs
    assert float(np.max(np.abs(ours - ref))) < 0.05, \
        float(np.max(np.abs(ours - ref)))


def test_flash_grads_bf16_on_device():
    """Compiled backward kernels under bf16 with ragged lengths."""
    rng = np.random.RandomState(1)
    b, t, n, h = 2, 200, 4, 64
    q = jnp.asarray(rng.randn(b, t, n, h), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, n, h), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, n, h), jnp.bfloat16)
    w = jnp.asarray(rng.randn(b, t, n, h), jnp.bfloat16)
    lengths = jnp.asarray([200, 130], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, causal=True,
                                       block_q=128, block_k=128)
                       .astype(jnp.float32) * w.astype(jnp.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, lengths, True)
                       * w.astype(jnp.float32))

    g = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for ours, ref, name in zip(g, r, ("dq", "dk", "dv")):
        d = float(jnp.max(jnp.abs(ours.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        # grads of sums over ~200 bf16 products: bf16-grade tolerance
        assert d < 1.0, (name, d)
        rel = d / max(float(jnp.max(jnp.abs(ref))), 1e-6)
        assert rel < 0.05, (name, rel)
