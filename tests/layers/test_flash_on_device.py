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


def test_flash_dropout_mean_and_mask_consistency_on_device():
    """In-kernel attention dropout: (a) averaging over many seeds
    recovers the no-dropout output (inverted-dropout mean
    preservation); (b) the backward regenerates EXACTLY the forward's
    mask — extracted via v=I, the effective attention matrix A
    reproduces both a second forward (different v, same seed) and the
    analytic dv = A^T w."""
    rng = np.random.RandomState(2)
    b, t, n, h = 2, 64, 2, 64
    q = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(h, dtype=jnp.float32)[:, None, :],
                           (t, n, h))[None].repeat(b, axis=0)
    v2 = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    w = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    rate = 0.3
    key = jax.random.PRNGKey(7)

    base = np.asarray(flash_attention(q, k, eye, block_q=128, block_k=128))

    # (a) mean preservation over seeds
    outs = [np.asarray(flash_attention(
        q, k, eye, block_q=128, block_k=128, dropout_rate=rate,
        dropout_key=jax.random.PRNGKey(100 + i))) for i in range(24)]
    mean = np.mean(outs, axis=0)
    # A entries are softmax probs (<=1); 24 seeds at p=0.7 keep ->
    # stderr ~ sqrt(p(1-p)/24)*val/p; loose bound
    assert float(np.max(np.abs(mean - base))) < 0.25
    assert abs(float(np.mean(mean)) - float(np.mean(base))) < 0.01

    # (b) fwd/bwd mask identity
    a_mat = flash_attention(q, k, eye, block_q=128, block_k=128,
                            dropout_rate=rate, dropout_key=key)
    # a_mat[b, i, n, j] == (M * P~)_{ij} * inv_keep for head n
    out2 = np.asarray(flash_attention(q, k, v2, block_q=128, block_k=128,
                                      dropout_rate=rate, dropout_key=key))
    want = np.asarray(jnp.einsum("binj,bjnh->binh", a_mat, v2))
    assert float(np.max(np.abs(out2 - want))) < 5e-4

    dv = jax.grad(lambda vv: jnp.sum(flash_attention(
        q, k, vv, block_q=128, block_k=128, dropout_rate=rate,
        dropout_key=key) * w))(v2)
    dv_want = np.asarray(jnp.einsum("binj,binh->bjnh", a_mat, w))
    assert float(np.max(np.abs(np.asarray(dv) - dv_want))) < 5e-4


def test_flash_dropout_dq_dk_finite_difference_on_device():
    """dq/dk under dropout via directional finite differences (the
    mask is deterministic given the seed, so FD is well-defined)."""
    rng = np.random.RandomState(3)
    b, t, n, h = 1, 64, 2, 64
    q = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    w = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    key = jax.random.PRNGKey(11)

    def loss(q, k):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, block_q=128, block_k=128,
            dropout_rate=0.25, dropout_key=key) * w)

    gq, gk = jax.jit(jax.grad(loss, argnums=(0, 1)))(q, k)
    eps = 1e-3
    for g, x, which in ((gq, q, "dq"), (gk, k, "dk")):
        d = jnp.asarray(rng.randn(*x.shape), jnp.float32)
        if which == "dq":
            fd = (loss(x + eps * d, k) - loss(x - eps * d, k)) / (2 * eps)
        else:
            fd = (loss(q, x + eps * d) - loss(q, x - eps * d)) / (2 * eps)
        an = float(jnp.sum(g * d))
        assert abs(an - float(fd)) < 0.02 * max(abs(an), 1.0), \
            (which, an, float(fd))
