"""Ring attention over an 8-device mesh vs single-device attention."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _reference(q, k, v, lengths, causal):
    h = q.shape[-1]
    t_q, t_k = q.shape[1], k.shape[1]
    s = jnp.einsum("BqNH,BkNH->BNqk", q, k) / np.sqrt(h)
    mask = jnp.arange(t_k)[None, :] < lengths[:, None]
    s = s + jnp.where(mask, 0, -1e30)[:, None, None, :]
    if causal:
        cm = jnp.tril(jnp.ones((t_q, t_k)))[None, None]
        s = jnp.where(cm > 0, s, -1e30)
    return jnp.einsum("BNqk,BkNH->BqNH", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(causal):
    from neurst_tpu.ops.ring_attention import ring_self_attention
    from neurst_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(model_parallel=1)
    p = mesh.shape["data"]
    rng = np.random.RandomState(0)
    b, t, n, h = 2, 16 * p, 2, 16
    q = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, n, h), jnp.float32)
    lengths = jnp.asarray([t, t - 7], jnp.int32)
    with mesh:
        out = ring_self_attention(q, k, v, mesh, lengths=lengths,
                                  causal=causal)
    ref = _reference(q, k, v, lengths, causal)
    diff = float(jnp.max(jnp.abs(np.asarray(out) - np.asarray(ref))))
    assert diff < 1e-4, diff
