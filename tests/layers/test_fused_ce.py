"""Fused label-smoothed CE kernel vs the jnp formula (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.fused_ce import fused_softmax_xent  # noqa: E402


def _ref_xent(logits, labels, confidence, low_confidence):
    v = logits.shape[-1]
    z32 = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(z32, axis=-1)
    label_z = jnp.take_along_axis(z32, labels[..., None], axis=-1)[..., 0]
    sum_z = jnp.sum(z32, axis=-1)
    return (-(confidence - low_confidence) * (label_z - lse)
            - low_confidence * (sum_z - v * lse))


@pytest.mark.parametrize("shape,vocab", [((4, 6), 512), ((3, 5), 640)])
def test_fused_ce_forward_and_grads_match(shape, vocab):
    rng = np.random.RandomState(0)
    smoothing = 0.1
    c = 1.0 - smoothing
    low = smoothing / (vocab - 1)
    logits = jnp.asarray(rng.randn(*shape, vocab) * 2.0, jnp.float32)
    labels = jnp.asarray(rng.randint(0, vocab, size=shape), jnp.int32)
    w = jnp.asarray(rng.rand(*shape), jnp.float32)

    ours = fused_softmax_xent(logits, labels, c, low, interpret=True)
    ref = _ref_xent(logits, labels, c, low)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(z):
        return jnp.sum(fused_softmax_xent(z, labels, c, low,
                                          interpret=True) * w)

    def loss_ref(z):
        return jnp.sum(_ref_xent(z, labels, c, low) * w)

    g1 = np.asarray(jax.grad(loss_fused)(logits))
    g2 = np.asarray(jax.grad(loss_ref)(logits))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_fused_ce_bf16_and_ragged_rows():
    """bf16 logits and a row count that is not a block multiple."""
    rng = np.random.RandomState(1)
    vocab = 512
    logits = jnp.asarray(rng.randn(67, vocab), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, vocab, size=(67,)), jnp.int32)
    ours = fused_softmax_xent(logits, labels, 0.9, 0.1 / (vocab - 1),
                              interpret=True)
    ref = _ref_xent(logits, labels, 0.9, 0.1 / (vocab - 1))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_ce_ragged_vocab_block():
    """vocab > _VBLOCK and NOT a multiple of it (e.g. a 32000-word BPE
    vocab in production): the final vocab block is ragged and must be
    masked, not dropped (regression: truncating grid division skipped
    the tail columns entirely)."""
    from neurst_tpu.ops import fused_ce
    rng = np.random.RandomState(3)
    vocab = fused_ce._VBLOCK + 1024
    smoothing = 0.1
    c = 1.0 - smoothing
    low = smoothing / (vocab - 1)
    logits = jnp.asarray(rng.randn(9, vocab), jnp.float32)
    # force labels into the ragged tail so z_label depends on it
    labels = jnp.asarray(rng.randint(fused_ce._VBLOCK, vocab, size=(9,)),
                         jnp.int32)
    ours = fused_softmax_xent(logits, labels, c, low, interpret=True)
    ref = _ref_xent(logits, labels, c, low)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g1 = np.asarray(jax.grad(lambda z: jnp.sum(fused_softmax_xent(
        z, labels, c, low, interpret=True)))(logits))
    g2 = np.asarray(jax.grad(lambda z: jnp.sum(_ref_xent(
        z, labels, c, low)))(logits))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_criterion_uses_same_semantics():
    """The criterion's jnp path (active on CPU) is the kernel's
    reference; a spot check that the criterion still reduces as
    expected with padding weights."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    crit = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 4, 512), jnp.float32)
    inp = {"trg": jnp.asarray(rng.randint(0, 512, size=(2, 4)), jnp.int32),
           "trg_padding": jnp.asarray([[0, 0, 1, 1], [0, 0, 0, 0]],
                                      jnp.float32)}
    nll, n_samples, n_tok = crit(inp, logits)
    assert nll.shape == (2,)
    assert float(n_tok[0]) == 2.0 and float(n_tok[1]) == 4.0
