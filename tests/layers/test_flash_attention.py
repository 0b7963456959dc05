"""Flash-attention kernel vs reference XLA attention (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.flash_attention import flash_attention  # noqa: E402


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
def test_flash_matches_reference(causal):
    rng = np.random.RandomState(0)
    b, t_q, t_k, n, h = 2, 64, 96, 2, 32
    q = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    lengths = jnp.asarray([96, 50], jnp.int32)
    ours = flash_attention(q, k, v, lengths, causal=causal,
                           block_q=32, block_k=32)
    ref = _reference(q, k, v, lengths, causal)
    assert float(jnp.max(jnp.abs(ours - ref))) < 1e-4


def test_flash_unpadded_lengths_and_ragged_blocks():
    """Non-multiple sequence lengths exercise the padding path."""
    rng = np.random.RandomState(1)
    b, t_q, t_k, n, h = 1, 40, 70, 2, 16
    q = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    lengths = jnp.asarray([63], jnp.int32)
    ours = flash_attention(q, k, v, lengths, block_q=32, block_k=32)
    ref = _reference(q, k, v, lengths, False)
    assert float(jnp.max(jnp.abs(ours - ref))) < 1e-4


@pytest.mark.parametrize("causal", [False, True])
def test_flash_bf16_block_boundaries(causal):
    """bf16 inputs with t_k NOT a multiple of block_k, asymmetric
    block sizes, and per-row lengths straddling every block boundary
    (first block, mid-block, exact multiple, full length) — the cases
    named as untested in the round-2 review."""
    rng = np.random.RandomState(3)
    b, t_q, t_k, n, h = 4, 48, 104, 2, 32  # 104 = 3*32 + 8 ragged tail
    q32 = rng.randn(b, t_q, n, h).astype(np.float32)
    k32 = rng.randn(b, t_k, n, h).astype(np.float32)
    v32 = rng.randn(b, t_k, n, h).astype(np.float32)
    q = jnp.asarray(q32, jnp.bfloat16)
    k = jnp.asarray(k32, jnp.bfloat16)
    v = jnp.asarray(v32, jnp.bfloat16)
    lengths = jnp.asarray([5, 33, 64, 104], jnp.int32)
    ours = flash_attention(q, k, v, lengths, causal=causal,
                           block_q=16, block_k=32).astype(jnp.float32)
    ref = _reference(jnp.asarray(q, jnp.float32),
                     jnp.asarray(k, jnp.float32),
                     jnp.asarray(v, jnp.float32), lengths, causal)
    # bf16 inputs: ~3 decimal digits; the kernel accumulates in f32
    assert float(jnp.max(jnp.abs(ours - ref))) < 3e-2


def test_flash_bf16_grads_match_reference():
    """bf16 backward across a ragged block tail: dq/dk/dv from the
    custom VJP match the dense reference within bf16 tolerance."""
    rng = np.random.RandomState(4)
    b, t_q, t_k, n, h = 2, 40, 72, 2, 16  # 72 = 2*32 + 8 ragged tail
    q = jnp.asarray(rng.randn(b, t_q, n, h), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t_k, n, h), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t_k, n, h), jnp.bfloat16)
    lengths = jnp.asarray([72, 41], jnp.int32)
    w = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, lengths, block_q=16, block_k=32)
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_ref(q, k, v):
        out = _reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), lengths, False)
        return jnp.sum(out * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        diff = float(jnp.max(jnp.abs(gf.astype(jnp.float32)
                                     - gr.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(gr)).astype(jnp.float32)) + 1e-6
        assert diff / scale < 5e-2, (name, diff, scale)


def test_encoder_flash_equals_standard():
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    meta = {"vocab_size": 17, "eos_id": 16, "bos_id": 16, "unk_id": 15}
    cfg = Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"]
    cfg["dtype"] = "float32"
    m1 = build_model({"model.class": "transformer",
                      "model.params": dict(cfg)},
                     src_meta=meta, trg_meta=meta)
    cfg2 = dict(cfg)
    cfg2["encoder.enable_flash_attention"] = True
    m2 = build_model({"model.class": "transformer", "model.params": cfg2},
                     src_meta=meta, trg_meta=meta)
    params = m1.init_params(jax.random.PRNGKey(0))
    inputs = {
        "src": np.array([[3, 4, 5, 16, 16, 16, 16, 16]], np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1, 1, 1]], np.float32),
        "trg_input": np.array([[16, 2, 3, 4]], np.int32)}
    d = float(jnp.max(jnp.abs(m1.call(params, inputs)
                              - m2.call(params, inputs))))
    assert d < 1e-4, d


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_reference(causal):
    """custom_vjp backward (Pallas dq/dkv kernels) == autodiff through
    the dense reference, with ragged key lengths."""
    rng = np.random.RandomState(2)
    b, t_q, t_k, n, h = 2, 64, 96, 2, 32
    q = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    w = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)
    lengths = jnp.asarray([96, 50], jnp.int32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, lengths, causal=causal,
                              block_q=32, block_k=32)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, lengths, causal) * w)

    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for ours, ref, name in ((gq, rq, "dq"), (gk, rk, "dk"), (gv, rv, "dv")):
        d = float(jnp.max(jnp.abs(ours - ref)))
        assert d < 2e-4, (name, d)


def test_flash_grads_ragged_unpadded():
    """Gradients with sequence lengths that are not block multiples
    (exercises the pad-and-slice path in fwd and bwd)."""
    rng = np.random.RandomState(3)
    b, t_q, t_k, n, h = 1, 40, 70, 2, 16
    q = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, t_k, n, h), jnp.float32)
    w = jnp.asarray(rng.randn(b, t_q, n, h), jnp.float32)
    lengths = jnp.asarray([63], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths,
                                       block_q=32, block_k=32) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, lengths, False) * w)

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for ours, ref in zip(g, r):
        assert float(jnp.max(jnp.abs(ours - ref))) < 2e-4


def test_full_model_flash_train_grads_equal_dense():
    """Tiny transformer with encoder+decoder flash attention: training
    logits AND parameter gradients match the dense model (dropout off
    for determinism)."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    meta = {"vocab_size": 17, "eos_id": 16, "bos_id": 16, "unk_id": 15}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    dense = build_model({"model.class": "transformer",
                         "model.params": dict(cfg)},
                        src_meta=meta, trg_meta=meta)
    cfg["encoder.enable_flash_attention"] = True
    cfg["decoder.enable_flash_attention"] = True
    flash = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=meta, trg_meta=meta)
    params = dense.init_params(jax.random.PRNGKey(0))
    batch = {
        "src": np.array([[3, 4, 5, 16, 16, 16], [6, 7, 8, 9, 10, 16]],
                        np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1], [0, 0, 0, 0, 0, 0]],
                                np.float32),
        "trg_input": np.array([[16, 2, 3, 4], [16, 5, 6, 7]], np.int32),
        "trg": np.array([[2, 3, 4, 16], [5, 6, 7, 16]], np.int32),
        "trg_padding": np.array([[0, 0, 0, 1], [0, 0, 0, 0]], np.float32),
    }
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})

    def loss(model, p):
        logits = model.call(p, batch, is_training=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return criterion.reduce_loss(batch, logits)

    ld = float(loss(dense, params))
    lf = float(loss(flash, params))
    assert abs(ld - lf) < 1e-4, (ld, lf)
    gd = jax.grad(lambda p: loss(dense, p))(params)
    gf = jax.grad(lambda p: loss(flash, p))(params)
    leaves_d = jax.tree_util.tree_leaves(gd)
    leaves_f = jax.tree_util.tree_leaves(gf)
    max_d = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(leaves_d, leaves_f))
    assert max_d < 2e-4, max_d


def test_flash_train_dropout_off_tpu_is_config_error():
    """Training a flash-attention recipe that requests attention-prob
    dropout on a non-TPU backend must raise (not silently train a
    different model than the same recipe trains on TPU); inference on
    the same model stays fine."""
    import pytest

    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    meta = {"vocab_size": 17, "eos_id": 16, "bos_id": 16, "unk_id": 15}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    cfg["encoder.enable_flash_attention"] = True
    cfg["encoder.attention_dropout_rate"] = 0.1
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = {
        "src": np.array([[3, 4, 5, 16]], np.int32),
        "src_padding": np.array([[0, 0, 0, 1]], np.float32),
        "trg_input": np.array([[16, 2, 3]], np.int32),
    }
    with pytest.raises(ValueError, match="hardware PRNG"):
        model.call(params, batch, is_training=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    # inference never applies dropout -> no error
    model.call(params, batch, is_training=False)
