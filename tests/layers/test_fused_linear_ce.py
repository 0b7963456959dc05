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
"""Fused projection + label-smoothed CE (ops/fused_ce.fused_linear_xent)
vs the jnp reference (interpret mode on CPU; the same kernels compile
on TPU), plus the end-to-end train-step equivalence of the prelogits
path against the logits path."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.ops.fused_ce import (fused_linear_xent,  # noqa: E402
                                     linear_xent_reference)


@pytest.mark.parametrize("shape,dim,vocab,bias_on",
                         [((2, 5), 128, 512, False),
                          ((3, 4), 128, 640, True),
                          ((2, 3), 256, 650, True)])  # ragged vocab pad
def test_linear_ce_forward_and_grads_match(shape, dim, vocab, bias_on):
    rng = np.random.RandomState(0)
    smoothing = 0.1
    c = 1.0 - smoothing
    low = smoothing / (vocab - 1)
    x = jnp.asarray(rng.randn(*shape, dim), jnp.float32)
    w = jnp.asarray(rng.randn(vocab, dim) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, vocab, size=shape), jnp.int32)
    bias = jnp.asarray(rng.randn(vocab), jnp.float32) if bias_on else None
    gw = jnp.asarray(rng.rand(*shape), jnp.float32)

    ours = fused_linear_xent(x, w, labels, c, low, bias=bias,
                             interpret=True)
    ref = linear_xent_reference(x, w, labels, c, low, bias=bias)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    args = (x, w) + ((bias,) if bias_on else ())

    def loss_fused(*a):
        b = a[2] if bias_on else None
        return jnp.sum(fused_linear_xent(a[0], a[1], labels, c, low,
                                         bias=b, interpret=True) * gw)

    def loss_ref(*a):
        b = a[2] if bias_on else None
        return jnp.sum(linear_xent_reference(a[0], a[1], labels, c, low,
                                             bias=b) * gw)

    argnums = tuple(range(len(args)))
    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b, name in zip(g1, g2, ["dx", "dw", "dbias"]):
        e = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert e / scale < 2e-4, (name, e, scale)


def test_linear_ce_ragged_rows():
    """R not a multiple of the row block: the tail's unspecified
    padding must not leak into dW/db (the 0*garbage=NaN trap)."""
    rng = np.random.RandomState(1)
    dim, vocab = 128, 512
    c, low = 0.9, 0.1 / (vocab - 1)
    x = jnp.asarray(rng.randn(10, dim), jnp.float32)  # 10 rows
    w = jnp.asarray(rng.randn(vocab, dim) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, vocab, size=(10,)), jnp.int32)

    def loss(xx, ww):
        return jnp.sum(fused_linear_xent(xx, ww, labels, c, low,
                                         interpret=True))

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(dx)).all()
    assert np.isfinite(np.asarray(dw)).all()
    dwr = jax.grad(lambda ww: jnp.sum(linear_xent_reference(
        x, ww, labels, c, low)))(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dwr),
                               rtol=1e-4, atol=1e-5)


def test_train_step_prelogits_equals_logits_path():
    """The full train step with the fused softmax+CE contract
    (want_prelogits) matches the plain logits path bit-for-bit on CPU
    (both reduce to the same jnp formula off-TPU)."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    meta = {"vocab_size": 128, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg.update({"dtype": "float32",
                "modality.share_embedding_and_softmax_weights": True,
                "modality.dim": 128,
                "encoder.hidden_size": 128, "decoder.hidden_size": 128,
                "encoder.num_layers": 1, "decoder.num_layers": 1})
    for p in ("encoder", "decoder"):
        for k in ("attention_dropout_rate", "ffn_dropout_rate",
                  "layer_postprocess_dropout_rate"):
            cfg[f"{p}.{k}"] = 0.0
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=meta, trg_meta=meta)
    assert model.supports_fused_softmax_ce()
    params = model.init_params(jax.random.PRNGKey(0))
    crit = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 128, "warmup_steps": 100,
                       "initial_factor": 1.0})
    tx = create_optax_chain(Adam({"epsilon": 1e-9}), lr, clip_norm=1.0)

    rng = np.random.RandomState(0)
    b, length = 4, 6
    batch = {
        "src": jnp.asarray(rng.randint(4, 128, size=[b, length]),
                           jnp.int32),
        "src_padding": jnp.zeros([b, length], jnp.float32),
        "trg_input": jnp.asarray(rng.randint(4, 128, size=[b, length]),
                                 jnp.int32),
        "trg": jnp.asarray(rng.randint(4, 128, size=[b, length]),
                           jnp.int32),
        "trg_padding": jnp.zeros([b, length], jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    results = {}
    for mode in ("1", "0"):
        os.environ["NEURST_FUSED_CE"] = mode
        try:
            step = jax.jit(make_train_step(model, crit, tx))
            state = TrainState.create(params, tx)
            losses = []
            for _ in range(3):
                state, m = step(state, batch, key)
                losses.append(float(m["loss"]))
            results[mode] = (losses, state.params)
        finally:
            os.environ.pop("NEURST_FUSED_CE", None)
    assert results["1"][0] == results["0"][0]
    for a, b_ in zip(jax.tree_util.tree_leaves(results["1"][1]),
                     jax.tree_util.tree_leaves(results["0"][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_quant_and_nonshared_fall_back():
    """supports_fused_softmax_ce gates: non-shared softmax weights and
    QAT both force the logits path."""
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer

    meta = {"vocab_size": 128, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg.update({"dtype": "float32", "modality.dim": 128,
                "encoder.hidden_size": 128, "decoder.hidden_size": 128,
                "modality.share_embedding_and_softmax_weights": False})
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=meta, trg_meta=meta)
    assert not model.supports_fused_softmax_ce()

    cfg["modality.share_embedding_and_softmax_weights"] = True
    quant_layers.global_init(True)
    try:
        model = build_model({"model.class": "transformer",
                             "model.params": cfg},
                            src_meta=meta, trg_meta=meta)
        assert not model.supports_fused_softmax_ce()
    finally:
        quant_layers.global_init(False)
