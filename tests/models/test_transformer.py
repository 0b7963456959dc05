"""Transformer model tests, mirroring the reference's strategy
(tests/neurst/models/transformer_test.py): tiny models, incremental
decode vs teacher forcing consistency, beam-search behavior."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.models.model import build_model  # noqa: E402
from neurst_tpu.models.transformer import Transformer  # noqa: E402
from neurst_tpu.layers.search.beam_search import sequence_beam_search  # noqa: E402
from neurst_tpu.layers.search.sampling import sequence_sampling  # noqa: E402

META = {"vocab_size": 17, "eos_id": 16, "bos_id": 16, "unk_id": 15}


def toy_model(post_norm=False, share_src_trg=False):
    args = Transformer.build_model_args_by_name("transformer_toy")
    cfg = dict(args["model.params"])
    cfg["dtype"] = "float32"
    cfg["modality.share_source_target_embedding"] = share_src_trg
    if post_norm:
        cfg["encoder.post_normalize"] = True
        cfg["decoder.post_normalize"] = True
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


@pytest.fixture(scope="module")
def model_and_params():
    model = toy_model()
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


INPUTS = {
    "src": np.array([[3, 4, 5, 16], [6, 7, 16, 16]], np.int32),
    "src_padding": np.array([[0, 0, 0, 0], [0, 0, 1, 1]], np.float32),
    "trg_input": np.array([[16, 2, 3, 4], [16, 5, 6, 16]], np.int32),
}


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    logits = model.call(params, INPUTS)
    assert logits.shape == (2, 4, 17)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_incremental_decode_matches_teacher_forcing(model_and_params):
    """Parity idea: transformer_test.py incremental-vs-forcing check."""
    model, params = model_and_params
    logits = model.call(params, INPUTS)
    s2l, init = model.prepare_generation(params, INPUTS,
                                         decode_padded_length=4)
    cache = init["decoder_internal_cache"]
    ids = jnp.asarray(INPUTS["trg_input"][:, 0])
    outs = []
    for t in range(4):
        lg, cache = s2l(ids, cache, t)
        outs.append(lg)
        if t < 3:
            ids = jnp.asarray(INPUTS["trg_input"][:, t + 1])
    diff = float(jnp.max(jnp.abs(jnp.stack(outs, 1) - logits)))
    assert diff < 2e-5, diff


def test_padding_invariance(model_and_params):
    """Extra source padding must not change the logits."""
    model, params = model_and_params
    logits = model.call(params, INPUTS)
    padded = {
        "src": np.pad(INPUTS["src"], [(0, 0), (0, 4)],
                      constant_values=META["eos_id"]),
        "src_padding": np.pad(INPUTS["src_padding"], [(0, 0), (0, 4)],
                              constant_values=1.0),
        "trg_input": INPUTS["trg_input"],
    }
    logits2 = model.call(params, padded)
    assert float(jnp.max(jnp.abs(logits - logits2))) < 2e-5


def test_beam_greedy_equals_argmax_rollout(model_and_params):
    model, params = model_and_params
    infer_inputs = dict(INPUTS)
    infer_inputs["trg_input"] = np.array([16, 16], np.int32)

    s2l, init = model.prepare_generation(params, infer_inputs,
                                         decode_padded_length=8)
    hyp, scores = sequence_beam_search(
        s2l, init, beam_size=1, top_k=1, maximum_decode_length=8,
        extra_decode_length=4)
    # manual argmax rollout
    s2l2, init2 = model.prepare_generation(params, infer_inputs,
                                           decode_padded_length=8)
    cache = init2["decoder_internal_cache"]
    ids = init2["decoder_input"]
    manual = []
    for t in range(8):
        lg, cache = s2l2(ids, cache, t)
        lp = jax.nn.log_softmax(lg.astype(jnp.float32))
        lp = lp.at[:, META["unk_id"]].add(-1e9)
        ids = jnp.argmax(lp, -1).astype(jnp.int32)
        manual.append(ids)
    manual = np.asarray(jnp.stack(manual, 1))
    hyp = np.asarray(hyp)
    # compare until the first EOS of each row
    for b in range(2):
        row = hyp[b]
        for t in range(min(8, len(row))):
            assert row[t] == manual[b, t]
            if row[t] == META["eos_id"]:
                break


def test_beam_hypotheses_distinct_and_sorted(model_and_params):
    model, params = model_and_params
    infer_inputs = dict(INPUTS)
    infer_inputs["trg_input"] = np.array([16, 16], np.int32)
    s2l, init = model.prepare_generation(params, infer_inputs,
                                         decode_padded_length=8)
    hyp, scores = sequence_beam_search(
        s2l, init, beam_size=4, top_k=4, maximum_decode_length=8,
        extra_decode_length=4)
    scores = np.asarray(scores).reshape(2, 4)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # sorted desc
    hyp = np.asarray(hyp).reshape(2, 4, -1)
    for b in range(2):
        rows = {tuple(r) for r in hyp[b]}
        assert len(rows) > 1  # beams explored distinct continuations


def test_sampling_runs_and_terminates(model_and_params):
    model, params = model_and_params
    infer_inputs = dict(INPUTS)
    infer_inputs["trg_input"] = np.array([16, 16], np.int32)
    s2l, init = model.prepare_generation(params, infer_inputs,
                                         decode_padded_length=8)
    ids, scores = sequence_sampling(
        s2l, init, jax.random.PRNGKey(3), top_k=5,
        maximum_decode_length=8, extra_decode_length=4)
    assert ids.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_post_norm_and_shared_embedding_variants():
    for post_norm, share in ((True, False), (False, True)):
        model = toy_model(post_norm=post_norm, share_src_trg=share)
        params = model.init_params(jax.random.PRNGKey(1))
        logits = model.call(params, INPUTS)
        assert bool(jnp.all(jnp.isfinite(logits)))
        if share:
            top = jax.tree_util.tree_structure(params)
            assert "shared_symbol_modality" in params
