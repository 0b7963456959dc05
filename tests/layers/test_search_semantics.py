"""Beam-search semantic tests against hand-computed values
(parity strategy: tests/neurst/layers/search/beam_search_test.py)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.layers.search.beam_search import (_length_penalty,  # noqa: E402
                                                  sequence_beam_search)

EOS = 3
UNK = 2
VOCAB = 4


def make_s2l(step_logits):
    """step_logits: list over time of [vocab] logits (same for all rows)."""

    def s2l(ids, cache, time):
        t = cache["t"]
        logits = jnp.zeros((ids.shape[0], VOCAB), jnp.float32)
        table = jnp.asarray(step_logits, jnp.float32)
        idx = jnp.minimum(time, len(step_logits) - 1)
        logits = logits + table[idx][None, :]
        return logits, {"t": t + 1}
    return s2l


def run_search(step_logits, batch=1, **kw):
    init = {
        "decoder_input": jnp.zeros([batch], jnp.int32),
        "decoder_internal_cache": {"t": jnp.zeros([batch], jnp.int32)},
        "encoder_inputs_maxlen": None,
        "eos_id": EOS,
        "unk_id": UNK,
    }
    return sequence_beam_search(make_s2l(step_logits), init, **kw)


def test_decode_unroll_exact():
    """decode_unroll runs N steps per while iteration; hypotheses and
    scores must match unroll=1 exactly — including when the dynamic
    max_steps (enc_maxlen + extra) is NOT a multiple of the unroll
    (the stepwise tail loop), when beams finish early inside an
    unrolled group, and when the grid forces the unroll=1 fallback."""
    rng = np.random.RandomState(7)
    step_logits = rng.randn(8, VOCAB).astype(np.float32) * 2.0
    # make EOS attractive mid-way so early exit happens
    step_logits[3, EOS] = 4.0

    def run(unroll, maxlen=8, enc_maxlen=None, extra=8):
        init = {
            "decoder_input": jnp.zeros([2], jnp.int32),
            "decoder_internal_cache": {"t": jnp.zeros([2], jnp.int32)},
            "encoder_inputs_maxlen": enc_maxlen,
            "eos_id": EOS,
            "unk_id": UNK,
        }
        return sequence_beam_search(
            make_s2l(step_logits), init, beam_size=2, top_k=2,
            maximum_decode_length=maxlen, extra_decode_length=extra,
            decode_unroll=unroll)

    base_h, base_s = run(1)
    for u in (2, 3, 4):
        h, s = run(u)
        np.testing.assert_array_equal(np.asarray(h), np.asarray(base_h))
        np.testing.assert_allclose(np.asarray(s), np.asarray(base_s),
                                   atol=1e-6)
    # ragged max_steps: enc_maxlen 2 + extra 4 = 6 decode steps, not a
    # multiple of 4 -> phase 1 covers 4, the tail loop the last 2
    base_h, base_s = run(1, enc_maxlen=jnp.asarray(2), extra=4)
    h, s = run(4, enc_maxlen=jnp.asarray(2), extra=4)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(base_h))
    np.testing.assert_allclose(np.asarray(s), np.asarray(base_s),
                               atol=1e-6)
    # grid not a multiple of the unroll -> exact via the u=1 fallback
    h, s = run(5)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(run(1)[0]))


def test_length_penalty_formula():
    """GNMT: ((5+len)/6)^-alpha; negative alpha -> 1/len."""
    lengths = jnp.asarray([1, 5, 10])
    p = np.asarray(_length_penalty(lengths, 0.6))
    expected = ((5.0 + np.array([1, 5, 10])) / 6.0) ** -0.6
    np.testing.assert_allclose(p, expected, rtol=1e-6)
    p2 = np.asarray(_length_penalty(lengths, -1.0))
    np.testing.assert_allclose(p2, 1.0 / np.array([1, 5, 10]), rtol=1e-6)


def test_unk_never_generated():
    # UNK has by far the highest logit every step
    logits = [[0.0, 1.0, 9.0, -1.0]] * 6
    hyp, _ = run_search(logits, beam_size=2, maximum_decode_length=6)
    assert UNK not in np.asarray(hyp)


def test_unk_allowed_when_enabled():
    logits = [[0.0, 1.0, 9.0, -1.0]] * 6
    hyp, _ = run_search(logits, beam_size=2, maximum_decode_length=6,
                        enable_unk=True)
    assert UNK in np.asarray(hyp)


def test_minimum_decode_length_masks_eos():
    # EOS dominates from step 0; min length forces 3 non-EOS tokens
    logits = [[0.0, 1.0, -9.0, 9.0]] * 8
    hyp, _ = run_search(logits, beam_size=2, maximum_decode_length=8,
                        minimum_decode_length=4)
    row = np.asarray(hyp)[0]
    eos_pos = list(row).index(EOS)
    assert eos_pos >= 3  # 4th emitted token at the earliest


def test_finished_beams_stay_finished():
    # EOS immediately; remaining positions must stay EOS (forced)
    logits = [[0.0, 1.0, -9.0, 9.0]] * 6
    hyp, scores = run_search(logits, beam_size=2, maximum_decode_length=6)
    row = np.asarray(hyp)[0]
    first_eos = list(row).index(EOS)
    assert all(x == EOS for x in row[first_eos:first_eos + 1])


def test_scores_are_length_normalized_logprobs():
    # deterministic single path: token 1 then EOS
    logits = [[-9.0, 5.0, -9.0, -9.0], [-9.0, -9.0, -9.0, 5.0]]
    hyp, scores = run_search(logits, beam_size=2, maximum_decode_length=4,
                             length_penalty=0.6)
    lp1 = jax.nn.log_softmax(jnp.asarray(logits[0]))[1]
    lp2 = jax.nn.log_softmax(jnp.asarray(logits[1]))[EOS]
    expected = float((lp1 + lp2) * ((5.0 + 2.0) / 6.0) ** -0.6)
    assert abs(float(scores[0]) - expected) < 1e-4


def test_batch_rows_independent():
    logits = [[0.0, 2.0, -9.0, 1.0]] * 5
    hyp, scores = run_search(logits, batch=3, beam_size=3,
                             maximum_decode_length=5, top_k=1)
    rows = np.asarray(hyp)
    assert rows.shape[0] == 3
    np.testing.assert_array_equal(rows[0], rows[1])
    np.testing.assert_array_equal(rows[1], rows[2])


def test_noam_schedule_formula_and_resume():
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.utils import compat
    compat.register_initial_step(0)
    sched = NoamSchedule({"dmodel": 512, "warmup_steps": 4000,
                          "initial_factor": 1.0})
    for step in (0, 999, 3999, 4000, 10000):
        got = float(sched(step))
        s = step + 1
        expected = (512 ** -0.5) * min(1.0, s / 4000) \
            / math.sqrt(max(s, 4000))
        assert abs(got - expected) < 1e-9, step
    # resume: registered initial step shifts the schedule
    compat.register_initial_step(5000)
    sched2 = NoamSchedule({"dmodel": 512, "warmup_steps": 4000,
                           "initial_factor": 1.0})
    assert abs(float(sched2(0)) - float(sched(5000))) < 1e-9
    compat.register_initial_step(0)


def test_label_smoothing_golden():
    """Hand-computed label-smoothed CE on a 3-class toy."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    logits = np.log(np.array([[[0.7, 0.2, 0.1]]], np.float32))
    inp = {"trg": np.array([[0]], np.int32),
           "trg_padding": np.zeros([1, 1], np.float32)}
    eps = 0.1
    crit = LabelSmoothedCrossEntropy({"label_smoothing": eps})
    nll_sum, n_samples, n_tokens = crit(inp, jnp.asarray(logits))
    conf, low = 1 - eps, eps / 2
    soft = np.array([conf, low, low])
    xent = -(soft * np.log([0.7, 0.2, 0.1])).sum()
    norm = -(conf * math.log(conf) + 2 * low * math.log(low + 1e-20))
    np.testing.assert_allclose(float(nll_sum[0]), xent - norm, rtol=1e-5)
    assert float(n_tokens[0]) == 1.0
