"""Cross-validate the hand-rolled tokenized BLEU against the sacrebleu
package on real English text: the v13a tokenization and the corpus BLEU
formula must agree (parity: the reference ships both bleu.py:32-120 and
sacrebleu paths and expects them to match on detokenized text)."""

import numpy as np
import pytest

sacrebleu = pytest.importorskip("sacrebleu")

HYPOS = [
    "the quick brown fox jumps over the lazy dog.",
    "a speech translation toolkit, built for TPUs!",
    "results were 28.4 BLEU on newstest2014 (en-de).",
    "quantization-aware training keeps quality at int8.",
    "it streams source words and writes translations early.",
]
REFS = [
    "the quick brown fox jumped over the lazy dog.",
    "a speech translation toolkit built for TPUs!",
    "results were 28.4 BLEU points on newstest2014 (en-de).",
    "quantization aware training keeps the quality at int8.",
    "it streams source words and writes the translation early.",
]


def test_tokenized_bleu_matches_sacrebleu_13a():
    from neurst_tpu.metrics.metric import build_metric
    ours = build_metric({"metric.class": "bleu", "metric.params": {}})(
        HYPOS, REFS)
    theirs = sacrebleu.corpus_bleu(HYPOS, [REFS], tokenize="13a").score
    assert abs(ours["BLEU"] - theirs) < 0.05, (ours["BLEU"], theirs)


def test_uncased_matches_sacrebleu_lowercased():
    from neurst_tpu.metrics.metric import build_metric
    upper = [h.upper() for h in HYPOS]
    ours = build_metric({"metric.class": "bleu", "metric.params": {}})(
        upper, REFS)
    theirs = sacrebleu.corpus_bleu(
        upper, [REFS], tokenize="13a", lowercase=True).score
    assert abs(ours["UncasedBLEU"] - theirs) < 0.05, \
        (ours["UncasedBLEU"], theirs)


def test_degenerate_cases_agree():
    from neurst_tpu.metrics.metric import build_metric
    metric = build_metric({"metric.class": "bleu", "metric.params": {}})
    # perfect match -> 100
    assert abs(metric(REFS, REFS)["BLEU"] - 100.0) < 1e-6
    # no overlap -> ~0, no crash
    res = metric(["zzz yyy xxx www"] * len(REFS), REFS)
    assert res["BLEU"] < 1.0
