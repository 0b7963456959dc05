"""Tests for vocab / BPE / text pipeline / record IO / bucketed batching."""

import numpy as np
import pytest

from neurst_tpu.data import dataset_utils
from neurst_tpu.data.data_pipelines.text_data_pipeline import TextDataPipeline
from neurst_tpu.data.recordio import (RecordWriter, build_example,
                                      parse_example, record_iterator)
from neurst_tpu.data.text.bpe import BPE
from neurst_tpu.data.text.vocab import Vocab


def test_vocab_basics(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("hello 5\nworld 3\nfoo\n")
    v = Vocab.load_from_file(str(p), extra_tokens=["<unk>"])
    assert v.vocab_size == 4
    assert v.map_token_to_id("hello") == 0
    assert v.map_token_to_id("nope", unknown_default=3) == 3
    assert v.map_id_to_token([0, 1]) == ["hello", "world"]


def test_bpe_apply_and_detok():
    bpe = BPE()
    # codes: merge l+o, lo+w, e+r</w>
    bpe.init_subtokenizer(["#version: 0.2", "l o", "lo w", "e r</w>"])
    toks = bpe.tokenize("low lower", return_str=False)
    # "low" = (l,o,w</w>): l+o -> lo; lo+w</w> not a code -> [lo@@, w]
    # "lower" = (l,o,w,e,r</w>): l+o, lo+w, e+r</w> -> [low@@, er]
    assert toks == ["lo@@", "w", "low@@", "er"]
    detok = bpe.detokenize(" ".join(toks), return_str=True)
    assert detok == "low lower"


def test_text_pipeline_roundtrip(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("a\nb\nc\nd\n")
    pipeline = TextDataPipeline(vocab_path=str(p), language="en")
    meta = pipeline.meta
    # 4 tokens + unk + bos + eos (pad == eos)
    assert meta["vocab_size"] == 7
    ids = pipeline.encode("a b d", is_processed=True)
    assert ids[-1] == meta["eos_id"]
    assert pipeline.decode(ids) == "a b d"
    # decode strips bos and stops at eos
    assert pipeline.decode([meta["bos_id"]] + ids + [0, 1]) == "a b d"


def test_recordio_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecords")
    examples = [
        {"feature": np.array([1, 2, 3], np.int64),
         "label": np.array([4, 5], np.int64)},
        {"feature": np.array([7], np.int64),
         "label": np.array([8, 9, 10], np.int64)},
    ]
    with RecordWriter(path) as w:
        for ex in examples:
            w.write(build_example(ex))
    out = [parse_example(r) for r in record_iterator(path, check_crc=True)]
    assert len(out) == 2
    np.testing.assert_array_equal(out[0]["feature"], [1, 2, 3])
    np.testing.assert_array_equal(out[1]["label"], [8, 9, 10])


def test_recordio_tf_compat(tmp_path):
    """Our writer's files parse with TensorFlow, and vice versa."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "ours.tfrecords")
    with RecordWriter(path) as w:
        w.write(build_example({"feature": np.array([1, 2, 3], np.int64),
                               "audio": np.array([0.5, -1.5], np.float32),
                               "txt": [b"hello"]}))
    ds = tf.data.TFRecordDataset(path)
    for raw in ds:
        ex = tf.train.Example()
        ex.ParseFromString(raw.numpy())
        assert list(ex.features.feature["feature"].int64_list.value) == [1, 2, 3]
        assert list(ex.features.feature["txt"].bytes_list.value) == [b"hello"]
        np.testing.assert_allclose(
            list(ex.features.feature["audio"].float_list.value), [0.5, -1.5])

    # TF-written file parses with our reader
    path2 = str(tmp_path / "theirs.tfrecords")
    with tf.io.TFRecordWriter(path2) as w:
        ex = tf.train.Example(features=tf.train.Features(feature={
            "feature": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[9, 8])),
            "audio": tf.train.Feature(
                float_list=tf.train.FloatList(value=[1.25])),
        }))
        w.write(ex.SerializeToString())
    got = [parse_example(r) for r in record_iterator(path2, check_crc=True)]
    np.testing.assert_array_equal(got[0]["feature"], [9, 8])
    np.testing.assert_allclose(got[0]["audio"], [1.25])


def test_bucket_boundaries():
    bounds = dataset_utils.create_batch_bucket_boundaries(100)
    assert bounds[-1] >= 100
    assert all(b % 8 == 0 for b in bounds)
    assert bounds == sorted(set(bounds))

    a = [8, 16, 24, 32]
    b = [8, 16]
    aa, bb = dataset_utils.associated_bucket_boundaries(a, b)
    assert len(aa) == len(bb) == 2


def test_bucketed_batching_static_shapes():
    rng = np.random.RandomState(0)
    examples = []
    for _ in range(200):
        ls = rng.randint(1, 30)
        lt = rng.randint(1, 30)
        examples.append({"feature": list(range(ls)), "label": list(range(lt))})
    bounds = {"feature": [8, 16, 32], "label": [8, 16, 32]}
    batches = list(dataset_utils.batch_by_tokens_bucketed(
        iter(examples), batch_size_in_tokens=256,
        bucket_boundaries=bounds, padding_values={"feature": 0, "label": 0},
        length_fn=lambda ex: {"feature": len(ex["feature"]),
                              "label": len(ex["label"])}))
    shapes = set()
    total = 0
    for b in batches:
        shapes.add((b["feature"].shape, b["label"].shape))
        total += int(b["sample_mask"].sum())
    assert total == 200
    assert len(shapes) <= 3  # bounded compiled-shape set
    for b in batches:
        assert b["feature"].shape[0] % 8 == 0 or b["feature"].shape[0] >= 1


def test_fixed_size_batching():
    examples = [{"feature": [1] * n} for n in (3, 5, 10, 2, 7)]
    batches = list(dataset_utils.batch_fixed_size(
        iter(examples), batch_size=2, padding_values={"feature": 0},
        fields=["feature"]))
    assert len(batches) == 3
    assert batches[0]["feature"].shape == (2, 8)
    assert batches[2]["sample_mask"].tolist() == [1.0, 0.0]


def test_shuffle_and_prefetch():
    data = list(range(100))
    out = list(dataset_utils.prefetch_iterator(
        dataset_utils.shuffle_iterator(iter(data), 10, seed=3)))
    assert sorted(out) == data
    assert out != data


def test_lowercase_and_remove_punctuations():
    from neurst_tpu.data.data_pipelines.data_pipeline import \
        lowercase_and_remove_punctuations as norm
    assert norm("en", "Hello, World!") == "hello world"
    assert norm("en", "Hello, World!", lowercase=False) == "Hello World"
    # apostrophe re-joining after Moses punct normalization
    assert "don't" in norm("en", "DON'T stop", remove_punctuation=False)
    # CJK: no Moses normalization, punctuation still stripped
    assert norm("zh", "你好，世界。") == "你好 世界"


def test_text_pipeline_transcript_cleanup(tmp_path):
    from neurst_tpu.data.data_pipelines.text_data_pipeline import \
        TextDataPipeline
    vocab = tmp_path / "v.txt"
    vocab.write_text("hello\nworld\n")
    p = TextDataPipeline(vocab_path=str(vocab), language="en",
                         lowercase=True, remove_punctuation=True)
    assert p.preprocess("Hello, WORLD!") == "hello world"
    # defaults leave case/punctuation alone
    p2 = TextDataPipeline(vocab_path=str(vocab), language="en")
    assert p2.preprocess("Hello, WORLD!") == "Hello, WORLD!"


def test_wer_normalizes_case_and_punctuation():
    from neurst_tpu.metrics.wer import WER
    m = WER()
    res = m(["Hello, world!"], ["hello world"])
    assert res["WER"] == 0.0
    res = m(["hello there world"], ["Hello, world."])
    assert res["WER"] == 50.0  # one insertion over two ref words
