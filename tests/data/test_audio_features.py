"""fbank / SpecAugment / speech-task bucketing tests."""

import math

import numpy as np
import pytest

from neurst_tpu.data.audio.log_mel_fbank import (LogMelFbank, get_filterbanks,
                                                 hz2mel, logfbank, mel2hz)
from neurst_tpu.utils.audio_lib import SpecAugment


def test_mel_scale_roundtrip():
    hz = np.array([0.0, 300.0, 1000.0, 8000.0])
    np.testing.assert_allclose(mel2hz(hz2mel(hz)), hz, rtol=1e-9)
    assert abs(hz2mel(1000.0) - 999.9855) < 0.01  # canonical HTK value


def test_frame_count_formula():
    """python_speech_features: 1 + ceil((n - frame_len)/frame_step)."""
    fe = LogMelFbank({"nfilt": 20})
    for n in (100, 400, 401, 560, 16000):
        frames = logfbank(np.random.RandomState(0).randn(n),
                          nfilt=20).shape[0]
        if n <= 400:
            expected = 1
        else:
            expected = 1 + math.ceil((n - 400) / 160)
        assert frames == expected, n
        assert fe.seq_len_fn(n) == expected


def test_filterbank_shape_and_partition():
    fb = get_filterbanks(26, 512, 16000)
    assert fb.shape == (26, 257)
    # triangles are non-negative and each filter has support
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()


def test_cmvn():
    fe = LogMelFbank({"nfilt": 20})
    feat = fe(np.random.RandomState(0).randn(16000) * 1000, 16000)
    np.testing.assert_allclose(feat.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(feat.std(axis=0), 1.0, atol=1e-3)


def test_cmvn_scale_invariance():
    """CMVN makes features invariant to waveform scaling (the wav/flac
    int16-scale convention therefore cannot shift results)."""
    fe = LogMelFbank({"nfilt": 20})
    wav = np.random.RandomState(1).randn(8000)
    f1 = fe(wav, 16000)
    f2 = fe(wav * 1000.0, 16000)
    np.testing.assert_allclose(f1, f2, atol=1e-4)


def test_specaugment_presets_and_masking():
    spec = SpecAugment.build("LB")
    x = np.random.RandomState(0).randn(200, 80).astype(np.float32) + 5
    rng = np.random.RandomState(3)
    y = spec.apply_numpy(x, rng)
    assert y.shape == x.shape
    changed = (y != x)
    assert changed.any()  # something was masked
    # masked values equal the spectrogram mean
    masked_vals = y[changed]
    np.testing.assert_allclose(masked_vals, x.mean(), atol=1e-4)


def test_specaugment_jax_matches_semantics():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    spec = SpecAugment.build("LB")
    x = jnp.asarray(np.random.RandomState(0).randn(64, 20), jnp.float32)
    y = spec.apply_jax(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_speech_task_bucketing_shapes(tmp_path):
    """The 2-D bucketed iterator emits only announced static shapes."""
    import io
    from neurst_tpu.data.recordio import RecordWriter, build_example
    from neurst_tpu.tasks.task import build_task

    vocab = tmp_path / "v.txt"
    vocab.write_text("".join(f"c{i}\n" for i in range(10)))
    path = str(tmp_path / "train.tfrecords")
    rng = np.random.RandomState(0)
    with RecordWriter(path) as w:
        for _ in range(80):
            frames = rng.randint(20, 120)
            w.write(build_example({
                "audio": rng.randn(frames * 8).astype(np.float32),
                "transcript": rng.randint(0, 10, size=rng.randint(
                    2, 12)).astype(np.int64)}))
    task = build_task({"task.class": "speech2text", "task.params": {
        "transcript_data_pipeline.class": "TextDataPipeline",
        "transcript_data_pipeline.params": {"vocab_path": str(vocab)},
        "audio_feature_dim": 8,
        "batch_size": 2048, "max_src_len": 128, "max_trg_len": 16,
        "min_src_bucket_boundary": 32,
        "experimental_frame_transcript_ratio": 8.0}})
    from neurst_tpu.data.datasets.dataset import build_dataset
    ds = build_dataset({"dataset.class": "audio_tfrecord",
                        "dataset.params": {"data_path": path}})
    from neurst_tpu.utils.compat import ModeKeys
    it = task.create_batch_iterator(ds, ModeKeys.TRAIN)
    shapes = set()
    total = 0
    for batch in it():
        shapes.add((batch["src"].shape, batch["trg"].shape))
        total += int(batch["sample_mask"].sum())
        for f in ("src", "src_length", "trg", "trg_input", "trg_padding"):
            assert f in batch
    assert total == 80
    assert len(shapes) <= 12  # bounded compiled-shape set


def test_gigaspeech_subset_filter_and_gigast_merge(tmp_path):
    """GigaSpeech adapter: subset filtering at audio+segment level,
    garbage drop, punctuation-tag mapping, GigaST sid-keyed translation
    merge (parity: reference audio/gigaspeech.py:27-103 and
    examples/speech_transformer/gigast/convert_data.py)."""
    import json
    import tarfile
    import wave

    import numpy as np

    from neurst_tpu.data.datasets.dataset import build_dataset

    wav = tmp_path / "POD1.wav"
    x = (np.random.RandomState(0).randn(16000) * 3000).astype(np.int16)
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    index = {"audios": [
        {"path": "audio/POD1.wav", "subsets": ["{XL}"], "segments": [
            {"sid": "POD1_1", "begin_time": 0.0, "end_time": 0.5,
             "subsets": ["{XL}"],
             "text_tn": "HELLO <COMMA> WORLD <PERIOD>"},
            {"sid": "POD1_2", "begin_time": 0.5, "end_time": 0.7,
             "subsets": ["{XL}"], "text_tn": "<NOISE>"},
            {"sid": "POD1_3", "begin_time": 0.7, "end_time": 0.9,
             "subsets": ["{S}"], "text_tn": "S ONLY"}]}]}
    idx = tmp_path / "GigaSpeech.json"
    idx.write_text(json.dumps(index))
    st = tmp_path / "gigast.json"
    st.write_text(json.dumps({"audios": [{"segments": [
        {"sid": "POD1_1", "text_raw": "hallo, welt."}]}]}))
    tar = tmp_path / "g.tar"
    with tarfile.open(tar, "w") as t:
        t.add(idx, arcname="GigaSpeech.json")
        t.add(wav, arcname="audio/POD1.wav")

    ds = build_dataset({"dataset.class": "gigaspeech",
                        "dataset.params": {
                            "input_tarball": str(tar), "subset": "XL",
                            "extra_translation_json": str(st)}})
    examples = list(ds.build_iterator()())
    assert len(examples) == 1  # garbage + wrong-subset dropped
    ex = examples[0]
    assert ex["transcript"] == "hello, world."
    assert ex["translation"] == "hallo, welt."
    assert ex["audio_length"] == 8000  # 0.5s @ 16kHz, no extractor
