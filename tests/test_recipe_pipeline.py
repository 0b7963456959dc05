"""End-to-end smoke of the augmented_librispeech recipe pipeline
(examples/speech_transformer/augmented_librispeech/02+03) on a tiny
synthetic corpus: raw zip -> transcript extraction -> fbank records ->
BPE learning -> projected ASR/ST records, all through the real CLIs.
"""

import io
import os
import struct
import wave
import zipfile

import numpy as np
import pytest


def _make_wav_bytes(num_samples=1600, rate=16000, seed=0):
    rng = np.random.RandomState(seed)
    pcm = (rng.randn(num_samples) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.fixture()
def corpus_zip(tmp_path):
    rows = [
        ("utt1.wav", "hello world", "bonjour le monde"),
        ("utt2.wav", "the quick brown fox", "le renard brun rapide"),
        ("utt3.wav", "speech translation works", "la traduction vocale marche"),
    ]
    path = tmp_path / "train_100h.zip"
    with zipfile.ZipFile(path, "w") as z:
        tsv = "\n".join("\t".join(r) for r in rows)
        z.writestr("train/alignments.tsv", tsv)
        for i, (wav, _, _) in enumerate(rows):
            z.writestr(f"train/audio/{wav}", _make_wav_bytes(seed=i))
    return str(path)


def test_librispeech_recipe_stages(corpus_zip, tmp_path):
    from neurst_tpu.cli import (create_records, extract_audio_transcripts,
                                learn_bpe)
    from neurst_tpu.data.recordio import (glob_record_files, parse_example,
                                          record_iterator)
    data = str(tmp_path)
    ts = os.path.join(data, "transcripts")
    os.makedirs(ts)

    # --- stage 2a: transcript extraction (reference flag spellings) ---
    extract_audio_transcripts.main([
        "--dataset", "AugmentedLibriSpeech",
        "--input_tarball", corpus_zip,
        "--output_transcript_file", f"{ts}/train.en.txt",
        "--output_translation_file", f"{ts}/train.fr.txt"])
    assert open(f"{ts}/train.en.txt").read().splitlines() == [
        "hello world", "the quick brown fox",
        "speech translation works"]

    # --- stage 2b: fbank feature records, no task ---
    os.makedirs(os.path.join(data, "train"))
    create_records.main([
        "--processor_id", "0", "--num_processors", "1",
        "--num_output_shards", "2",
        "--output_range_begin", "0", "--output_range_end", "2",
        "--dataset", "AugmentedLibriSpeech",
        "--feature_extractor.class", "fbank",
        "--feature_extractor.params", '{"nfilt": 8}',
        "--input_tarball", corpus_zip,
        "--output_template",
        os.path.join(data, "train", "train.tfrecords-%5.5d-of-%5.5d")])
    raw_files = glob_record_files(os.path.join(data, "train"))
    assert len(raw_files) == 2
    raw_examples = [parse_example(r)
                    for f in raw_files for r in record_iterator(f)]
    assert len(raw_examples) == 3
    ex = raw_examples[0]
    assert "audio" in ex and "transcript" in ex and "translation" in ex
    assert np.asarray(ex["audio"]).dtype.kind == "f"

    # --- stage 3a: learn joint BPE + vocabularies ---
    learn_bpe.main([
        "--input", f"{ts}/train.en.txt", f"{ts}/train.fr.txt",
        "--symbols", "40",
        "--output", f"{ts}/codes.bpe",
        "--write_vocabulary", f"{ts}/vocab.en", f"{ts}/vocab.fr"])
    assert open(f"{ts}/codes.bpe").readline().startswith("#version")

    # --- stage 3b: project both text sides into asr_st records ---
    asrst = os.path.join(data, "asr_st", "train")
    os.makedirs(asrst)
    task_params = f"""
audio_feature_dim: 8
transcript_data_pipeline.class: TranscriptDataPipeline
transcript_data_pipeline.params:
    lowercase: True
    language: en
    subtokenizer: bpe
    subtokenizer_codes: {ts}/codes.bpe
    vocab_path: {ts}/vocab.en
translation_data_pipeline.class: TranscriptDataPipeline
translation_data_pipeline.params:
    language: fr
    subtokenizer: bpe
    subtokenizer_codes: {ts}/codes.bpe
    vocab_path: {ts}/vocab.fr
"""
    create_records.main([
        "--processor_id", "0", "--num_processors", "1",
        "--num_output_shards", "1",
        "--dataset", "AudioTripleTFRecordDataset",
        "--feature_key", "audio",
        "--transcript_key", "transcript",
        "--translation_key", "translation",
        "--data_path", os.path.join(data, "train"),
        "--task", "MultiTaskSpeechTranslation",
        "--task.params", task_params,
        "--output_template",
        os.path.join(asrst, "train.tfrecords-%5.5d-of-%5.5d")])
    proj_files = glob_record_files(asrst)
    projected = [parse_example(r)
                 for f in proj_files for r in record_iterator(f)]
    assert len(projected) == 3
    for ex in projected:
        assert np.asarray(ex["transcript"]).dtype.kind == "i"
        assert np.asarray(ex["translation"]).dtype.kind == "i"
        assert len(np.asarray(ex["transcript"])) > 0
        assert len(np.asarray(ex["translation"])) > 0


def test_mustc_extraction_split(tmp_path):
    """The MuSTC adapter's --extraction flag selects one split from an
    archive holding several (parity: reference must-c recipes)."""
    import tarfile
    import yaml as _yaml
    from neurst_tpu.data.datasets.dataset import build_dataset

    wav = _make_wav_bytes(num_samples=32000, seed=7)  # 2 s @ 16k
    path = tmp_path / "MUSTC_v1.0_en-de.tar.gz"
    with tarfile.open(path, "w:gz") as tar:
        def add(name, data):
            import io as _io
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, _io.BytesIO(data))
        for split, text in (("train", "hello"), ("dev", "goodbye")):
            segs = [{"wav": f"{split}.wav", "offset": 0.0,
                     "duration": 1.0, "speaker_id": "s"}]
            add(f"en-de/data/{split}/wav/{split}.wav", wav)
            add(f"en-de/data/{split}/txt/{split}.yaml",
                _yaml.safe_dump(segs).encode())
            add(f"en-de/data/{split}/txt/{split}.en",
                f"{text} en\n".encode())
            add(f"en-de/data/{split}/txt/{split}.de",
                f"{text} de\n".encode())
    for split, text in (("train", "hello"), ("dev", "goodbye")):
        ds = build_dataset({
            "dataset.class": "MuSTC",
            "dataset.params": {"input_tarball": str(path),
                               "trg_lang": "de",
                               "extraction": split}})
        examples = list(ds.build_iterator()())
        assert len(examples) == 1
        assert examples[0]["transcript"] == f"{text} en"
        assert examples[0]["translation"] == f"{text} de"
