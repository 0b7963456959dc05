"""Speech end-to-end smoke: waveform -> own fbank -> records -> ASR
training -> beam decode + WER, all through the real CLI."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_asr_train_and_predict(tmp_path):
    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.data.audio.log_mel_fbank import LogMelFbank
    from neurst_tpu.data.recordio import RecordWriter, build_example

    rng = np.random.RandomState(0)
    fe = LogMelFbank({"nfilt": 16})
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("".join(f"c{i}\n" for i in range(8)))
    rec = str(tmp_path / "train.tfrecords")
    with RecordWriter(rec) as w:
        for _ in range(48):
            wav = rng.randn(rng.randint(4000, 8000))
            feat = fe(wav, 16000)
            ids = rng.randint(0, 8, size=rng.randint(2, 6))
            w.write(build_example({
                "audio": feat.reshape(-1).astype(np.float32),
                "transcript": ids.astype(np.int64)}))

    import yaml
    cfg = {
        "task.class": "speech2text",
        "task.params": {
            "transcript_data_pipeline.class": "TextDataPipeline",
            "transcript_data_pipeline.params": {"vocab_path": str(vocab)},
            "audio_feature_dim": 16,
            "batch_size": 1024, "max_src_len": 64, "max_trg_len": 8,
            "min_src_bucket_boundary": 32,
            "experimental_frame_transcript_ratio": 12.0,
            "specaug": "SM"},
        "dataset.class": "audio_tfrecord",
        "dataset.params": {"data_path": rec},
        "hparams_set": "speech_transformer_toy",
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "label_smoothed_cross_entropy",
            "lr_schedule.class": "constant",
            "lr_schedule.params": {"learning_rate": 1e-3},
            "train_steps": 8, "summary_steps": 4,
            "save_checkpoint_steps": 8},
    }
    cfg_path = tmp_path / "train.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train", "--config_paths", str(cfg_path),
              "--model_dir", model_dir])
    assert os.path.exists(os.path.join(model_dir, "ckpt-8.npz"))

    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset", "audio_tfrecord", "--data_path", rec,
         "--batch_size", "16", "--beam_size", "2",
         "--maximum_decode_length", "8", "--metric", "wer"])
    assert result["samples"] == 48
    assert "WER" in result
