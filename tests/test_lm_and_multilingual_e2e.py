"""CLI end-to-end coverage for the language-model and multilingual
translation tasks (parity: reference tasks/language_model.py and
tasks/multilingual_translation.py + their example configs)."""

import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_lm_train_and_eval_ppl(tmp_path):
    """GPT-2 style LM: CLI train on mono text, then the eval entry
    reports a finite PPL on held-out text."""
    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    cfg = {
        "task.class": "lm",
        "task.params": {
            "data_pipeline.class": "TextDataPipeline",
            "data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "batch_size": 64, "batch_by_tokens": True,
            "max_len": 16},
        "dataset.class": "mono_text",
        "dataset.params": {"data_file": "tests/examples/train.src"},
        "model.class": "gpt2",
        "model.params": {
            "num_layers": 1, "hidden_size": 16,
            "num_attention_heads": 2, "filter_size": 32,
            "max_position_embeddings": 32},
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "label_smoothed_cross_entropy",
            "lr_schedule.class": "constant",
            "lr_schedule.params": {"learning_rate": 1e-3},
            "train_steps": 10, "summary_steps": 10,
            "save_checkpoint_steps": 10},
    }
    cfg_path = tmp_path / "lm.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    model_dir = str(tmp_path / "lm_model")
    cli_main(["--entry", "train", "--config_paths", str(cfg_path),
              "--model_dir", model_dir])
    assert os.path.exists(os.path.join(model_dir, "ckpt-10.npz"))

    res = cli_main(["--entry", "eval", "--model_dir", model_dir,
                    "--dataset.class", "mono_text",
                    "--dataset.params",
                    "{data_file: tests/examples/dev.src}",
                    "--batch_size", "64"])
    assert res["PPL"] > 1.0 and res["PPL"] < 1e9


@pytest.mark.slow
def test_multilingual_train_and_predict(tmp_path):
    """Many-to-many MT: two directions (en<->fr over the reversal
    corpus) mixed by explicit ratios, language-tagged; per-direction
    predict scores BLEU."""
    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    directions = {
        "en2fr": {"dataset.class": "multilingual_translation_dataset",
                  "dataset.params": {
                      "src_file": "tests/examples/train.src",
                      "trg_file": "tests/examples/train.trg",
                      "src_lang": "en", "trg_lang": "fr"}},
        "fr2en": {"dataset.class": "multilingual_translation_dataset",
                  "dataset.params": {
                      "src_file": "tests/examples/train.trg",
                      "trg_file": "tests/examples/train.src",
                      "src_lang": "fr", "trg_lang": "en"}},
    }
    cfg = {
        "task.class": "multilingual_translation",
        "task.params": {
            "multilingual_dp.params": {
                "vocab_path": "tests/examples/vocab.txt",
                "languages": ["en", "fr"],
                "tokenizer": None},
            "with_src_lang_tag": True,
            "trg_lang_tag_position": "trg",
            "batch_size": 64, "batch_by_tokens": True,
            "max_src_len": 18, "max_trg_len": 18},
        "dataset.class": "mixed_train",
        "dataset.params": {
            "data_files": directions,
            "data_sampler.class": "data_sampler",
            "data_sampler.params": {"sample_ratios": {"en2fr": 0.5,
                                                      "fr2en": 0.5}}},
        "model.class": "transformer",
        "model.params": {
            "modality.share_source_target_embedding": True,
            "modality.share_embedding_and_softmax_weights": True,
            "modality.dim": 16, "modality.timing": "sinusoids",
            "encoder.num_layers": 1, "encoder.hidden_size": 16,
            "encoder.num_attention_heads": 2, "encoder.filter_size": 32,
            "decoder.num_layers": 1, "decoder.hidden_size": 16,
            "decoder.num_attention_heads": 2, "decoder.filter_size": 32},
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "label_smoothed_cross_entropy",
            "lr_schedule.class": "constant",
            "lr_schedule.params": {"learning_rate": 1e-3},
            "train_steps": 10, "summary_steps": 10,
            "save_checkpoint_steps": 10},
    }
    cfg_path = tmp_path / "ml.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    model_dir = str(tmp_path / "ml_model")
    cli_main(["--entry", "train", "--config_paths", str(cfg_path),
              "--model_dir", model_dir])
    assert os.path.exists(os.path.join(model_dir, "ckpt-10.npz"))

    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset.class", "multilingual_translation_dataset",
         "--dataset.params", yaml.safe_dump({
             "src_file": "tests/examples/dev.src",
             "trg_file": "tests/examples/dev.trg",
             "src_lang": "en", "trg_lang": "fr"}),
         "--search_method.params",
         "{beam_size: 2, maximum_decode_length: 20}",
         "--metric", "bleu"])
    assert result["samples"] == 24
    assert "BLEU" in result
    # language tags must never leak into the hypotheses
    for h in result["hypotheses"]:
        assert "<fr>" not in h and "<en>" not in h, h


@pytest.mark.slow
def test_ctnmt_dynamic_switch_train_and_predict(tmp_path):
    """CTNMT end-to-end: gated BERT/encoder dynamic-switch fusion with
    frozen BERT and asymmetric-distillation criterion, trained through
    the CLI and decoded (parity: examples/ctnmt dynamic_switch +
    asy_distillation configs, reference ctnmt_transformer.py)."""
    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    cfg = {
        "task.class": "translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "batch_size": 64, "batch_by_tokens": True,
            "max_src_len": 16, "max_trg_len": 16},
        "dataset.class": "parallel_text",
        "dataset.params": {"src_file": "tests/examples/train.src",
                           "trg_file": "tests/examples/train.trg"},
        "model.class": "ctnmt",
        "model.params": {
            "bert_mode": "dynamic_switch",
            "modality.share_embedding_and_softmax_weights": True,
            "modality.dim": 16, "modality.timing": "sinusoids",
            "encoder.num_layers": 1, "encoder.hidden_size": 16,
            "encoder.num_attention_heads": 2, "encoder.filter_size": 32,
            "decoder.num_layers": 1, "decoder.hidden_size": 16,
            "decoder.num_attention_heads": 2, "decoder.filter_size": 32,
            "bert.num_layers": 1, "bert.hidden_size": 16,
            "bert.num_attention_heads": 2},
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "label_smoothed_cross_entropy",
            "lr_schedule.class": "constant",
            "lr_schedule.params": {"learning_rate": 1e-3},
            "freeze_variables": "bert",
            "train_steps": 10, "summary_steps": 10,
            "save_checkpoint_steps": 10},
    }
    cfg_path = tmp_path / "ctnmt.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    model_dir = str(tmp_path / "ctnmt_model")
    cli_main(["--entry", "train", "--config_paths", str(cfg_path),
              "--model_dir", model_dir])
    import numpy as np
    ckpt = np.load(os.path.join(model_dir, "ckpt-10.npz"))
    bert_vars = [k for k in ckpt.files if k.startswith("bert")]
    assert bert_vars, "CTNMT must carry a BERT trunk"
    gate_vars = [k for k in ckpt.files
                 if "gate" in k or "switch" in k or "fusion" in k]
    assert gate_vars, f"dynamic-switch gate params missing: " \
                      f"{[k for k in ckpt.files if 'encoder' not in k][:10]}"

    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset.class", "parallel_text",
         "--dataset.params", "{src_file: tests/examples/dev.src, "
                             "trg_file: tests/examples/dev.trg}",
         "--search_method.params",
         "{beam_size: 2, maximum_decode_length: 16}",
         "--metric", "bleu"])
    assert result["samples"] == 24 and "BLEU" in result


@pytest.mark.slow
def test_lightconv_train_and_predict(tmp_path):
    """Pay-Less-Attention light convolutions end-to-end through the CLI
    (parity: reference light_convolution_model.py + layers)."""
    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    model_dir = str(tmp_path / "lc_model")
    cli_main(["--entry", "train",
              "--config_paths", "tests/examples/example_train_seq2seq.yml",
              "--model_dir", model_dir,
              "--model.class", "light_convolution_model",
              "--hparams_set", "lightconv_toy",
              "--train_steps", "10", "--summary_steps", "10",
              "--save_checkpoint_steps", "10"])
    assert os.path.exists(os.path.join(model_dir, "ckpt-10.npz"))

    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset.class", "parallel_text",
         "--dataset.params", "{src_file: tests/examples/dev.src, "
                             "trg_file: tests/examples/dev.trg}",
         "--search_method.params",
         "{beam_size: 2, maximum_decode_length: 16}",
         "--metric", "bleu"])
    assert result["samples"] == 24 and "BLEU" in result
