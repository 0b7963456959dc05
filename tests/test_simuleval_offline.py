"""End-to-end wait-k pipeline: CLI train a waitk_transformer on the
fixture corpus, then evaluate with the built-in simultaneous simulator
(simuleval_cli offline mode: AL/CW latency + BLEU; parity:
/root/reference/neurst/cli/simuleval_cli.py + examples/
simultaneous_translation)."""

import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_waitk_train_then_offline_simuleval(tmp_path):
    from neurst_tpu.cli import simuleval_cli
    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)

    cfg = {
        "task.class": "waitk_translation",
        "task.params": {
            "wait_k": [2, 3],
            "batch_size": 64, "batch_by_tokens": True,
            "max_src_len": 16, "max_trg_len": 16,
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
        },
        "dataset.class": "parallel_text",
        "dataset.params": {"src_file": "tests/examples/train.src",
                           "trg_file": "tests/examples/train.trg"},
        "model.class": "waitk_transformer",
        "model.params": {
            "modality.dim": 16,
            "modality.share_embedding_and_softmax_weights": True,
            "modality.share_source_target_embedding": True,
            "modality.timing": "sinusoids",
            "encoder.num_layers": 1, "encoder.hidden_size": 16,
            "encoder.num_attention_heads": 2, "encoder.filter_size": 32,
            "encoder.attention_monotonic": True,
            "decoder.num_layers": 1, "decoder.hidden_size": 16,
            "decoder.num_attention_heads": 2, "decoder.filter_size": 32,
        },
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "label_smoothed_cross_entropy",
            "lr_schedule.class": "constant",
            "lr_schedule.params": {"learning_rate": 1e-3},
            "train_steps": 10, "summary_steps": 10,
            "save_checkpoint_steps": 10},
    }
    cfg_path = tmp_path / "train.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train", "--config_paths", str(cfg_path),
              "--model_dir", model_dir])
    assert os.path.exists(os.path.join(model_dir, "ckpt-10.npz"))

    out = str(tmp_path / "hypo.txt")
    results = simuleval_cli.main([
        "--model_dir", model_dir,
        "--src_file", "tests/examples/dev.src",
        "--ref_file", "tests/examples/dev.trg",
        "--wait_k", "2", "--max_decode_len", "12",
        "--output_file", out])
    assert results["samples"] == 24
    assert "AL" in results and "CW" in results and "BLEU" in results
    # wait-k latency bounds: AL positive-ish and below max source len
    assert -12 < results["AL"] < 16
    assert len(open(out).read().splitlines()) == 24
