"""End-to-end CLI smoke: train -> checkpoint -> predict -> BLEU, using
the committed miniature fixtures (parity strategy: the reference's
tests/examples runnable configs)."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_and_predict(tmp_path):
    from neurst_tpu.cli.run_exp import cli_main
    model_dir = str(tmp_path / "model")
    os.chdir(REPO)
    cli_main(["--entry", "train",
              "--config_paths", "tests/examples/example_train_seq2seq.yml",
              "--model_dir", model_dir])
    assert os.path.exists(os.path.join(model_dir, "ckpt-60.npz"))
    assert os.path.exists(os.path.join(model_dir, "model_configs.yml"))

    result = cli_main(
        ["--config_paths", "tests/examples/example_predict_seq2seq.yml",
         "--model_dir", model_dir,
         "--output_file", str(tmp_path / "hypo.txt")])
    assert len(result["hypotheses"]) == 24
    assert os.path.exists(tmp_path / "hypo.txt")
    assert "BLEU" in result
