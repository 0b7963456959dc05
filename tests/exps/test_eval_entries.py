"""The ``eval`` (criterion over a dev set, incl. weighted multi-dataset
mixing, parity: reference evaluator.py:31-101) and
``sequence_evaluator`` (per-sample scores, parity:
sequence_evaluator.py) entries, end-to-end through the CLI."""

import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_eval_entry_single_and_weighted_multi(tmp_path):
    import yaml

    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train",
              "--config_paths", "tests/examples/example_train_seq2seq.yml",
              "--model_dir", model_dir,
              "--train_steps", "20", "--save_checkpoint_steps", "20",
              "--summary_steps", "10"])

    single = cli_main(
        ["--entry", "eval", "--model_dir", model_dir,
         "--dataset.class", "parallel_text",
         "--dataset.params", "{src_file: tests/examples/dev.src, "
                             "trg_file: tests/examples/dev.trg}",
         "--batch_size", "64"])
    assert {"NLL", "PPL"} <= set(single)
    assert math.isfinite(single["PPL"]) and single["PPL"] > 1.0

    multi = cli_main(
        ["--entry", "eval", "--model_dir", model_dir,
         "--dataset.class", "multiple_dataset",
         "--dataset.params", yaml.safe_dump({
             "multiple_datasets": {
                 "a": {"dataset.class": "parallel_text",
                       "dataset.params": {
                           "src_file": "tests/examples/dev.src",
                           "trg_file": "tests/examples/dev.trg"}},
                 "b": {"dataset.class": "parallel_text",
                       "dataset.params": {
                           "src_file": "tests/examples/dev.src",
                           "trg_file": "tests/examples/dev.trg"}},
             },
             "sample_weights": {"a": 1.0, "b": 3.0}}),
         "--batch_size", "64"])
    assert set(multi["datasets"]) == {"a", "b"}
    # identical datasets: the weighted mixture equals each one's NLL
    assert abs(multi["weighted"]["NLL"]
               - multi["datasets"]["a"]["NLL"]) < 1e-9
    assert abs(multi["datasets"]["a"]["NLL"] - single["NLL"]) < 1e-6

    scores_file = str(tmp_path / "scores.txt")
    seq_eval = cli_main(
        ["--entry", "sequence_evaluator", "--model_dir", model_dir,
         "--dataset.class", "parallel_text",
         "--dataset.params", "{src_file: tests/examples/dev.src, "
                             "trg_file: tests/examples/dev.trg}",
         "--batch_size", "64", "--output_file", scores_file])
    assert len(seq_eval) == 24
    assert all(math.isfinite(s["nll"]) for s in seq_eval)
    assert os.path.exists(scores_file)
    assert len(open(scores_file).read().splitlines()) == 24
