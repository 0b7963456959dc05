"""Operational-path coverage: trainer resume-from-checkpoint, pruning
inside the Trainer loop, multi-dataset predict, and the cascade_st CLI
(weak spots named in round-1 review; parity anchors cited per test).
"""

import logging
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_YML = "tests/examples/example_train_seq2seq.yml"


def _train(tmp_path, model_dir, extra):
    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    cli_main(["--entry", "train", "--config_paths", TRAIN_YML,
              "--model_dir", model_dir] + extra)


def test_bf16_params_checkpoint_saves_restorable_f32(tmp_path):
    """Round-5 quality-run regression: the keep-best/averaged savers
    received the live bf16 training params and np.savez wrote them as
    raw void '|V2' arrays that exploded at restore.  save_checkpoint
    now canonicalizes bf16 -> f32 (lossless) for EVERY caller, the
    averaging saver means in f64, and restore rescues legacy V2 files
    by viewing the bytes as bf16."""
    import ml_dtypes

    from neurst_tpu.metrics.metric import MetricWrapper
    from neurst_tpu.utils.checkpoints import (AverageCheckpointSaver,
                                              KeepBestCheckpointSaver,
                                              restore_checkpoint_params,
                                              save_checkpoint)

    rng = np.random.RandomState(0)
    f32 = rng.randn(4, 3).astype(np.float32)
    params = {"layer": {"kernel": f32.astype(ml_dtypes.bfloat16)}}

    d1 = str(tmp_path / "direct")
    save_checkpoint(d1, 1, params)
    flat = restore_checkpoint_params(os.path.join(d1, "ckpt-1.npz"))
    assert flat["layer/kernel"].dtype == np.float32
    np.testing.assert_array_equal(
        flat["layer/kernel"], f32.astype(ml_dtypes.bfloat16).astype(
            np.float32))

    metric = MetricWrapper("loss", greater_is_better=False)
    best = KeepBestCheckpointSaver(str(tmp_path / "m"), metric)
    avg = AverageCheckpointSaver(str(tmp_path / "m"), metric)
    assert best.save(1, params, 1.0)
    assert avg.save(1, params, 1.0)
    for sub in ("best", "best_avg"):
        flat = restore_checkpoint_params(
            os.path.join(str(tmp_path / "m"), sub, "ckpt-1.npz"))
        assert all(v.dtype == np.float32 for v in flat.values()), sub

    # legacy rescue: a V2-void npz (how numpy serialized bf16) reads
    # back as the exact f32 widening
    legacy = str(tmp_path / "legacy.npz")
    np.savez(legacy, **{"layer/kernel": f32.astype(ml_dtypes.bfloat16)})
    raw = np.load(legacy)["layer/kernel"]
    assert raw.dtype.kind == "V"
    flat = restore_checkpoint_params(legacy)
    np.testing.assert_array_equal(
        flat["layer/kernel"], f32.astype(ml_dtypes.bfloat16).astype(
            np.float32))


@pytest.mark.slow
def test_trainer_resumes_from_checkpoint(tmp_path, caplog):
    """Stopping at step 30 and re-running to 60 must resume from the
    checkpoint (parity: reference trainer.py:147-178 restore +
    compat.hack_global_step), not retrain from scratch."""
    model_dir = str(tmp_path / "model")
    _train(tmp_path, model_dir,
           ["--train_steps", "30", "--save_checkpoint_steps", "30",
            "--summary_steps", "10"])
    assert os.path.exists(os.path.join(model_dir, "ckpt-30.npz"))

    with caplog.at_level(logging.INFO):
        _train(tmp_path, model_dir,
               ["--train_steps", "60", "--save_checkpoint_steps", "30",
                "--summary_steps", "10"])
    assert os.path.exists(os.path.join(model_dir, "ckpt-60.npz"))
    msgs = [r.getMessage() for r in caplog.records]
    assert any("Start training from step 30 to 60" in m for m in msgs), \
        [m for m in msgs if "Start training" in m]


@pytest.mark.slow
def test_pruning_inside_trainer_reaches_target_sparsity(tmp_path):
    """The pruning optimizer must run inside the real Trainer loop and
    leave the included variables at the target sparsity in the saved
    checkpoint (parity: reference sparsity/pruning_optimizer.py:22-128
    + trainer.py:244-248)."""
    model_dir = str(tmp_path / "model")
    _train(tmp_path, model_dir,
           ["--train_steps", "40", "--save_checkpoint_steps", "40",
            "--summary_steps", "20",
            "--pruning_schedule.class", "constant_sparsity",
            "--pruning_schedule.params",
            "{target_sparsity: 0.5, begin_pruning_step: 10, "
            "pruning_frequency: 5}",
            "--pruning_variable_pattern", r"ffn/dense\d/kernel"])
    ckpt = np.load(os.path.join(model_dir, "ckpt-40.npz"))
    pruned = [k for k in ckpt.files if "ffn/dense" in k
              and k.endswith("kernel")]
    assert pruned
    for k in pruned:
        w = ckpt[k]
        sparsity = float((w == 0).mean())
        assert abs(sparsity - 0.5) < 0.05, (k, sparsity)
    # excluded variables stay dense
    for k in ckpt.files:
        if "attention" in k and k.endswith("kernel"):
            assert float((ckpt[k] == 0).mean()) < 0.1, k


@pytest.mark.slow
def test_multi_dataset_predict(tmp_path):
    """Predict over a MultipleDataset: per-dataset outputs/metrics plus
    the weighted mixture (parity: reference sequence_generator.py
    multi-dataset handling + MultipleDataset sample_weights)."""
    from neurst_tpu.cli.run_exp import cli_main
    model_dir = str(tmp_path / "model")
    _train(tmp_path, model_dir,
           ["--train_steps", "20", "--save_checkpoint_steps", "20",
            "--summary_steps", "10"])

    out = str(tmp_path / "hypo.txt")
    metric_file = str(tmp_path / "metric.json")
    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset.class", "multiple_dataset",
         "--dataset.params", yaml.safe_dump({
             "multiple_datasets": {
                 "devA": {"dataset.class": "parallel_text",
                          "dataset.params": {
                              "src_file": "tests/examples/dev.src",
                              "trg_file": "tests/examples/dev.trg"}},
                 "devB": {"dataset.class": "parallel_text",
                          "dataset.params": {
                              "src_file": "tests/examples/dev.src",
                              "trg_file": "tests/examples/dev.trg"}},
             },
             "sample_weights": {"devA": 3.0, "devB": 1.0}}),
         "--search_method.class", "beam_search",
         "--search_method.params",
         "{beam_size: 2, maximum_decode_length: 20}",
         "--metric", "bleu",
         "--output_file", out, "--save_metric", metric_file])
    assert set(result["datasets"]) == {"devA", "devB"}
    for name in ("devA", "devB"):
        assert os.path.exists(f"{out}.{name}")
        assert len(result["datasets"][name]["hypotheses"]) == 24
    # identical datasets -> the weighted mixture equals each BLEU
    bleu_a = result["datasets"]["devA"]["BLEU"]
    assert abs(result["weighted"]["BLEU"] - bleu_a) < 1e-9
    assert os.path.exists(metric_file)


@pytest.mark.slow
def test_cascade_st_cli(tmp_path):
    """ASR model -> MT model cascade through the real CLI (parity:
    /root/reference/neurst/cli/cascade_st.py:29-50)."""
    from neurst_tpu.cli import cascade_st
    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.data.audio.log_mel_fbank import LogMelFbank
    from neurst_tpu.data.recordio import RecordWriter, build_example
    os.chdir(REPO)

    # ---- tiny ASR model over 16-dim fbank with the shared vocab ----
    rng = np.random.RandomState(0)
    fe = LogMelFbank({"nfilt": 16})
    rec = str(tmp_path / "test.tfrecords")
    with RecordWriter(rec) as w:
        for _ in range(8):
            wav = rng.randn(rng.randint(4000, 8000))
            feat = fe(wav, 16000)
            ids = rng.randint(4, 40, size=rng.randint(2, 6))
            w.write(build_example({
                "audio": feat.reshape(-1).astype(np.float32),
                "transcript": ids.astype(np.int64)}))

    asr_cfg = {
        "task.class": "speech2text",
        "task.params": {
            "transcript_data_pipeline.class": "TextDataPipeline",
            "transcript_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "audio_feature_dim": 16,
            "batch_size": 1024, "max_src_len": 64, "max_trg_len": 8,
            "min_src_bucket_boundary": 32,
            "experimental_frame_transcript_ratio": 12.0},
        "dataset.class": "audio_tfrecord",
        "dataset.params": {"data_path": rec},
        "hparams_set": "speech_transformer_toy",
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "label_smoothed_cross_entropy",
            "lr_schedule.class": "constant",
            "lr_schedule.params": {"learning_rate": 1e-3},
            "train_steps": 4, "summary_steps": 4,
            "save_checkpoint_steps": 4},
    }
    asr_yml = tmp_path / "asr.yml"
    asr_yml.write_text(yaml.safe_dump(asr_cfg))
    asr_dir = str(tmp_path / "asr_model")
    cli_main(["--entry", "train", "--config_paths", str(asr_yml),
              "--model_dir", asr_dir])

    # ---- tiny MT model on the text fixtures (same vocab) ----
    mt_dir = str(tmp_path / "mt_model")
    _train(tmp_path, mt_dir,
           ["--train_steps", "10", "--save_checkpoint_steps", "10",
            "--summary_steps", "10"])

    refs = tmp_path / "refs.txt"
    refs.write_text("\n".join(["tok1 tok2"] * 8) + "\n")
    out = str(tmp_path / "cascade_out.txt")
    cascade_st.main([
        "--asr_model_dir", asr_dir, "--mt_model_dir", mt_dir,
        "--dataset", "audio_tfrecord", "--data_path", rec,
        "--batch_size", "1024", "--asr_beam_size", "2",
        "--mt_beam_size", "2", "--maximum_decode_length", "12",
        "--output_file", out, "--ref_file", str(refs)])
    lines = open(out).read().splitlines()
    assert len(lines) == 8


@pytest.mark.slow
def test_prune_tune_partial_trainer_via_include(tmp_path):
    """The --include plug-in path end-to-end (parity: reference
    flags_core.py:207-247 + examples/prune_tune): a pruned
    general-domain checkpoint's DENSE weights stay frozen while only
    the pruned (zero) slots train on the new data."""
    from neurst_tpu.cli.run_exp import cli_main
    general_dir = str(tmp_path / "general")
    _train(tmp_path, general_dir,
           ["--train_steps", "30", "--save_checkpoint_steps", "30",
            "--summary_steps", "30",
            "--pruning_schedule.class", "constant_sparsity",
            "--pruning_schedule.params",
            "{target_sparsity: 0.5, begin_pruning_step: 5, "
            "pruning_frequency: 5}",
            "--pruning_variable_pattern", r"ffn/dense\d/kernel"])
    general = np.load(os.path.join(general_dir, "ckpt-30.npz"))

    tuned_dir = str(tmp_path / "tuned")
    cli_main(["--entry", "partial_tune",
              "--include", "examples/prune_tune/src/partial_trainer.py",
              "--config_paths", TRAIN_YML,
              "--model_dir", tuned_dir,
              "--pretrain_model", general_dir,
              "--mask_dir", general_dir,
              "--train_steps", "15", "--save_checkpoint_steps", "15",
              "--summary_steps", "15"])
    tuned = np.load(os.path.join(tuned_dir, "ckpt-15.npz"))

    checked_frozen = checked_tuned = 0
    for k in general.files:
        if not (("ffn/dense" in k) and k.endswith("kernel")):
            continue
        g, t = general[k], tuned[k]
        dense = g != 0
        # dense subnetwork untouched
        np.testing.assert_array_equal(t[dense], g[dense], err_msg=k)
        checked_frozen += int(dense.sum())
        # pruned slots received updates
        changed = float((t[~dense] != 0).mean())
        assert changed > 0.5, (k, changed)
        checked_tuned += int((~dense).sum())
    assert checked_frozen > 0 and checked_tuned > 0

    # mask-aware generation (parity: reference
    # examples/prune_tune/src/mask_sequence_generator.py): decoding the
    # TUNED checkpoint with the general model's sparsity mask applied
    # must reproduce the pruned GENERAL model exactly (dense slots are
    # frozen; masking zeroes the tuned slots).
    def predict(md, extra):
        return cli_main(
            ["--entry"] + extra + ["--model_dir", md,
             "--dataset.class", "parallel_text",
             "--dataset.params", "{src_file: tests/examples/dev.src, "
                                 "trg_file: tests/examples/dev.trg}",
             "--search_method.params",
             "{beam_size: 2, maximum_decode_length: 12}"])

    general_hypos = predict(general_dir, ["predict"])["hypotheses"]
    masked_hypos = predict(
        tuned_dir,
        ["mask_predict", "--include",
         "examples/prune_tune/src/mask_sequence_generator.py",
         "--mask_from_ckpt", general_dir])["hypotheses"]
    assert masked_hypos == general_hypos


@pytest.mark.slow
def test_ensemble_predict_cli(tmp_path):
    """Comma-separated model_dirs -> prob-space ensemble decode
    (parity: reference sequence_generator.py:86-109). An ensemble of
    the SAME checkpoint twice must reproduce the single-model decode."""
    from neurst_tpu.cli.run_exp import cli_main
    model_dir = str(tmp_path / "model")
    _train(tmp_path, model_dir,
           ["--train_steps", "20", "--save_checkpoint_steps", "20",
            "--summary_steps", "10"])

    def predict(md):
        return cli_main(
            ["--entry", "predict", "--model_dir", md,
             "--dataset.class", "parallel_text",
             "--dataset.params", "{src_file: tests/examples/dev.src, "
                                 "trg_file: tests/examples/dev.trg}",
             "--search_method.params",
             "{beam_size: 2, maximum_decode_length: 16}",
             "--metric", "bleu"])

    single = predict(model_dir)
    ensemble = predict(f"{model_dir},{model_dir}")
    assert ensemble["samples"] == 24
    assert ensemble["hypotheses"] == single["hypotheses"]


@pytest.mark.slow
def test_training_survives_corrupt_record_tail(tmp_path, caplog):
    """A truncated/corrupt record mid-corpus must not kill training:
    the resilient iterator retries, fast-forwards past consumed batches
    (no replay), and completes the requested steps (parity: reference
    gradaccum_keras_model.py:285-300 data-error retry)."""
    import logging

    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.data.recordio import RecordWriter, build_example
    os.chdir(REPO)
    rng = np.random.RandomState(0)
    rec = str(tmp_path / "train.tfrecords")
    with RecordWriter(rec) as w:
        for _ in range(64):
            n = rng.randint(3, 10)
            w.write(build_example({
                "feature": rng.randint(4, 38, size=n).astype(np.int64),
                "label": rng.randint(4, 38, size=n).astype(np.int64)}))
    # corrupt tail: a truncated record header
    with open(rec, "ab") as f:
        f.write(b"\xde\xad\xbe\xef")

    model_dir = str(tmp_path / "model")
    with caplog.at_level(logging.INFO):
        cli_main(["--entry", "train",
                  "--config_paths", TRAIN_YML,
                  "--model_dir", model_dir,
                  "--dataset.class", "parallel_tfrecord",
                  "--dataset.params",
                  f"{{data_path: {rec}, shuffle_files: false}}",
                  "--train_steps", "12", "--save_checkpoint_steps", "12",
                  "--summary_steps", "6"])
    assert os.path.exists(os.path.join(model_dir, "ckpt-12.npz"))
    msgs = [r.getMessage() for r in caplog.records]
    assert any("corrupt record in" in m for m in msgs), \
        "the corrupt tail was never encountered"
    assert any("Training finished at step 12" in m for m in msgs)


def test_record_corruption_modes_contained(tmp_path):
    """Every corruption mode must be contained (review findings): a
    payload bit-flip (caught by crc), an implausible length field, and
    a truncated tail each skip the rest of that FILE while other files
    keep flowing — and never raise OverflowError/MemoryError."""
    import struct

    from neurst_tpu.data.datasets.dataset import build_dataset
    from neurst_tpu.data.recordio import RecordWriter, build_example
    rng = np.random.RandomState(0)

    def write_file(path, n):
        with RecordWriter(path) as w:
            for _ in range(n):
                m = rng.randint(3, 8)
                w.write(build_example({
                    "feature": rng.randint(4, 30, size=m).astype(np.int64),
                    "label": rng.randint(4, 30, size=m).astype(np.int64)}))

    d = tmp_path / "records"
    d.mkdir()
    good, bitflip, hugelen = (str(d / f"train-{i}") for i in range(3))
    write_file(good, 5)
    write_file(bitflip, 5)
    write_file(hugelen, 5)

    # bit-flip a payload byte mid-file (framing intact, crc wrong)
    data = bytearray(open(bitflip, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(bitflip, "wb").write(bytes(data))

    # corrupt a length field to a huge value
    data = bytearray(open(hugelen, "rb").read())
    (first_len,) = struct.unpack("<Q", bytes(data[:8]))
    second = 8 + 4 + first_len + 4
    data[second:second + 8] = struct.pack("<Q", 1 << 50)
    open(hugelen, "wb").write(bytes(data))

    ds = build_dataset({"dataset.class": "parallel_tfrecord",
                        "dataset.params": {"data_path": str(d),
                                           "shuffle_files": False}})
    examples = list(ds.build_iterator()())
    # good file fully read; corrupt files contribute their valid prefix
    assert 5 < len(examples) < 15
    for ex in examples:
        assert 3 <= len(ex["feature"]) <= 8


@pytest.mark.slow
def test_bf16_params_resume_restores_master(tmp_path, caplog):
    """--bf16_params through the CLI: checkpoints store the f32 master,
    and a resumed run restores the optimizer-state sidecar (master
    included) and continues from the saved step.  (Bitwise run equality
    is not asserted here — the data iterator's order differs between an
    interrupted and an uninterrupted run; the deterministic master
    save/restore equivalence is covered at the train-step level in
    tests/parallel/test_multidevice.py.)"""
    model_dir = str(tmp_path / "model")
    _train(tmp_path, model_dir,
           ["--train_steps", "4", "--save_checkpoint_steps", "4",
            "--summary_steps", "4", "--bf16_params"])
    ckpt4 = np.load(os.path.join(model_dir, "ckpt-4.npz"))
    assert all(str(ckpt4[k].dtype) == "float32" for k in ckpt4.files)
    assert os.path.exists(os.path.join(model_dir, "ckpt-4.optstate"))

    with caplog.at_level(logging.INFO):
        _train(tmp_path, model_dir,
               ["--train_steps", "8", "--save_checkpoint_steps", "4",
                "--summary_steps", "4", "--bf16_params"])
    msgs = [r.getMessage() for r in caplog.records]
    assert any("Start training from step 4 to 8" in m for m in msgs)
    assert any("Restored optimizer state" in m for m in msgs), \
        [m for m in msgs if "optimizer" in m.lower()]
    ckpt8 = np.load(os.path.join(model_dir, "ckpt-8.npz"))
    assert all(str(ckpt8[k].dtype) == "float32" for k in ckpt8.files)


@pytest.mark.slow
def test_int8_static_activation_predict_cli(tmp_path, caplog):
    """--int8_serving --int8_activations --int8_static_activations:
    the predict entry self-calibrates the static activation scales on
    its own first-pass hypotheses (PTQ calibration, no references
    needed), then decodes the corpus with per-tensor int8 activation
    scales (no per-token absmax reduction in the served graph)."""
    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.layers.quantization.quant_layers import (
        int8_serving_enabled, set_int8_serving)
    model_dir = str(tmp_path / "model")
    _train(tmp_path, model_dir,
           ["--train_steps", "20", "--save_checkpoint_steps", "20",
            "--summary_steps", "10"])

    out = str(tmp_path / "hypo_int8_static.txt")
    try:
        with caplog.at_level(logging.INFO):
            cli_main(
                ["--entry", "predict", "--model_dir", model_dir,
                 "--dataset.class", "parallel_text",
                 "--dataset.params",
                 "{src_file: tests/examples/dev.src, "
                 "trg_file: tests/examples/dev.trg}",
                 "--search_method.class", "beam_search",
                 "--search_method.params",
                 "{beam_size: 2, maximum_decode_length: 20}",
                 "--int8_serving", "--int8_activations",
                 "--int8_static_activations",
                 "--int8_calibration_batches", "1",
                 "--metric", "bleu", "--output_file", out])
    finally:
        set_int8_serving(False)
    assert not int8_serving_enabled()
    msgs = [r.getMessage() for r in caplog.records]
    assert any("Calibrated static int8 activation scales" in m
               for m in msgs), [m for m in msgs if "int8" in m.lower()]
    assert os.path.exists(out)
    lines = open(out, encoding="utf-8").read().splitlines()
    assert len(lines) == 24
