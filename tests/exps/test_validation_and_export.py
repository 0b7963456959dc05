"""Tests for the two operationally riskiest entries: the ``validation``
sidecar (filesystem polling + retries, parity:
/root/reference/neurst/exps/validation.py:29-143) and the serving
``export`` entry (parity:
/root/reference/neurst/exps/sequence_generator_savedmodel.py:27-79 —
SavedModel replaced by StableHLO + jax.export artifacts).
"""

import os
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

MODEL_PARAMS = {
    "modality.share_source_target_embedding": True,
    "modality.share_embedding_and_softmax_weights": True,
    "modality.dim": 16,
    "modality.timing": "sinusoids",
    "encoder.num_layers": 1,
    "encoder.hidden_size": 16,
    "encoder.num_attention_heads": 2,
    "encoder.filter_size": 32,
    "decoder.num_layers": 1,
    "decoder.hidden_size": 16,
    "decoder.num_attention_heads": 2,
    "decoder.filter_size": 32,
    "dtype": "float32",
}


def _build_task_and_model():
    from neurst_tpu.tasks.task import build_task
    os.chdir(REPO)
    task = build_task({
        "task.class": "translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
        }})
    model = task.build_model({"model.class": "transformer",
                              "model.params": MODEL_PARAMS})
    return task, model


def test_validation_sidecar_polls_records_and_early_stops(tmp_path):
    """End-to-end sidecar behavior: checkpoints appear over time in
    model_dir (some after the sidecar already started polling), the
    sidecar restores each in step order, records the best metric, and
    requests early stop once evals stop improving."""
    import jax

    from neurst_tpu.exps.base_experiment import build_exp
    from neurst_tpu.utils import checkpoints as ckpt_lib

    task, model = _build_task_and_model()
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)

    base = model.init_params(jax.random.PRNGKey(0))
    # progressively blown-up params make the dev loss strictly worse
    variants = [
        jax.tree_util.tree_map(lambda x: x * s, base)
        for s in (1.0, 7.0, 15.0)
    ]
    ckpt_lib.save_checkpoint(model_dir, 10, variants[0])
    ckpt_lib.save_checkpoint(model_dir, 20, variants[1])

    # the third checkpoint lands while the sidecar is polling
    def _late_writer():
        time.sleep(2.0)
        ckpt_lib.save_checkpoint(model_dir, 30, variants[2])

    writer = threading.Thread(target=_late_writer, daemon=True)

    entry = build_exp(
        {"entry.class": "validation",
         "entry.params": {
             "validator.class": "criterion_validator",
             "validator.params": {
                 "eval_dataset.class": "parallel_text",
                 "eval_dataset.params": {
                     "src_file": "tests/examples/dev.src",
                     "trg_file": "tests/examples/dev.trg"},
                 "eval_batch_size": 8,
                 "eval_estop_patience": 2,
             },
             "waiting_interval": 1,
             "maximum_waiting_time": 8,
         }},
        task=task, model=model, model_dir=model_dir)

    seen_steps = []
    losses = []
    from neurst_tpu.training.validator import TrainingStatusRecorder
    real_record = TrainingStatusRecorder.record

    def spy_record(self, step, value, params=None):
        seen_steps.append(step)
        losses.append(value)
        return real_record(self, step, value, params)

    TrainingStatusRecorder.record = spy_record
    try:
        writer.start()
        t0 = time.time()
        entry.run()
        elapsed = time.time() - t0
    finally:
        TrainingStatusRecorder.record = real_record
        writer.join()

    # processed in step order, including the late-arriving checkpoint
    assert seen_steps == [10, 20, 30]
    # the blow-up really made the loss worse each time
    assert losses[0] < losses[1] < losses[2]
    # early stop fired (2 bad evals with patience 2) rather than
    # waiting out maximum_waiting_time after the last checkpoint
    assert elapsed < 8 + 6


def test_validation_sidecar_gives_up_when_no_checkpoint(tmp_path):
    from neurst_tpu.exps.base_experiment import build_exp
    task, model = _build_task_and_model()
    model_dir = str(tmp_path / "empty")
    os.makedirs(model_dir)
    entry = build_exp(
        {"entry.class": "validation",
         "entry.params": {
             "validator.class": "criterion_validator",
             "validator.params": {
                 "eval_dataset.class": "parallel_text",
                 "eval_dataset.params": {
                     "src_file": "tests/examples/dev.src",
                     "trg_file": "tests/examples/dev.trg"},
             },
             "waiting_interval": 1,
             "maximum_waiting_time": 2,
         }},
        task=task, model=model, model_dir=model_dir)
    t0 = time.time()
    entry.run()  # must return (not hang) with no checkpoint ever
    assert time.time() - t0 < 30


def test_validation_sidecar_reads_orbax_checkpoints(tmp_path):
    """The sidecar must also consume sharded (orbax) trainer
    checkpoints (--checkpoint_format orbax)."""
    import jax

    from neurst_tpu.exps.base_experiment import build_exp
    from neurst_tpu.utils.orbax_checkpoints import save_checkpoint_orbax

    task, model = _build_task_and_model()
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    save_checkpoint_orbax(model_dir, 10,
                          model.init_params(jax.random.PRNGKey(0)))
    entry = build_exp(
        {"entry.class": "validation",
         "entry.params": {
             "validator.class": "criterion_validator",
             "validator.params": {
                 "eval_dataset.class": "parallel_text",
                 "eval_dataset.params": {
                     "src_file": "tests/examples/dev.src",
                     "trg_file": "tests/examples/dev.trg"},
             },
             "waiting_interval": 1,
             "maximum_waiting_time": 2,
         }},
        task=task, model=model, model_dir=model_dir)

    seen = []
    from neurst_tpu.training.validator import TrainingStatusRecorder
    real = TrainingStatusRecorder.record

    def spy(self, step, value, params=None):
        seen.append((step, value))
        return real(self, step, value, params)

    TrainingStatusRecorder.record = spy
    try:
        entry.run()
    finally:
        TrainingStatusRecorder.record = real
    assert [s for s, _ in seen] == [10]
    assert np.isfinite(seen[0][1])


def test_export_entry_artifacts_reproduce_generation(tmp_path):
    """The export dir must be self-contained (StableHLO text + serialized
    jax.export artifact + checkpoint + model_configs.yml) and the
    reloaded artifact must reproduce the live generation outputs."""
    import jax

    from neurst_tpu.exps.base_experiment import build_exp
    from neurst_tpu.layers.search.sequence_search import build_search_layer
    from neurst_tpu.utils import checkpoints as ckpt_lib

    task, model = _build_task_and_model()
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    params = model.init_params(jax.random.PRNGKey(1))
    ckpt_lib.save_checkpoint(model_dir, 100, params)
    with open(os.path.join(model_dir, "model_configs.yml"), "w") as f:
        f.write("model.class: transformer\n")

    export_path = str(tmp_path / "export")
    search_args = {
        "search_method.class": "beam_search",
        "search_method.params": {
            "beam_size": 2, "maximum_decode_length": 8,
            "extra_decode_length": 4},
    }
    entry = build_exp(
        {"entry.class": "export",
         "entry.params": dict(search_args, export_path=export_path,
                              export_batch_size=2, export_src_length=6)},
        task=task, model=model, model_dir=model_dir)
    out = entry.run()
    assert out == export_path

    mlir_path = os.path.join(export_path, "generation.stablehlo.mlir")
    assert os.path.exists(mlir_path)
    text = open(mlir_path).read()
    assert "stablehlo" in text and "module" in text
    assert os.path.exists(os.path.join(export_path, "ckpt-0.npz"))
    assert os.path.exists(os.path.join(export_path, "model_configs.yml"))

    bin_path = os.path.join(export_path, "generation.jaxexport.bin")
    assert os.path.exists(bin_path), "jax.export artifact missing"
    from jax import export as jax_export
    with open(bin_path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    eos = task._trg_data_pipeline.meta["eos_id"]
    bos = task._trg_data_pipeline.meta["bos_id"]
    example = {
        "src": np.array([[5, 6, 7, eos, 0, 0],
                         [8, 9, eos, 0, 0, 0]], np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1],
                                 [0, 0, 0, 1, 1, 1]], np.float32),
        "trg_input": np.full([2], bos, np.int32),
    }
    search = build_search_layer(search_args)
    search.set_model(model)
    live = search(params, example)
    reloaded = exported.call(params, example)
    for a, b in zip(jax.tree_util.tree_leaves(live),
                    jax.tree_util.tree_leaves(reloaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_export_raw_audio_serving_matches_two_step(tmp_path):
    """--export_raw_audio: the exported speech module consumes RAW
    waveforms (on-device fbank+CMVN before the encoder) and must equal
    host-fbank -> features -> search."""
    import jax

    from neurst_tpu.data.audio.log_mel_fbank import LogMelFbank
    from neurst_tpu.exps.base_experiment import build_exp
    from neurst_tpu.layers.search.sequence_search import build_search_layer
    from neurst_tpu.tasks.task import build_task
    from neurst_tpu.utils import checkpoints as ckpt_lib

    os.chdir(REPO)
    vocab = tmp_path / "v.txt"
    vocab.write_text("".join(f"c{i}\n" for i in range(8)))
    task = build_task({
        "task.class": "speech2text",
        "task.params": {
            "transcript_data_pipeline.class": "TextDataPipeline",
            "transcript_data_pipeline.params": {"vocab_path": str(vocab)},
            "audio_feature_dim": 16}})
    from neurst_tpu.models.speech_transformer import SpeechTransformer
    toy = SpeechTransformer.build_model_args_by_name(
        "speech_transformer_toy")
    cfg = dict(toy["model.params"])
    cfg["dtype"] = "float32"
    model = task.build_model({"model.class": "speech_transformer",
                              "model.params": cfg})
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    params = model.init_params(jax.random.PRNGKey(2))
    ckpt_lib.save_checkpoint(model_dir, 1, params)

    export_path = str(tmp_path / "export")
    search_args = {
        "search_method.class": "beam_search",
        "search_method.params": {"beam_size": 2,
                                 "maximum_decode_length": 6,
                                 "extra_decode_length": 2}}
    entry = build_exp(
        {"entry.class": "export",
         "entry.params": dict(search_args, export_path=export_path,
                              export_batch_size=2,
                              export_src_length=4000,
                              export_raw_audio=True)},
        task=task, model=model, model_dir=model_dir)
    entry.run()

    from jax import export as jax_export
    with open(os.path.join(export_path, "generation.jaxexport.bin"),
              "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    rng = np.random.RandomState(5)
    wav = (rng.randn(2, 4000) * 1000).astype(np.float32)
    served = exported.call(params, {
        "audio": wav, "audio_length": np.full([2], 4000, np.int32),
        "trg_input": np.zeros([2], np.int32)})

    # two-step host pipeline on the same waveforms
    fe = LogMelFbank({"nfilt": 16})
    feats = np.stack([fe(w, 16000) for w in wav])  # same length -> same F
    search = build_search_layer(search_args)
    search.set_model(model)
    direct = search(params, {
        "src": feats[..., None].astype(np.float32),
        "src_length": np.full([2], feats.shape[1], np.int32),
        "trg_input": np.zeros([2], np.int32)})
    ids_served = np.asarray(jax.tree_util.tree_leaves(served)[0])
    ids_direct = np.asarray(jax.tree_util.tree_leaves(direct)[0])
    np.testing.assert_array_equal(ids_served, ids_direct)
