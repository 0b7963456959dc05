"""Joint ASR+ST multi-task end-to-end: triple records -> shared-encoder
dual-decoder training (joint criterion over both heads) -> ST beam
decode + BLEU -> ASR-side decode + WER, through the real CLI.

BEYOND-REFERENCE: the reference declares MultiTaskSpeechTranslation but
leaves batching/model NotImplemented
(/root/reference/neurst/tasks/speech2text.py:450-495).
"""

import os

import numpy as np
import pytest
import yaml

JOINT = ("[{class: label_smoothed_cross_entropy, output_key: st, "
         "weight: 1.0}, "
         "{class: label_smoothed_cross_entropy, output_key: asr, "
         "input_prefix: asr, weight: 0.5}]")


def _write_corpus(tmp_path):
    from neurst_tpu.data.audio.log_mel_fbank import LogMelFbank
    from neurst_tpu.data.recordio import RecordWriter, build_example

    rng = np.random.RandomState(0)
    fe = LogMelFbank({"nfilt": 16})
    asr_vocab = tmp_path / "asr_vocab.txt"
    asr_vocab.write_text("".join(f"c{i}\n" for i in range(8)))
    st_vocab = tmp_path / "st_vocab.txt"
    st_vocab.write_text("".join(f"w{i}\n" for i in range(12)))
    rec = str(tmp_path / "train.tfrecords")
    with RecordWriter(rec) as w:
        for _ in range(48):
            wav = rng.randn(rng.randint(4000, 8000))
            feat = fe(wav, 16000)
            asr_ids = rng.randint(0, 8, size=rng.randint(2, 6))
            st_ids = rng.randint(0, 12, size=rng.randint(2, 7))
            w.write(build_example({
                "audio": feat.reshape(-1).astype(np.float32),
                "transcript": asr_ids.astype(np.int64),
                "translation": st_ids.astype(np.int64)}))
    return rec, asr_vocab, st_vocab


@pytest.mark.slow
def test_multitask_train_decode_both_sides(tmp_path):
    from neurst_tpu.cli.run_exp import cli_main

    rec, asr_vocab, st_vocab = _write_corpus(tmp_path)
    cfg = {
        "task.class": "multi_task_speech_translation",
        "task.params": {
            "transcript_data_pipeline.class": "TextDataPipeline",
            "transcript_data_pipeline.params": {
                "vocab_path": str(asr_vocab)},
            "translation_data_pipeline.class": "TextDataPipeline",
            "translation_data_pipeline.params": {
                "vocab_path": str(st_vocab)},
            "audio_feature_dim": 16,
            "batch_size": 1024, "max_src_len": 64, "max_trg_len": 8,
            "min_src_bucket_boundary": 32,
            "experimental_frame_transcript_ratio": 12.0},
        "dataset.class": "audio_triple_tfrecord",
        "dataset.params": {"data_path": rec},
        "model.class": "multi_task_speech_transformer",
        "hparams_set": "speech_transformer_toy",
        "dtype": "float32",
        "entry.params": {
            "criterion.class": "joint_criterion",
            "criterion.params": {"criterions": JOINT},
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

    ckpt = np.load(os.path.join(model_dir, "ckpt-8.npz"))
    st_dec = [k for k in ckpt.files if k.startswith("decoder/")]
    asr_dec = [k for k in ckpt.files if k.startswith("asr_decoder/")]
    assert st_dec and asr_dec, (len(st_dec), len(asr_dec))
    assert any("asr_symbol_modality" in k for k in ckpt.files)

    # ST side (default): decodes the translation, BLEU vs translation
    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset", "audio_triple_tfrecord", "--data_path", rec,
         "--batch_size", "16", "--beam_size", "2",
         "--maximum_decode_length", "8"])
    assert result["samples"] == 48
    assert any("bleu" in k.lower() for k in result)
    st_vocab_words = {f"w{i}" for i in range(12)}
    toks = [t for h in result["hypotheses"] for t in h.split()]
    assert all(t in st_vocab_words for t in toks), toks[:8]

    # ASR side: same model_dir, generation_output=asr -> transcript
    # decoder drives generation, WER vs the transcript
    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset", "audio_triple_tfrecord", "--data_path", rec,
         "--task.params", "{generation_output: asr}",
         "--batch_size", "16", "--beam_size", "2",
         "--maximum_decode_length", "8", "--metric", "wer"])
    assert result["samples"] == 48
    assert "WER" in result
    asr_vocab_chars = {f"c{i}" for i in range(8)}
    toks = [t for h in result["hypotheses"] for t in h.split()]
    assert all(t in asr_vocab_chars for t in toks), toks[:8]


def test_joint_criterion_input_prefix():
    """input_prefix remaps asr_trg* -> trg* for the sub-criterion."""
    import jax.numpy as jnp

    from neurst_tpu.criterions.joint_criterion import JointCriterion

    crit = JointCriterion({"criterions": [
        {"class": "label_smoothed_cross_entropy", "output_key": "st",
         "weight": 1.0},
        {"class": "label_smoothed_cross_entropy", "output_key": "asr",
         "input_prefix": "asr", "weight": 0.5},
    ]})
    rng = np.random.RandomState(1)
    st_logits = jnp.asarray(rng.randn(2, 3, 8), jnp.float32)
    asr_logits = jnp.asarray(rng.randn(2, 4, 6), jnp.float32)
    inp = {
        "trg": jnp.asarray([[1, 2, 3], [2, 1, 0]], jnp.int32),
        "trg_padding": jnp.zeros([2, 3], jnp.float32),
        "asr_trg": jnp.asarray([[1, 2, 3, 4], [2, 1, 0, 0]], jnp.int32),
        "asr_trg_padding": jnp.asarray(
            [[0, 0, 0, 0], [0, 0, 1, 1]], jnp.float32),
    }
    out = {"st": st_logits, "asr": asr_logits}
    joint = float(crit.reduce_loss(inp, out))

    single = JointCriterion({"criterions": [
        {"class": "label_smoothed_cross_entropy", "output_key": "st",
         "weight": 1.0}]})
    st_only = float(single.reduce_loss(inp, out))
    asr_inp = {"trg": inp["asr_trg"], "trg_padding": inp["asr_trg_padding"]}
    asr_only = float(single._subs[0][0].reduce_loss(asr_inp, asr_logits))
    np.testing.assert_allclose(joint, st_only + 0.5 * asr_only, rtol=1e-6)


def test_multitask_dp_sharded_step_matches_single_device():
    """The joint ASR+ST train step (shared encoder, two decoders, two
    CE heads) under a dp2 mesh reproduces the single-device loss and
    params — the multi-head loss path must survive batch sharding."""
    import jax
    import optax

    from neurst_tpu.criterions.joint_criterion import JointCriterion
    from neurst_tpu.models.model import build_model
    from neurst_tpu.parallel import (TrainState, make_mesh,
                                     make_train_step, params_shardings)
    from neurst_tpu.parallel.utils import put_batch

    model = build_model(
        {"model.class": "multi_task_speech_transformer",
         "model.params": {
             "modality.dim": 16,
             "modality.share_embedding_and_softmax_weights": True,
             "encoder.num_layers": 1, "encoder.hidden_size": 16,
             "encoder.num_attention_heads": 2, "encoder.filter_size": 32,
             "decoder.num_layers": 1, "decoder.hidden_size": 16,
             "decoder.num_attention_heads": 2, "decoder.filter_size": 32,
             "dtype": "float32"}},
        src_meta={"audio_feature_dim": 8, "audio_feature_channels": 1},
        trg_meta={"vocab_size": 16, "eos_id": 1, "bos_id": 2, "unk_id": 3},
        asr_meta={"vocab_size": 12, "eos_id": 1, "bos_id": 2, "unk_id": 3})
    criterion = JointCriterion({"criterions": [
        {"class": "label_smoothed_cross_entropy", "output_key": "st",
         "weight": 1.0},
        {"class": "label_smoothed_cross_entropy", "output_key": "asr",
         "input_prefix": "asr", "weight": 0.5}]})
    rng = np.random.RandomState(3)
    b = 8
    host = {
        "src": rng.randn(b, 12, 8, 1).astype(np.float32),
        "src_length": np.full([b], 12, np.int32),
        "trg": rng.randint(4, 16, size=[b, 5]).astype(np.int32),
        "trg_input": rng.randint(4, 16, size=[b, 5]).astype(np.int32),
        "trg_padding": np.zeros([b, 5], np.float32),
        "asr_trg": rng.randint(4, 12, size=[b, 6]).astype(np.int32),
        "asr_trg_input": rng.randint(4, 12, size=[b, 6]).astype(np.int32),
        "asr_trg_padding": np.zeros([b, 6], np.float32),
        "sample_mask": np.ones([b], np.float32),
    }

    def run(mesh):
        tx = optax.sgd(0.1)
        params = model.init_params(jax.random.PRNGKey(0))
        p_shard = params_shardings(mesh, model.params_spec())
        params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, criterion, tx))
        losses = []
        with mesh:
            batch = put_batch(mesh, host)
            for _ in range(3):
                state, metrics = step(state, batch, jax.random.PRNGKey(7))
                losses.append(float(metrics["loss"]))
        return losses, jax.tree_util.tree_map(np.asarray, state.params)

    losses1, params1 = run(make_mesh(devices=jax.devices()[:1]))
    losses2, params2 = run(make_mesh(devices=jax.devices()[:2]))
    np.testing.assert_allclose(losses2, losses1, rtol=0, atol=1e-5)
    import jax as _jax
    diffs = [float(np.max(np.abs(a - b))) for a, b in zip(
        _jax.tree_util.tree_leaves(params1),
        _jax.tree_util.tree_leaves(params2))]
    assert max(diffs) < 1e-5, max(diffs)


def test_kernel_gates_by_d():
    """The measured gate table refines thresholds per model dim; an
    explicit by_d null disables the kernel at that dim even when other
    dims win (the round-5 sweep: fused FFN wins d=256 training, never
    d=512)."""
    import json
    import tempfile

    from neurst_tpu.ops import kernel_gates

    table = {"fused_ffn": {
        "train": {"min_rows": None, "by_d": {"256": 16384, "512": None}},
        "train_drop": {"min_rows": None, "by_d": {"256": 1024}},
    }}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(table, f)
        path = f.name
    old = os.environ.get("NEURST_KERNEL_GATES")
    os.environ["NEURST_KERNEL_GATES"] = path
    kernel_gates.reload_gates()
    try:
        assert kernel_gates.gate_min_rows("fused_ffn", "train",
                                          d=256) == 16384
        assert kernel_gates.gate_min_rows("fused_ffn", "train",
                                          d=512) is None
        # unmeasured d falls back to the aggregate threshold
        assert kernel_gates.gate_min_rows("fused_ffn", "train",
                                          d=1024) is None
        assert kernel_gates.gate_min_rows("fused_ffn", "train_drop",
                                          d=256) == 1024
        # missing mode/kernel -> defaults
        assert kernel_gates.gate_min_rows("fused_ffn", "infer",
                                          d=256) is None
    finally:
        if old is None:
            os.environ.pop("NEURST_KERNEL_GATES", None)
        else:
            os.environ["NEURST_KERNEL_GATES"] = old
        kernel_gates.reload_gates()
        os.unlink(path)
