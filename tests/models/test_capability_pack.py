"""Tests for GPT-2, wait-k, ensemble, pruning, KD criterion and
checkpoint utilities."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurst_tpu.models.model import build_model  # noqa: E402

META = {"vocab_size": 23, "eos_id": 22, "bos_id": 22, "unk_id": 21,
        "pad_id": 22}


def test_gpt2_forward_and_prompt_generation():
    model = build_model({"model.class": "gpt2", "model.params": {
        "num_layers": 2, "hidden_size": 16, "num_attention_heads": 2,
        "filter_size": 32, "max_positions": 64, "dtype": "float32"}},
        trg_meta=META)
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = {"trg_input": np.array([[22, 3, 4, 5], [22, 6, 7, 8]],
                                    np.int32)}
    logits = model.call(params, inputs)
    assert logits.shape == (2, 4, 23)

    # prompt prefill consistency: stepwise logits at the last prompt
    # position equal teacher-forced logits there
    s2l, init = model.prepare_generation(params, inputs,
                                         decode_padded_length=8)
    lg, _ = s2l(init["decoder_input"], init["decoder_internal_cache"], 0)
    diff = float(jnp.max(jnp.abs(lg - logits[:, -1])))
    assert diff < 2e-5, diff


def test_waitk_decoder_masks_future_source():
    from neurst_tpu.models.transformer import Transformer
    args = Transformer.build_model_args_by_name("transformer_toy")
    cfg = dict(args["model.params"])
    cfg.update({"dtype": "float32", "wait_k": 2,
                "encoder.attention_monotonic": True})
    model = build_model({"model.class": "waitk_transformer",
                         "model.params": cfg},
                        src_meta=META, trg_meta=META)
    params = model.init_params(jax.random.PRNGKey(0))
    src = np.array([[3, 4, 5, 6, 7, 22]], np.int32)
    inputs = {"src": src, "src_padding": np.zeros([1, 6], np.float32),
              "trg_input": np.array([[22, 2, 3]], np.int32)}
    logits = model.call(params, inputs)
    # target position 0 sees only source < 0 + k = 2; mutate source pos 3+
    src2 = src.copy()
    src2[0, 3:5] = 9
    logits2 = model.call(params, {**inputs, "src": src2})
    assert float(jnp.max(jnp.abs(logits[:, 0] - logits2[:, 0]))) < 2e-5
    # position 2 (sees < 4) must change
    assert float(jnp.max(jnp.abs(logits[:, 2] - logits2[:, 2]))) > 1e-4


def test_ensemble_of_identical_models_matches_single():
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.models.ensemble_model import EncoderDecoderEnsembleModel
    from neurst_tpu.models.transformer import Transformer
    args = Transformer.build_model_args_by_name("transformer_toy")
    cfg = dict(args["model.params"])
    cfg["dtype"] = "float32"
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=META, trg_meta=META)
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = {"src": np.array([[3, 4, 5, 22]], np.int32),
              "src_padding": np.zeros([1, 4], np.float32),
              "trg_input": np.array([22], np.int32)[None]}
    s2l, init = model.prepare_generation(params, inputs, 8)
    hyp_single, _ = sequence_beam_search(s2l, init, beam_size=2,
                                         maximum_decode_length=8)
    ens = EncoderDecoderEnsembleModel([model, model], [params, params])
    s2l2, init2 = ens.prepare_generation(None, inputs, 8)
    hyp_ens, _ = sequence_beam_search(s2l2, init2, beam_size=2,
                                      maximum_decode_length=8)
    np.testing.assert_array_equal(np.asarray(hyp_single),
                                  np.asarray(hyp_ens))


def test_pruning_optimizer_reaches_target_sparsity():
    from neurst_tpu.sparsity.pruning_optimizer import prune_gradients
    from neurst_tpu.sparsity.pruning_schedule import ConstantSparsity
    schedule = ConstantSparsity({"target_sparsity": 0.5,
                                 "begin_pruning_step": 0,
                                 "pruning_frequency": 1})
    tx = prune_gradients(optax.sgd(0.1), schedule)
    params = {"w": jnp.asarray(np.random.RandomState(0)
                               .randn(16, 16), jnp.float32)}
    state = tx.init(params)
    for _ in range(3):
        grads = {"w": jnp.ones_like(params["w"]) * 0.01}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    zeros = float(jnp.mean((params["w"] == 0.0).astype(jnp.float32)))
    assert 0.4 <= zeros <= 0.6, zeros


def test_kd_criterion_teacher_equals_student():
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.criterions.label_smoothed_cross_entropy_with_kd import \
        LabelSmoothedCrossEntropyWithKd
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 7), jnp.float32)
    inp = {"trg": np.array([[1, 2, 3], [4, 5, 6]], np.int32),
           "trg_padding": np.zeros([2, 3], np.float32)}
    plain = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    kd = LabelSmoothedCrossEntropyWithKd({"label_smoothing": 0.1,
                                          "kd_weight": 0.5})
    ce = float(plain.reduce_loss(inp, logits))
    # teacher == student: KL term vanishes, total = (1-w)*ce + w*kl_ce
    out = {"logits": logits, "teacher_logits": logits}
    total = float(kd.reduce_loss(inp, out))
    assert abs(total - 0.5 * ce) < 1e-4


def test_kd_weight_zero_is_respected():
    """An explicit kd_weight: 0.0 must not fall back to the default."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.criterions.label_smoothed_cross_entropy_with_kd import \
        LabelSmoothedCrossEntropyWithKd
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 3, 7), jnp.float32)
    inp = {"trg": np.array([[1, 2, 3], [4, 5, 6]], np.int32),
           "trg_padding": np.zeros([2, 3], np.float32)}
    ce = float(LabelSmoothedCrossEntropy(
        {"label_smoothing": 0.1}).reduce_loss(inp, logits))
    kd = LabelSmoothedCrossEntropyWithKd({"label_smoothing": 0.1,
                                          "kd_weight": 0.0})
    out = {"logits": logits,
           "teacher_logits": jnp.asarray(rng.randn(2, 3, 7), jnp.float32)}
    assert abs(float(kd.reduce_loss(inp, out)) - ce) < 1e-5
    # default matches the reference's 0.1
    assert LabelSmoothedCrossEntropyWithKd({})._kd_weight == 0.1


def test_checkpoint_save_restore_average(tmp_path):
    from neurst_tpu.utils import checkpoints as ck
    params = {"a": {"w": np.ones([2, 2], np.float32)},
              "b": np.full([3], 3.0, np.float32)}
    ck.save_checkpoint(str(tmp_path), 10, params)
    params2 = {"a": {"w": np.zeros([2, 2], np.float32) + 3},
               "b": np.full([3], 5.0, np.float32)}
    ck.save_checkpoint(str(tmp_path), 20, params2)
    assert ck.list_checkpoints(str(tmp_path)) == [10, 20]
    latest = ck.latest_checkpoint(str(tmp_path))
    assert latest.endswith("ckpt-20.npz")
    # tolerant restore with prefix remap
    target = {"new": {"w": np.zeros([2, 2], np.float32)},
              "b": np.zeros([3], np.float32)}
    flat = ck.restore_checkpoint_params(latest)
    restored, ok, missing = ck.restore_into(
        target, flat, from_prefix="a/", to_prefix="new/")
    np.testing.assert_allclose(restored["new"]["w"], 3.0)
    np.testing.assert_allclose(restored["b"], 5.0)
    # averaging
    avg = ck.average_checkpoints(
        [str(tmp_path / "ckpt-10.npz"), str(tmp_path / "ckpt-20.npz")])
    np.testing.assert_allclose(avg["a/w"], 2.0)
    np.testing.assert_allclose(avg["b"], 4.0)


def test_multilingual_pipeline(tmp_path):
    from neurst_tpu.data.data_pipelines.multilingual_text_data_pipeline \
        import MultilingualTextDataPipeline
    p = tmp_path / "v.txt"
    p.write_text("hello\nworld\nbonjour\nmonde\n")
    dp = MultilingualTextDataPipeline(vocab_path=str(p),
                                      languages=["en", "fr"],
                                      tokenizer=None)
    meta = dp.meta
    assert set(meta["lang2id"].keys()) == {"en", "fr"}
    ids = dp.encode("hello world", is_processed=True)
    assert ids[-1] == meta["eos_id"]
    # decode strips a leading language tag
    tagged = [meta["lang2id"]["fr"]] + ids
    assert dp.decode(tagged) == "hello world"


def test_mixed_dataset_sampling_ratio():
    from neurst_tpu.data.datasets.dataset import build_dataset
    ds = build_dataset({
        "dataset.class": "mixed_train",
        "dataset.params": {
            "data_files": {
                "big": {"dataset.class": "in_memory_parallel_text",
                        "dataset.params": {"src_list": ["a"] * 90,
                                           "trg_list": ["x"] * 90}},
                "small": {"dataset.class": "in_memory_parallel_text",
                          "dataset.params": {"src_list": ["b"] * 10,
                                             "trg_list": ["y"] * 10}},
            },
            "data_sampler.class": "temperature_sampler",
            "data_sampler.params": {"temperature": 1e9},  # ~uniform
        }})
    it = ds.build_iterator()()
    counts = {"big": 0, "small": 0}
    for _ in range(400):
        ex = next(it)
        counts[ex["dataset_key"]] += 1
    # near-uniform sampling despite 9:1 size imbalance
    assert 120 < counts["small"] < 280, counts


def test_rate_scheduled_updates_freeze_and_ramp():
    from neurst_tpu.optimizers.rate_schedule_optimizer import \
        rate_scheduled_updates
    tx = rate_scheduled_updates(optax.sgd(1.0), pattern="bert",
                                freeze_until=2, ramp_steps=2)
    params = {"bert": {"w": jnp.ones([2])}, "dec": {"w": jnp.ones([2])}}
    state = tx.init(params)
    grads = {"bert": {"w": jnp.ones([2])}, "dec": {"w": jnp.ones([2])}}
    factors = []
    for _ in range(5):
        updates, state = tx.update(grads, state, params)
        # sgd(1.0) update = -grad * factor for matched vars
        factors.append(float(-updates["bert"]["w"][0]))
        assert float(-updates["dec"]["w"][0]) == 1.0
    # factor = clip((step - freeze_until) / ramp_steps, 0, 1)
    assert factors[0] == 0.0 and factors[1] == 0.0      # frozen
    assert factors[2] == 0.0                             # ramp starts at 0
    assert 0.0 < factors[3] < 1.0                        # ramping
    assert factors[4] == 1.0                             # fully on


def test_kd_criterion_state_distillation():
    """CTNMT asymptotic distillation: the state-level MSE term engages
    when kd_teacher_states is present (no teacher logits)."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.criterions.label_smoothed_cross_entropy_with_kd import \
        LabelSmoothedCrossEntropyWithKd
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 3, 7), jnp.float32)
    enc = jnp.asarray(rng.randn(2, 4, 8), jnp.float32)
    bert = jnp.asarray(rng.randn(2, 4, 8), jnp.float32)
    inp = {"trg": np.array([[1, 2, 3], [4, 5, 6]], np.int32),
           "trg_padding": np.zeros([2, 3], np.float32)}
    plain = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    ce = float(plain.reduce_loss(inp, logits))
    kd = LabelSmoothedCrossEntropyWithKd({"label_smoothing": 0.1,
                                          "kd_weight": 0.5})
    out = {"logits": logits, "kd_student_states": enc,
           "kd_teacher_states": bert,
           "kd_padding": np.zeros([2, 4], np.float32)}
    total = float(kd.reduce_loss(inp, out))
    # reference semantics: squared L2 norm over the hidden dim (SUM),
    # averaged over non-padded positions
    sq = float(jnp.mean(jnp.sum((enc - bert) ** 2, axis=-1)))
    assert abs(total - (0.5 * ce + 0.5 * sq)) < 1e-4
    # identical states: the KD term vanishes
    out["kd_teacher_states"] = enc
    assert abs(float(kd.reduce_loss(inp, out)) - 0.5 * ce) < 1e-5


def test_ctnmt_bert_as_encoder_builds_without_encoder_dims():
    """bert_as_encoder skips the MT encoder entirely, so no encoder.*
    dims are required (the BERT trunk is the encoder)."""
    import jax

    from neurst_tpu.models.model import build_model

    cfg = {"model.class": "ctnmt", "model.params": {
        "bert_mode": "bert_as_encoder",
        "modality.share_embedding_and_softmax_weights": True,
        "modality.dim": 8, "modality.timing": "sinusoids",
        "decoder.num_layers": 1, "decoder.hidden_size": 8,
        "decoder.num_attention_heads": 2, "decoder.filter_size": 16,
        "bert.num_layers": 1, "bert.hidden_size": 8,
        "bert.num_attention_heads": 2, "bert.filter_size": 16,
        "dtype": "float32"}}
    meta = {"vocab_size": 16, "eos_id": 1, "bos_id": 2, "unk_id": 3,
            "pad_id": 1}
    model = build_model(cfg, src_meta=dict(meta), trg_meta=dict(meta))
    params = model.init_params(jax.random.PRNGKey(0))
    flat_names = []

    def _walk(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                _walk(v, prefix + k + "/")
            else:
                flat_names.append(prefix + k)
    _walk(params)
    assert any(n.startswith("bert/") for n in flat_names)
    assert not any(n.startswith("encoder/") for n in flat_names)
    inputs = {"src": jnp.ones([2, 5], jnp.int32),
              "src_length": jnp.asarray([5, 3], jnp.int32),
              "trg_input": jnp.ones([2, 4], jnp.int32)}
    logits = model.call(params, inputs, is_training=False)
    assert logits.shape == (2, 4, 16)
