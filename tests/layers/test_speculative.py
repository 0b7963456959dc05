"""Speculative decoding (layers/search/speculative.py): greedy-EXACT
draft-accelerated decode.  Pins (a) the multi-token per-row-time step
function against sequential single steps, and (b) the speculative
output against the plain greedy decode (sampling with top_k=1) with a
same-weights draft (always accepts) AND an independently-initialized
draft (partial acceptance exercises the rewind/correction path)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _model(seed_label="x", layers=2):
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    cfg["encoder.num_layers"] = layers
    cfg["decoder.num_layers"] = layers
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


def _inputs(batch=3):
    rng = np.random.RandomState(0)
    src = np.concatenate(
        [rng.randint(4, 18, size=[batch, 5]),
         np.full([batch, 1], META["eos_id"])], axis=1).astype(np.int32)
    return {"src": src,
            "src_padding": np.zeros([batch, 6], np.float32),
            "trg_input": np.full([batch], META["bos_id"], np.int32)}


def _truncate_at_eos(ids):
    """Canonical comparison form: tokens up to and incl. first EOS."""
    out = []
    for row in np.asarray(ids):
        row = list(row)
        cut = row.index(META["eos_id"]) + 1 if META["eos_id"] in row \
            else len(row)
        out.append(tuple(row[:cut]))
    return out


def test_decode_steps_match_sequential_single_steps():
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inputs()
    s2l, init = model.prepare_generation(params, inputs,
                                         decode_padded_length=8)
    steps_fn, init2 = model.prepare_speculative(params, inputs,
                                                decode_padded_length=8)
    tokens = np.array([[19, 3, 4], [19, 5, 6], [19, 7, 8]], np.int32)

    # sequential singles
    cache = init["decoder_internal_cache"]
    seq_logits = []
    for t in range(3):
        lg, cache = s2l(jnp.asarray(tokens[:, t]), cache,
                        jnp.asarray(t, jnp.int32))
        seq_logits.append(np.asarray(lg))
    seq_logits = np.stack(seq_logits, axis=1)  # [B, 3, V]

    # one multi-token call at per-row times 0
    multi_logits, _ = steps_fn(
        jnp.asarray(tokens), init2["decoder_internal_cache"],
        jnp.zeros([3], jnp.int32))
    np.testing.assert_allclose(np.asarray(multi_logits), seq_logits,
                               rtol=0, atol=1e-4)

    # and with per-row STAGGERED times: rows advanced to depth 1 and 2
    # via single steps first must agree with a shifted multi call
    cache = init["decoder_internal_cache"]
    _, cache = s2l(jnp.asarray(tokens[:, 0]), cache,
                   jnp.asarray(0, jnp.int32))
    lg_ref, _ = s2l(jnp.asarray(tokens[:, 1]), cache,
                    jnp.asarray(1, jnp.int32))
    lg_vec, _ = steps_fn(jnp.asarray(tokens[:, 1:2]), cache,
                         jnp.ones([3], jnp.int32))
    np.testing.assert_allclose(np.asarray(lg_vec[:, 0]),
                               np.asarray(lg_ref), rtol=0, atol=1e-4)


@pytest.mark.parametrize("k", [1, 5])
def test_speculative_k_edges_equal_greedy(k):
    """k=1 (degenerate single-token window) and k=5 (> typical accept
    run) both reproduce plain greedy."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode
    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))
    draft = _model(layers=1)
    params_d = draft.init_params(jax.random.PRNGKey(9))
    inputs = _inputs()
    max_len = 12
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, _ = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=max_len + k)
    d_fn, d_init = draft.prepare_speculative(
        params_d, inputs, decode_padded_length=max_len + k)
    ids_spec, _ = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=k,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)


@pytest.mark.parametrize("draft_kind", ["same", "different"])
def test_speculative_equals_plain_greedy(draft_kind):
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode

    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))
    if draft_kind == "same":
        draft, params_d = target, params_t
    else:
        draft = _model(layers=1)
        params_d = draft.init_params(jax.random.PRNGKey(9))
    inputs = _inputs()
    max_len = 14

    # plain greedy baseline: sampling with top_k=1 IS argmax decode
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, lp_ref = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)

    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=max_len + 3)
    d_fn, d_init = draft.prepare_speculative(
        params_d, inputs, decode_padded_length=max_len + 3)
    ids_spec, lp_spec = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=3,
        maximum_decode_length=max_len, extra_decode_length=max_len)

    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)
    np.testing.assert_allclose(np.asarray(lp_spec), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("draft_kind", ["same", "different"])
def test_gpt2_speculative_equals_plain_greedy(draft_kind):
    """LM speculative decoding: the prompt prefill shifts every cache
    position (decode_time_offset); output equals plain LM greedy."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode
    from neurst_tpu.models.gpt2 import GPT2
    from neurst_tpu.models.model import build_model

    def lm(seed):
        cfg = GPT2.build_model_args_by_name("gpt2_toy")
        params_cfg = dict(cfg["model.params"])
        params_cfg["dropout_rate"] = 0.0
        params_cfg["dtype"] = "float32"
        model = build_model(dict(cfg, **{"model.params": params_cfg}),
                            src_meta=META, trg_meta=META)
        return model, model.init_params(jax.random.PRNGKey(seed))

    target, params_t = lm(0)
    if draft_kind == "same":
        draft, params_d = target, params_t
    else:
        draft, params_d = lm(11)
    prompt = {"trg_input": np.array([[5, 6, 7], [8, 9, 10]], np.int32)}
    max_len = 10

    s2l, init = target.prepare_generation(params_t, prompt,
                                          decode_padded_length=max_len)
    ids_ref, lp_ref = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)

    t_fn, t_init = target.prepare_speculative(
        params_t, prompt, decode_padded_length=max_len + 3)
    d_fn, d_init = draft.prepare_speculative(
        params_d, prompt, decode_padded_length=max_len + 3)
    ids_spec, lp_spec = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=3,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)
    np.testing.assert_allclose(np.asarray(lp_spec), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


def test_speech_transformer_speculative_equals_greedy():
    """The flagship ST model: the conv front-end + post-conv length
    recompute compose with the multi-token per-row-time decode path."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.speech_transformer import SpeechTransformer

    cfg = SpeechTransformer.build_model_args_by_name(
        "speech_transformer_toy")
    params_cfg = dict(cfg["model.params"])
    params_cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        for key in ("attention_dropout_rate", "ffn_dropout_rate",
                    "layer_postprocess_dropout_rate"):
            params_cfg[f"{prefix}.{key}"] = 0.0
    trg_meta = {"vocab_size": 32, "eos_id": 1, "bos_id": 2, "unk_id": 3,
                "pad_id": 1, "language": "fr"}
    src_meta = {"audio_feature_dim": 8, "audio_feature_channels": 1}
    target = build_model(dict(cfg, **{"model.params": params_cfg}),
                         src_meta=src_meta, trg_meta=trg_meta)
    params_t = target.init_params(jax.random.PRNGKey(2))
    draft, params_d = target, params_t  # same-weights draft

    rng = np.random.RandomState(3)
    inputs = {
        "src": rng.randn(2, 32, 8, 1).astype(np.float32),
        "src_length": np.array([32, 24], np.int32),
        "trg_input": np.full([2], trg_meta["bos_id"], np.int32),
    }
    max_len = 10
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, _ = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=max_len + 3)
    d_fn, d_init = draft.prepare_speculative(
        params_d, inputs, decode_padded_length=max_len + 3)
    ids_spec, _ = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=3,
        maximum_decode_length=max_len, extra_decode_length=max_len)

    def canon(ids):
        out = []
        for row in np.asarray(ids):
            row = list(row)
            cut = row.index(1) + 1 if 1 in row else len(row)
            out.append(tuple(row[:cut]))
        return out

    assert canon(ids_spec) == canon(ids_ref)


def test_speculative_sampling_preserves_target_distribution():
    """Acceptance-rejection speculative sampling: the first emitted
    token's empirical distribution over many rows matches the target's
    (masked) softmax — with an INDEPENDENT draft, so rejections and
    residual resampling genuinely happen (seeded; ~4-sigma bounds)."""
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode

    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))
    draft = _model(layers=1)
    params_d = draft.init_params(jax.random.PRNGKey(9))

    n_rows = 3000
    one = _inputs(batch=1)
    inputs = {k: np.repeat(v, n_rows, axis=0) for k, v in one.items()}

    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=4)
    d_fn, d_init = draft.prepare_speculative(
        params_d, inputs, decode_padded_length=4)
    ids, _ = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=2,
        maximum_decode_length=1, extra_decode_length=1,
        sampling=True, rng=jax.random.PRNGKey(123))
    first = np.asarray(ids)[:, 0]

    # the target's true first-token distribution (same masking: UNK
    # banned, full softmax otherwise)
    s2l, init = target.prepare_generation(params_t, one,
                                          decode_padded_length=4)
    logits, _ = s2l(jnp.asarray([META["bos_id"]], jnp.int32),
                    init["decoder_internal_cache"],
                    jnp.asarray(0, jnp.int32))
    lp = jax.nn.log_softmax(np.asarray(logits, np.float32))
    p = np.exp(np.asarray(lp))[0]
    p[META["unk_id"]] = 0.0
    p = p / p.sum()

    freq = np.bincount(first, minlength=META["vocab_size"]
                       ).astype(np.float64) / n_rows
    sigma = np.sqrt(np.maximum(p * (1 - p), 1e-9) / n_rows)
    assert np.all(np.abs(freq - p) < 4.5 * sigma + 5e-3), \
        np.max(np.abs(freq - p) / (sigma + 1e-9))
    assert 0.5 * np.sum(np.abs(freq - p)) < 0.05  # total variation

    # multi-step smoke: terminates, tokens in-vocab, UNK never emitted
    # (fresh caches sized max_len + k per the no-clamp contract)
    t_fn8, t_init8 = target.prepare_speculative(
        params_t, inputs, decode_padded_length=8 + 3)
    d_fn8, d_init8 = draft.prepare_speculative(
        params_d, inputs, decode_padded_length=8 + 3)
    ids8, _ = speculative_greedy_decode(
        t_fn8, t_init8, d_fn8, d_init8, speculative_k=3,
        maximum_decode_length=8, extra_decode_length=8,
        sampling=True, top_k=5, rng=jax.random.PRNGKey(7))
    ids8 = np.asarray(ids8)
    assert ids8.shape == (n_rows, 8)
    assert ids8.min() >= 0 and ids8.max() < META["vocab_size"]
    assert not np.any(ids8 == META["unk_id"])


def test_scan_layers_speculative_equals_greedy():
    """Vector decode times broadcast through the nn.scan decoder; the
    stacked cache's per-row vmap writes land per layer slice."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode
    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))

    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg.update({"dtype": "float32", "encoder.num_layers": 2,
                "decoder.num_layers": 2, "decoder.scan_layers": True})
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    scan = build_model({"model.class": "transformer",
                        "model.params": cfg},
                       src_meta=META, trg_meta=META)
    params_s, _, missing = restore_into(
        scan.init_params(jax.random.PRNGKey(7)),
        flatten_params(params_t))
    assert not missing, missing

    inputs = _inputs()
    max_len = 12
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, _ = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    t_fn, t_init = scan.prepare_speculative(
        params_s, inputs, decode_padded_length=max_len + 3)
    d_fn, d_init = scan.prepare_speculative(
        params_s, inputs, decode_padded_length=max_len + 3)
    ids_spec, _ = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=3,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)


def test_moe_speculative_equals_greedy():
    """MoE decoders: the dropless short-window routing makes the
    multi-token verification match single-token decode exactly even
    with E > 2*top_k (where the capacity bound would otherwise drop
    tokens stepwise decode keeps)."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import \
        speculative_greedy_decode
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg.update({"dtype": "float32",
                "decoder.moe_num_experts": 4,
                "decoder.moe_layer_frequency": 2,
                "decoder.moe_router_jitter": 0.0})
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    target = build_model({"model.class": "transformer",
                          "model.params": cfg},
                         src_meta=META, trg_meta=META)
    params_t = target.init_params(jax.random.PRNGKey(4))

    inputs = _inputs()
    max_len = 12
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, _ = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=max_len + 3)
    ids_spec, _ = speculative_greedy_decode(
        t_fn, t_init, t_fn, t_init, speculative_k=3,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)


def test_lightconv_speculative_raises_clearly():
    """Non-transformer decoders (LightConv ring buffers) have no
    multi-token per-row-time path: decode_steps must raise instead of
    silently consuming only the first of k tokens."""
    from neurst_tpu.models.light_convolution_model import \
        LightConvolutionModel
    from neurst_tpu.models.model import build_model
    cfg = LightConvolutionModel.build_model_args_by_name("lightconv_toy")
    model = build_model(cfg, src_meta=META, trg_meta=META)
    params = model.init_params(jax.random.PRNGKey(6))
    steps_fn, init = model.prepare_speculative(
        params, _inputs(batch=2), decode_padded_length=8)
    with pytest.raises(NotImplementedError, match="LightConv|transformer"):
        steps_fn(np.ones([2, 3], np.int32),
                 init["decoder_internal_cache"],
                 jnp.zeros([2], jnp.int32))


def test_speculative_search_layer_registered():
    from neurst_tpu.layers.search.sequence_search import build_search_layer
    layer = build_search_layer({
        "search_method.class": "speculative_decode",
        "search_method.params": {"speculative_k": 2}})
    assert type(layer).__name__ == "SpeculativeDecode"
    with pytest.raises(ValueError):
        layer._ensure_draft()  # no draft_model_dir configured


def test_ngram_draft_proposes_copied_spans():
    """Unit: the lookup draft continues the most recent earlier
    occurrence of the current suffix, falls back to repeat-last on a
    miss, and never lets the trivial self-match through."""
    from neurst_tpu.layers.search.speculative import make_ngram_draft

    steps_fn, init = make_ngram_draft(batch=1, buffer_len=12,
                                      vocab_size=20, ngram=3)
    cache = init["decoder_internal_cache"]
    seq = [19, 5, 6, 7, 8, 5, 6]  # BOS then emitted tokens
    proposals = []
    for t, tok in enumerate(seq):
        logits, cache = steps_fn(np.array([[tok]], np.int32), cache,
                                 jnp.asarray([t], jnp.int32))
        proposals.append(int(np.argmax(np.asarray(logits)[0, 0])))
    # at t=1 the suffix [19, 5] has no earlier occurrence -> repeat 5
    assert proposals[1] == 5
    # at t=6 the suffix [5, 6] matched positions 1..2 -> continue 7
    assert proposals[6] == 7
    # buffer recorded the fed sequence
    buf = np.asarray(cache["buffer"])[0]
    assert list(buf[:7]) == seq and buf[7] == -1


def test_ngram_draft_prefix_lookup():
    """A prefix (source/prompt) participates in matching; -1 pads
    never match."""
    from neurst_tpu.layers.search.speculative import make_ngram_draft

    prefix = np.array([[11, 12, 13, -1]], np.int32)
    steps_fn, init = make_ngram_draft(batch=1, buffer_len=8,
                                      vocab_size=20, ngram=2,
                                      prefix=prefix)
    cache = init["decoder_internal_cache"]
    # feed BOS then 12: suffix [12] matches prefix pos 1 -> continue 13
    logits, cache = steps_fn(np.array([[19]], np.int32), cache,
                             jnp.asarray([0], jnp.int32))
    logits, cache = steps_fn(np.array([[12]], np.int32), cache,
                             jnp.asarray([1], jnp.int32))
    assert int(np.argmax(np.asarray(logits)[0, 0])) == 13


@pytest.mark.parametrize("k", [2, 4])
def test_ngram_speculative_equals_greedy(k):
    """Self-drafted (no second model) speculative decode is EXACTLY the
    target's greedy decode."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import (
        make_ngram_draft, speculative_greedy_decode)

    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))
    inputs = _inputs()
    max_len = 14
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, lp_ref = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=max_len + k)
    d_fn, d_init = make_ngram_draft(
        batch=3, buffer_len=max_len + k,
        vocab_size=META["vocab_size"], ngram=3)
    ids_spec, lp_spec = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=k,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)
    np.testing.assert_allclose(np.asarray(lp_spec), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


def test_ngram_search_layer_no_draft_dir_needed():
    """--draft_method ngram through the registered search layer: no
    --draft_model_dir, output equals plain greedy; with
    --draft_lookup_source the source ids join the lookup context."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.sequence_search import \
        build_search_layer

    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))
    inputs = _inputs()
    max_len = 14
    s2l, init = target.prepare_generation(params_t, inputs,
                                          decode_padded_length=max_len)
    ids_ref, _ = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)
    for lookup_src in (False, True):
        layer = build_search_layer({
            "search_method.class": "speculative_decode",
            "search_method.params": {
                "draft_method": "ngram", "speculative_k": 3,
                "draft_lookup_source": lookup_src,
                "maximum_decode_length": max_len,
                "extra_decode_length": max_len}})
        layer.set_model(target)
        layer.prepare()  # must not demand a draft_model_dir
        ids_spec, _ = layer(params_t, {k: jnp.asarray(v)
                                       for k, v in inputs.items()})
        assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)


def test_gpt2_ngram_speculative_uses_prompt(monkeypatch):
    """LM self-drafted decode: equals plain greedy, and the prompt is
    part of the lookup context (prefix buffer)."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search import speculative as spec_mod
    from neurst_tpu.layers.search.sequence_search import \
        build_search_layer
    from neurst_tpu.models.gpt2 import GPT2
    from neurst_tpu.models.model import build_model

    cfg = GPT2.build_model_args_by_name("gpt2_toy")
    params_cfg = dict(cfg["model.params"])
    params_cfg["dropout_rate"] = 0.0
    params_cfg["dtype"] = "float32"
    target = build_model(dict(cfg, **{"model.params": params_cfg}),
                         src_meta=META, trg_meta=META)
    params_t = target.init_params(jax.random.PRNGKey(0))
    prompt = {"trg_input": np.array([[5, 6, 7], [8, 9, 10]], np.int32)}
    max_len = 10

    s2l, init = target.prepare_generation(params_t, prompt,
                                          decode_padded_length=max_len)
    ids_ref, _ = sequence_sampling(
        s2l, init, jax.random.PRNGKey(0), top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len)

    seen = {}
    orig = spec_mod.make_ngram_draft

    def spy(*args, **kwargs):
        seen["prefix"] = kwargs.get("prefix")
        return orig(*args, **kwargs)

    monkeypatch.setattr(spec_mod, "make_ngram_draft", spy)
    layer = build_search_layer({
        "search_method.class": "speculative_decode",
        "search_method.params": {
            "draft_method": "ngram", "speculative_k": 3,
            "maximum_decode_length": max_len,
            "extra_decode_length": max_len}})
    layer.set_model(target)
    ids_spec, _ = layer(params_t, {"trg_input":
                                   jnp.asarray(prompt["trg_input"])})
    assert _truncate_at_eos(ids_spec) == _truncate_at_eos(ids_ref)
    assert seen["prefix"] is not None and seen["prefix"].shape == (2, 3)


def test_ngram_speculative_sampling_smoke():
    """Sampling mode with the deterministic (one-hot q) draft: the
    acceptance-rejection math degenerates to accept-with-prob-p +
    residual resample; decode terminates with in-vocab tokens."""
    from neurst_tpu.layers.search.speculative import (
        make_ngram_draft, speculative_greedy_decode)

    target = _model(layers=2)
    params_t = target.init_params(jax.random.PRNGKey(1))
    inputs = _inputs()
    max_len = 8
    t_fn, t_init = target.prepare_speculative(
        params_t, inputs, decode_padded_length=max_len + 3)
    d_fn, d_init = make_ngram_draft(
        batch=3, buffer_len=max_len + 3,
        vocab_size=META["vocab_size"], ngram=3)
    ids, _ = speculative_greedy_decode(
        t_fn, t_init, d_fn, d_init, speculative_k=3,
        maximum_decode_length=max_len, extra_decode_length=max_len,
        sampling=True, top_k=5, rng=jax.random.PRNGKey(7))
    ids = np.asarray(ids)
    assert ids.shape == (3, max_len)
    assert ids.min() >= 0 and ids.max() < META["vocab_size"]
    assert not np.any(ids == META["unk_id"])


# ---------------------------- beam mode ---------------------------- #

def _plain_beam(model, params, inputs, beam, max_len, top_k=1,
                min_len=0, lp=0.6):
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    s2l, init = model.prepare_generation(params, inputs,
                                         decode_padded_length=max_len)
    return sequence_beam_search(
        s2l, init, beam_size=beam, top_k=top_k, length_penalty=lp,
        maximum_decode_length=max_len, extra_decode_length=max_len,
        minimum_decode_length=min_len)


def _spec_beam(model, params, inputs, beam, max_len, k, top_k=1,
               min_len=0, lp=0.6, stats=False):
    from neurst_tpu.layers.search.speculative import (
        make_ngram_draft, speculative_beam_search)
    t_fn, t_init = model.prepare_speculative(
        params, inputs, decode_padded_length=max_len + k)
    bb = t_init["decoder_input"].shape[0] * beam
    d_fn, d_init = make_ngram_draft(bb, max_len + k,
                                    META["vocab_size"], ngram=3)
    return speculative_beam_search(
        t_fn, t_init, d_fn, d_init, beam_size=beam, speculative_k=k,
        top_k=top_k, length_penalty=lp, maximum_decode_length=max_len,
        extra_decode_length=max_len, minimum_decode_length=min_len,
        return_stats=stats)


@pytest.mark.parametrize("k", [1, 2, 4])
def test_speculative_beam_matches_plain_beam(k):
    """Speculative beam search is EXACTLY plain beam search — the
    draft only changes how many target passes it takes."""
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inputs()
    hyp_p, sc_p = _plain_beam(model, params, inputs, beam=3, max_len=10)
    hyp_s, sc_s = _spec_beam(model, params, inputs, beam=3, max_len=10,
                             k=k)
    assert _truncate_at_eos(hyp_s) == _truncate_at_eos(hyp_p)
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_p),
                               rtol=0, atol=1e-4)


def test_speculative_beam_topk_and_minlen():
    """top_k > 1 hypotheses and the min-length EOS mask replicate."""
    model = _model(seed_label="y")
    params = model.init_params(jax.random.PRNGKey(1))
    inputs = _inputs(batch=2)
    hyp_p, sc_p = _plain_beam(model, params, inputs, beam=4, max_len=9,
                              top_k=3, min_len=4)
    hyp_s, sc_s = _spec_beam(model, params, inputs, beam=4, max_len=9,
                             k=3, top_k=3, min_len=4)
    assert _truncate_at_eos(hyp_s) == _truncate_at_eos(hyp_p)
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_p),
                               rtol=0, atol=1e-4)


def test_speculative_beam_stats_and_progress():
    """Commit-rate stats: target passes never exceed emitted steps and
    speculation commits at least one step per pass."""
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inputs()
    hyp, sc, stats = _spec_beam(model, params, inputs, beam=3,
                                max_len=10, k=4, stats=True)
    passes = int(stats["target_passes"])
    max_emitted = int(np.max(np.asarray(stats["tokens_emitted"])))
    assert 1 <= passes <= 10
    assert passes <= 10 and max_emitted <= 10
    # exactness vs plain beam regardless of the realized commit rate
    hyp_p, _ = _plain_beam(model, params, inputs, beam=3, max_len=10)
    assert _truncate_at_eos(hyp) == _truncate_at_eos(hyp_p)
