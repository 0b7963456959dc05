"""scan-over-layers decoder: teacher-forcing numerics, stepwise beam
decode through the stacked cache, and the per-layer <-> stacked
checkpoint bridge.  Covers the encoder-decoder Transformer and the
decoder-only GPT-2 (deep-stack compile-time story)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _model(scan):
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    cfg["decoder.scan_layers"] = scan
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


def _batch():
    return {
        "src": np.array([[3, 4, 5, 19, 0, 0], [6, 7, 8, 9, 10, 19]],
                        np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1], [0] * 6], np.float32),
        "trg_input": np.array([[19, 2, 3], [19, 4, 5]], np.int32),
    }


def _bridged_params(loop, scan):
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    params_loop = loop.init_params(jax.random.PRNGKey(0))
    params_scan, _, missing = restore_into(
        scan.init_params(jax.random.PRNGKey(1)),
        flatten_params(params_loop))
    assert not missing, missing
    return params_loop, params_scan


def test_scan_decoder_matches_loop_teacher_forcing():
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    loop = _model(False)
    scan = _model(True)
    params_loop, params_scan = _bridged_params(loop, scan)
    stacked_names = [n for n in flatten_params(params_scan)
                     if "decoder/layers/layer/" in n]
    assert stacked_names, "scan model has no stacked decoder params"

    out_loop = np.asarray(loop.call(params_loop, _batch()))
    out_scan = np.asarray(scan.call(params_scan, _batch()))
    np.testing.assert_allclose(out_scan, out_loop, rtol=0, atol=1e-5)

    # stacked layout restores back into the per-layer layout
    params_loop2, _, missing2 = restore_into(
        params_loop, flatten_params(params_scan))
    assert not missing2, missing2
    out_loop2 = np.asarray(loop.call(params_loop2, _batch()))
    np.testing.assert_allclose(out_loop2, out_loop, rtol=0, atol=1e-6)


def test_scan_decoder_beam_decode_matches_loop():
    """Stepwise decode goes through the stacked cache (leading layer
    axis; beam tile/reorder on axis 1): identical hypotheses+scores."""
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    loop = _model(False)
    scan = _model(True)
    params_loop, params_scan = _bridged_params(loop, scan)
    inputs = {k: v for k, v in _batch().items() if k != "trg_input"}
    inputs["trg_input"] = np.full([2], META["bos_id"], np.int32)

    def decode(model, params):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=12)
        return sequence_beam_search(
            s2l, init, beam_size=3, top_k=1,
            maximum_decode_length=12, extra_decode_length=6)

    hyp_loop, score_loop = decode(loop, params_loop)
    hyp_scan, score_scan = decode(scan, params_scan)
    np.testing.assert_array_equal(np.asarray(hyp_scan),
                                  np.asarray(hyp_loop))
    np.testing.assert_allclose(np.asarray(score_scan),
                               np.asarray(score_loop), rtol=0, atol=1e-5)


def test_scan_decoder_grads_match_loop():
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.utils.checkpoints import flatten_params
    loop = _model(False)
    scan = _model(True)
    params_loop, params_scan = _bridged_params(loop, scan)
    batch = dict(_batch())
    batch["trg"] = np.array([[2, 3, 19], [4, 5, 19]], np.int32)
    batch["trg_padding"] = np.zeros([2, 3], np.float32)
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})

    def loss(model, p):
        logits = model.call(p, batch, is_training=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
        return criterion.reduce_loss(batch, logits)

    assert abs(float(loss(loop, params_loop))
               - float(loss(scan, params_scan))) < 1e-5
    g_loop = flatten_params(jax.grad(lambda p: loss(loop, p))(params_loop))
    g_scan = flatten_params(jax.grad(lambda p: loss(scan, p))(params_scan))
    for name, g in g_scan.items():
        if "/layers/layer/" in name:
            base, rest = name.split("/layers/layer/")
            ref = np.stack([np.asarray(g_loop[f"{base}/layer_{i}/{rest}"])
                            for i in range(np.asarray(g).shape[0])], 0)
        else:
            ref = np.asarray(g_loop[name])
        np.testing.assert_allclose(np.asarray(g), ref, rtol=0, atol=2e-5,
                                   err_msg=name)


def test_scan_decoder_waitk_lagging_matches_loop():
    """decode_lagging (wait-k cross-attention masking) broadcasts
    through the scan: teacher-forcing logits equal the loop decoder."""
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer

    def make(scan):
        cfg = dict(Transformer.build_model_args_by_name(
            "transformer_toy")["model.params"])
        cfg.update({"dtype": "float32", "wait_k": 2,
                    "encoder.attention_monotonic": True,
                    "decoder.scan_layers": scan})
        for prefix in ("encoder", "decoder"):
            for key in ("attention_dropout_rate", "ffn_dropout_rate",
                        "layer_postprocess_dropout_rate"):
                cfg[f"{prefix}.{key}"] = 0.0
        return build_model({"model.class": "waitk_transformer",
                            "model.params": cfg},
                           src_meta=META, trg_meta=META)

    loop = make(False)
    scan = make(True)
    params_loop, params_scan = _bridged_params(loop, scan)
    inputs = {"src": np.array([[3, 4, 5, 6, 7, 19]], np.int32),
              "src_padding": np.zeros([1, 6], np.float32),
              "trg_input": np.array([[19, 2, 3]], np.int32)}
    out_loop = np.asarray(loop.call(params_loop, inputs))
    out_scan = np.asarray(scan.call(params_scan, inputs))
    np.testing.assert_allclose(out_scan, out_loop, rtol=0, atol=1e-5)


def test_scan_decoder_gpt2_teacher_forcing_and_generation():
    """Decoder-only (no cross attention): scan matches loop for the LM
    forward and for prompt-prefill greedy generation."""
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.models.model import build_model

    def make(scan):
        return build_model(
            {"model.class": "gpt2",
             "model.params": {"num_layers": 3, "hidden_size": 16,
                              "num_attention_heads": 2, "filter_size": 32,
                              "max_positions": 64, "dropout_rate": 0.0,
                              "scan_layers": scan, "dtype": "float32"}},
            trg_meta=META)

    loop = make(False)
    scan = make(True)
    params_loop, params_scan = _bridged_params(loop, scan)
    inputs = {"trg_input": np.array([[19, 3, 4], [19, 5, 6]], np.int32)}
    out_loop = np.asarray(loop.call(params_loop, inputs))
    out_scan = np.asarray(scan.call(params_scan, inputs))
    np.testing.assert_allclose(out_scan, out_loop, rtol=0, atol=1e-5)

    def decode(model, params):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=8)
        return sequence_beam_search(
            s2l, init, beam_size=2, top_k=1, maximum_decode_length=8)

    hyp_loop, _ = decode(loop, params_loop)
    hyp_scan, _ = decode(scan, params_scan)
    np.testing.assert_array_equal(np.asarray(hyp_scan),
                                  np.asarray(hyp_loop))
