"""Chunked prefix decode (decode-step HBM lever): the decode loop runs
in geometrically growing self-cache prefix chunks so each step's
attention reads, softmax width and beam-reorder gather touch ~the valid
cache prefix instead of maximum_decode_length.  Exact by construction
(positions beyond the step are zeros and masked): these tests pin
hypothesis/score equality against the full-length loop across the
per-layer, scan-over-layers, GPT-2-prefill and sampling paths, and the
structural chunkability detection (LightConv ring buffers must NOT be
chunked)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _model(scan=False):
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


def _inputs():
    return {
        "src": np.array([[3, 4, 5, 19, 0, 0], [6, 7, 8, 9, 10, 19]],
                        np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1], [0] * 6], np.float32),
        "trg_input": np.full([2], META["bos_id"], np.int32),
    }


def _beam_decode(model, params, chunk, max_len=16, min_len=0):
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    s2l, init = model.prepare_generation(
        params, _inputs(), decode_padded_length=max_len)
    return sequence_beam_search(
        s2l, init, beam_size=3, top_k=1,
        maximum_decode_length=max_len, extra_decode_length=max_len,
        minimum_decode_length=min_len, prefix_decode_chunk=chunk)


@pytest.mark.parametrize("scan", [False, True])
def test_beam_chunked_equals_full(scan):
    model = _model(scan)
    params = model.init_params(jax.random.PRNGKey(0))
    hyp_full, score_full = _beam_decode(model, params, chunk=0)
    hyp_chunk, score_chunk = _beam_decode(model, params, chunk=4)
    np.testing.assert_array_equal(np.asarray(hyp_chunk),
                                  np.asarray(hyp_full))
    np.testing.assert_allclose(np.asarray(score_chunk),
                               np.asarray(score_full), rtol=0, atol=1e-5)


def test_beam_chunked_forced_full_length():
    """min_decode forces the loop through every chunk boundary."""
    model = _model(False)
    params = model.init_params(jax.random.PRNGKey(1))
    hyp_full, score_full = _beam_decode(model, params, chunk=0, min_len=15)
    hyp_chunk, score_chunk = _beam_decode(model, params, chunk=4,
                                          min_len=15)
    np.testing.assert_array_equal(np.asarray(hyp_chunk),
                                  np.asarray(hyp_full))
    np.testing.assert_allclose(np.asarray(score_chunk),
                               np.asarray(score_full), rtol=0, atol=1e-5)


def test_sampling_chunked_equals_full():
    from neurst_tpu.layers.search.sampling import sequence_sampling
    model = _model(False)
    params = model.init_params(jax.random.PRNGKey(2))

    def run(chunk):
        s2l, init = model.prepare_generation(
            params, _inputs(), decode_padded_length=16)
        return sequence_sampling(
            s2l, init, jax.random.PRNGKey(7), top_k=5, num_samples=2,
            maximum_decode_length=16, extra_decode_length=16,
            prefix_decode_chunk=chunk)

    ids_full, lp_full = run(0)
    ids_chunk, lp_chunk = run(4)
    np.testing.assert_array_equal(np.asarray(ids_chunk),
                                  np.asarray(ids_full))
    np.testing.assert_allclose(np.asarray(lp_chunk), np.asarray(lp_full),
                               rtol=0, atol=1e-5)


def test_gpt2_prefill_chunked_equals_full():
    """decode_time_offset: the chunk sizing accounts for the prompt
    prefill occupying the first cache positions."""
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.models.gpt2 import GPT2
    from neurst_tpu.models.model import build_model
    cfg = GPT2.build_model_args_by_name("gpt2_toy")
    params_cfg = dict(cfg["model.params"])
    params_cfg["dropout_rate"] = 0.0
    model = build_model(dict(cfg, **{"model.params": params_cfg}),
                        src_meta=META, trg_meta=META)
    params = model.init_params(jax.random.PRNGKey(3))
    prompt = {"trg_input": np.array([[5, 6, 7], [8, 9, 10]], np.int32)}

    def run(chunk):
        s2l, init = model.prepare_generation(
            params, prompt, decode_padded_length=16)
        assert init["decode_time_offset"] == 2
        return sequence_beam_search(
            s2l, init, beam_size=2, top_k=1,
            maximum_decode_length=16, extra_decode_length=16,
            prefix_decode_chunk=chunk)

    hyp_full, score_full = run(0)
    hyp_chunk, score_chunk = run(4)
    np.testing.assert_array_equal(np.asarray(hyp_chunk),
                                  np.asarray(hyp_full))
    np.testing.assert_allclose(np.asarray(score_chunk),
                               np.asarray(score_full), rtol=0, atol=1e-5)


def test_lightconv_cache_not_chunkable_and_decode_matches():
    """LightConv ring buffers live under "conv": structural detection
    must refuse to slice them, and decode with the flag set must fall
    back to the (identical) full-length loop."""
    from neurst_tpu.layers.layer_utils import cache_is_prefix_chunkable
    from neurst_tpu.models.light_convolution_model import \
        LightConvolutionModel
    from neurst_tpu.models.model import build_model
    cfg = LightConvolutionModel.build_model_args_by_name("lightconv_toy")
    params_cfg = dict(cfg["model.params"])
    for k in list(params_cfg):
        if k.endswith("dropout_rate"):
            params_cfg[k] = 0.0
    model = build_model(dict(cfg, **{"model.params": params_cfg}),
                        src_meta=META, trg_meta=META)
    params = model.init_params(jax.random.PRNGKey(4))
    s2l, init = model.prepare_generation(
        params, _inputs(), decode_padded_length=16)
    assert not cache_is_prefix_chunkable(init["decoder_internal_cache"])

    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    out = [sequence_beam_search(
        s2l, init, beam_size=2, top_k=1, maximum_decode_length=16,
        extra_decode_length=16, prefix_decode_chunk=c) for c in (0, 4)]
    np.testing.assert_array_equal(np.asarray(out[1][0]),
                                  np.asarray(out[0][0]))


def test_resize_self_cache_layouts():
    from neurst_tpu.layers.layer_utils import (cache_is_prefix_chunkable,
                                               resize_self_cache)
    per_layer = {"layer_0": {
        "self": {"keys": jnp.ones([2, 8, 2, 4])},
        "memory": {"keys": jnp.ones([2, 6, 2, 4])}}}
    sliced = resize_self_cache(per_layer, 4)
    assert sliced["layer_0"]["self"]["keys"].shape == (2, 4, 2, 4)
    assert sliced["layer_0"]["memory"]["keys"].shape == (2, 6, 2, 4)
    back = resize_self_cache(sliced, 8)
    assert back["layer_0"]["self"]["keys"].shape == (2, 8, 2, 4)
    # zero-padded tail (slice/pad are exact inverses on unwritten tail)
    np.testing.assert_array_equal(
        np.asarray(back["layer_0"]["self"]["keys"][:, 4:]), 0.0)
    assert cache_is_prefix_chunkable(per_layer)

    stacked = {"stacked": {"self": {"keys": jnp.ones([3, 2, 8, 2, 4])},
                           "memory": {"keys": jnp.ones([3, 2, 6, 2, 4])}}}
    s2 = resize_self_cache(stacked, 4)
    assert s2["stacked"]["self"]["keys"].shape == (3, 2, 4, 2, 4)
    assert s2["stacked"]["memory"]["keys"].shape == (3, 2, 6, 2, 4)
    assert cache_is_prefix_chunkable(stacked)

    assert not cache_is_prefix_chunkable(
        {"layer_0": {"conv": {"buf": jnp.ones([2, 3, 4])}}})
    assert not cache_is_prefix_chunkable({"layer_0": {"memory": {
        "keys": jnp.ones([2, 6, 2, 4])}}})  # no self leaf at all
