# Copyright 2026 The NeurST-TPU Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
"""Beam-search cache indirection is EXACT vs the physical reorder.

The indirect path (beam_search.py `cache_indirection`) never reorders
the self kv-cache; decode self-attention reads it through a [B, beam,
max_len] ancestor-index matrix (MultiHeadSelfAttention._attend_indirect)
— the same dot products, selected in-register by a one-hot over the
beam axis.  These tests pin hypothesis-and-score equality against the
reorder path across cache layouts (per-layer / scan), prefix chunking
and loop unrolling, on text and speech models; plus the capability
gate (LightConv's ring-buffer cache must fall back to the reorder).

Reference for the loop this optimizes:
/root/reference/neurst/layers/search/beam_search.py:374-424 (the cache
gather at 403-404 is the traffic the indirection removes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurst_tpu.layers.search.beam_search import sequence_beam_search
from neurst_tpu.models.model import build_model

TEXT_META = {"vocab_size": 37, "eos_id": 1, "bos_id": 2, "unk_id": 3}


def _text_model(scan_layers=False):
    args = {"model.class": "transformer", "model.params": {
        "modality.dim": 32,
        "modality.share_embedding_and_softmax_weights": True,
        "encoder.num_layers": 2, "encoder.hidden_size": 32,
        "encoder.num_attention_heads": 2, "encoder.filter_size": 64,
        "decoder.num_layers": 2, "decoder.hidden_size": 32,
        "decoder.num_attention_heads": 2, "decoder.filter_size": 64,
        "decoder.scan_layers": scan_layers,
        "dtype": "float32"}}
    return build_model(args, src_meta=dict(TEXT_META),
                       trg_meta=dict(TEXT_META))


def _text_inputs():
    rng = np.random.RandomState(0)
    return {"src": jnp.asarray(rng.randint(4, 37, size=(3, 7)), jnp.int32),
            "src_length": jnp.asarray([7, 5, 3], jnp.int32),
            "trg_input": jnp.full([3], 2, jnp.int32)}


def _decode(model, inputs, indirection, chunk=0, unroll=1,
            max_len=16, beam=4):
    s2l, init = model.prepare_generation(
        model.init_params(jax.random.PRNGKey(0)), inputs,
        decode_padded_length=max_len)
    hyp, scores = sequence_beam_search(
        s2l, init, beam_size=beam, top_k=2,
        maximum_decode_length=max_len, extra_decode_length=max_len,
        prefix_decode_chunk=chunk, decode_unroll=unroll,
        cache_indirection=indirection)
    return np.asarray(hyp), np.asarray(scores), init


@pytest.mark.parametrize("scan_layers", [False, True])
@pytest.mark.parametrize("chunk,unroll", [(0, 1), (4, 2)])
def test_indirection_exact_text(scan_layers, chunk, unroll):
    model = _text_model(scan_layers)
    inputs = _text_inputs()
    h0, s0, init = _decode(model, inputs, False, chunk, unroll)
    h1, s1, _ = _decode(model, inputs, True, chunk, unroll)
    assert init["beam_cache_indirection_ok"] is True
    np.testing.assert_array_equal(h0, h1)
    np.testing.assert_allclose(s0, s1, rtol=2e-5, atol=2e-5)


def test_indirection_exact_speech():
    args = {"model.class": "speech_transformer", "model.params": {
        "modality.dim": 32,
        "encoder.num_layers": 2, "encoder.hidden_size": 32,
        "encoder.num_attention_heads": 2, "encoder.filter_size": 64,
        "decoder.num_layers": 2, "decoder.hidden_size": 32,
        "decoder.num_attention_heads": 2, "decoder.filter_size": 64,
        "conv_channels": 8, "dtype": "float32"}}
    model = build_model(args, src_meta={"audio_feature_dim": 8,
                                        "audio_feature_channels": 1},
                        trg_meta=dict(TEXT_META))
    rng = np.random.RandomState(1)
    inputs = {
        "src": jnp.asarray(rng.randn(2, 32, 8, 1), jnp.float32),
        "src_length": jnp.asarray([32, 20], jnp.int32),
        "trg_input": jnp.full([2], 2, jnp.int32)}
    h0, s0, init = _decode(model, inputs, False, chunk=8, unroll=2)
    h1, s1, _ = _decode(model, inputs, True, chunk=8, unroll=2)
    assert init["beam_cache_indirection_ok"] is True
    np.testing.assert_array_equal(h0, h1)
    np.testing.assert_allclose(s0, s1, rtol=2e-5, atol=2e-5)


def test_indirection_exact_gpt2_prefill():
    """GPT-2 prompt prefill shifts cache positions by decode_time_offset
    — the ancestor column updates must land at time + offset, and the
    prompt positions stay identity (beams share the prefill)."""
    args = {"model.class": "gpt2", "model.params": {
        "hidden_size": 32, "num_layers": 2, "num_attention_heads": 2,
        "filter_size": 64, "max_positions": 64, "dropout_rate": 0.0,
        "timing": "emb", "dtype": "float32"}}
    model = build_model(args, trg_meta={"vocab_size": 41, "eos_id": 1,
                                        "unk_id": 3})
    params = model.init_params(jax.random.PRNGKey(2))
    rng = np.random.RandomState(2)
    prompt = jnp.asarray(rng.randint(4, 41, size=(2, 5)), jnp.int32)
    outs = {}
    for ind in (False, True):
        s2l, init = model.prepare_generation(
            params, {"trg_input": prompt}, decode_padded_length=12)
        assert init["beam_cache_indirection_ok"] is True
        assert init["decode_time_offset"] == 4
        outs[ind] = sequence_beam_search(
            s2l, init, beam_size=3, top_k=1, maximum_decode_length=12,
            extra_decode_length=12, prefix_decode_chunk=4,
            decode_unroll=2, cache_indirection=ind)
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(outs[True][0]))
    np.testing.assert_allclose(np.asarray(outs[False][1]),
                               np.asarray(outs[True][1]),
                               rtol=2e-5, atol=2e-5)


def test_indirection_exact_ensemble():
    """The ensemble fans the shared ancestor matrix into each member's
    cache (different member weights force non-trivial beam churn)."""
    from neurst_tpu.models.ensemble_model import \
        EncoderDecoderEnsembleModel
    members = [_text_model(False), _text_model(True)]
    params = [m.init_params(jax.random.PRNGKey(i))
              for i, m in enumerate(members)]
    ens = EncoderDecoderEnsembleModel(members, params,
                                      weights=[0.7, 0.3])
    inputs = _text_inputs()
    outs = {}
    for ind in (False, True):
        s2l, init = ens.prepare_generation(None, inputs,
                                           decode_padded_length=16)
        assert init["beam_cache_indirection_ok"] is True
        outs[ind] = sequence_beam_search(
            s2l, init, beam_size=4, top_k=1, maximum_decode_length=16,
            extra_decode_length=16, prefix_decode_chunk=4,
            decode_unroll=2, cache_indirection=ind)
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(outs[True][0]))
    np.testing.assert_allclose(np.asarray(outs[False][1]),
                               np.asarray(outs[True][1]),
                               rtol=2e-5, atol=2e-5)


def test_lightconv_gates_indirection_off():
    """The LightConv decoder's ring-buffer cache cannot be read through
    an attention ancestor matrix: the capability flag must be False and
    the (requested) indirect decode must fall back to the reorder path
    with identical results."""
    from neurst_tpu.models.light_convolution_model import \
        LightConvolutionModel
    cfg = LightConvolutionModel.build_model_args_by_name("lightconv_toy")
    params_cfg = dict(cfg["model.params"])
    for k in list(params_cfg):
        if k.endswith("dropout_rate"):
            params_cfg[k] = 0.0
    model = build_model(dict(cfg, **{"model.params": params_cfg}),
                        src_meta=dict(TEXT_META),
                        trg_meta=dict(TEXT_META))
    inputs = _text_inputs()
    h0, s0, init = _decode(model, inputs, False)
    h1, s1, _ = _decode(model, inputs, True)
    assert init["beam_cache_indirection_ok"] is False
    np.testing.assert_array_equal(h0, h1)
    np.testing.assert_allclose(s0, s1, rtol=2e-5, atol=2e-5)


def test_resize_preserves_beam_anc():
    """Chunk-growing resize must carry the ancestor matrix (last-axis
    slice/pad) alongside the self leaves."""
    from neurst_tpu.layers import layer_utils
    cache = {
        "layers": {"layer_0": {
            "self": {"keys": jnp.zeros([4, 8, 2, 4]),
                     "values": jnp.zeros([4, 8, 2, 4])},
            "memory": {"keys": jnp.zeros([2, 5, 2, 4])}}},
        "beam_anc": jnp.arange(2 * 2 * 8, dtype=jnp.int32).reshape(
            2, 2, 8),
    }
    assert layer_utils.cache_is_prefix_chunkable(cache)
    small = layer_utils.resize_self_cache(cache, 4)
    assert small["layers"]["layer_0"]["self"]["keys"].shape == (4, 4, 2, 4)
    assert small["beam_anc"].shape == (2, 2, 4)
    np.testing.assert_array_equal(
        np.asarray(small["beam_anc"]),
        np.asarray(cache["beam_anc"])[:, :, :4])
    # memory untouched
    assert small["layers"]["layer_0"]["memory"]["keys"].shape == (2, 5, 2, 4)
    back = layer_utils.resize_self_cache(small, 8)
    assert back["beam_anc"].shape == (2, 2, 8)
    np.testing.assert_array_equal(np.asarray(back["beam_anc"])[:, :, 4:], 0)
