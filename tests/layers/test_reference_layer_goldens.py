"""Layer-level golden parity with the reference (TF) implementation.

Fixtures from tests/tools/make_reference_layer_goldens.py.  The
converted reference weights must reproduce the reference outputs in OUR
flax layers — self attention, cross attention, and the full encoder in
both pre- and post-norm modes (parity: the reference's own layer golden
suite, tests/neurst/layers/...).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "reference_goldens", "layer_goldens.npz")

N_HEADS = 2
UNITS = 8


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(FIXTURE):
        pytest.skip("layer goldens not generated")
    with np.load(FIXTURE) as d:
        return {k: d[k] for k in d.files}


def _bias_from_padding(padding):
    from neurst_tpu.layers.layer_utils import input_padding_to_bias
    return np.asarray(input_padding_to_bias(jnp.asarray(padding)))


def _split_heads(kernel, n_proj):
    """Reference fused kernel [d, n_proj*d'] -> ours [d, n_proj, N, H]."""
    d_in = kernel.shape[0]
    return kernel.reshape(d_in, n_proj, N_HEADS, -1)


def _split_heads_bias(bias, n_proj):
    return bias.reshape(n_proj, N_HEADS, -1)


def test_self_attention_golden(goldens):
    from neurst_tpu.layers.attentions.multi_head_attention import \
        MultiHeadSelfAttention
    layer = MultiHeadSelfAttention(
        num_heads=N_HEADS, num_units=UNITS, dtype=jnp.float32)
    params = {
        "qkv_transform": {
            "kernel": _split_heads(goldens["self/qkv_transform/kernel"], 3),
            "bias": _split_heads_bias(goldens["self/qkv_transform/bias"], 3),
        },
        "output_transform": {
            "kernel": goldens["self/output_transform/kernel"]
            .reshape(N_HEADS, -1, UNITS),
            "bias": goldens["self/output_transform/bias"],
        },
    }
    x = goldens["self/__in__/x"]
    bias = _bias_from_padding(goldens["self/__in__/padding"])
    out, _ = layer.apply({"params": params}, jnp.asarray(x),
                         bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), goldens["self/__out__"],
                               atol=2e-5)


def test_cross_attention_golden(goldens):
    from neurst_tpu.layers.attentions.multi_head_attention import \
        MultiHeadAttention
    layer = MultiHeadAttention(
        num_heads=N_HEADS, num_units=UNITS, dtype=jnp.float32)
    params = {
        "q_transform": {
            "kernel": _split_heads(goldens["cross/q_transform/kernel"], 1),
            "bias": _split_heads_bias(goldens["cross/q_transform/bias"], 1),
        },
        "kv_transform": {
            "kernel": _split_heads(goldens["cross/kv_transform/kernel"], 2),
            "bias": _split_heads_bias(goldens["cross/kv_transform/bias"], 2),
        },
        "output_transform": {
            "kernel": goldens["cross/output_transform/kernel"]
            .reshape(N_HEADS, -1, UNITS),
            "bias": goldens["cross/output_transform/bias"],
        },
    }
    q = goldens["cross/__in__/q"]
    mem = goldens["cross/__in__/mem"]
    bias = _bias_from_padding(goldens["cross/__in__/padding"])
    out, _ = layer.apply({"params": params}, jnp.asarray(q),
                         memory=jnp.asarray(mem), bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), goldens["cross/__out__"],
                               atol=2e-5)


@pytest.mark.parametrize("tag,post", [("enc_pre", False),
                                      ("enc_post", True)])
def test_encoder_stack_golden(goldens, tag, post):
    from neurst_tpu.layers.encoders.transformer_encoder import \
        TransformerEncoder
    from neurst_tpu.utils.checkpoints import unflatten_params
    from neurst_tpu.utils.converters.neurst_transformer import \
        map_reference_variables
    weights = {k[len(tag) + 1:]: v for k, v in goldens.items()
               if k.startswith(tag + "/TransformerEncoder/")}
    flat = map_reference_variables(weights, num_heads=N_HEADS)
    # the mapper emits model-scoped paths ("encoder/..."); strip that
    enc_params = unflatten_params(
        {k[len("encoder/"):]: v for k, v in flat.items()
         if k.startswith("encoder/")})
    enc = TransformerEncoder(
        num_layers=2, hidden_size=UNITS, num_attention_heads=N_HEADS,
        filter_size=10, post_normalize=post, dtype=jnp.float32)
    x = goldens[f"{tag}/__in__/x"]
    padding = goldens[f"{tag}/__in__/padding"]
    out = enc.apply({"params": enc_params}, jnp.asarray(x),
                    jnp.asarray(padding))
    np.testing.assert_allclose(np.asarray(out), goldens[f"{tag}/__out__"],
                               atol=2e-5)
