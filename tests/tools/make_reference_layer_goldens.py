"""Offline generator for LAYER-level reference goldens.

Mirrors the reference's layer test strategy
(/root/reference/tests/neurst/layers/attentions/multi_head_attention_test.py,
.../encoders/transformer_encoder_test.py): instantiate the reference
(TF) layer tiny, assign seeded weights, store inputs + weights +
outputs.  The pytest side rebuilds OUR flax layers with the converted
weights and asserts equal outputs — finer-grained than the model-level
goldens, so a regression localizes to a layer.

Run offline (fixtures are committed):

    TF_USE_LEGACY_KERAS=1 python tests/tools/make_reference_layer_goldens.py
"""

import hashlib
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(REPO, "tests", "fixtures", "reference_goldens",
                   "layer_goldens.npz")

assert os.environ.get("TF_USE_LEGACY_KERAS") == "1", \
    "run with TF_USE_LEGACY_KERAS=1 (the reference needs Keras 2)"
sys.path.insert(0, "/root/reference")

import tensorflow as tf  # noqa: E402

_shim = types.ModuleType(
    "tensorflow.python.distribute.distribution_strategy_context")
_shim.get_strategy = tf.distribute.get_strategy
_shim.has_strategy = tf.distribute.has_strategy
_shim.in_cross_replica_context = tf.distribute.in_cross_replica_context
sys.modules[
    "tensorflow.python.distribute.distribution_strategy_context"] = _shim

from neurst.layers.attentions.multi_head_attention import (  # noqa: E402
    MultiHeadAttention, MultiHeadSelfAttention)
from neurst.layers.encoders.transformer_encoder import \
    TransformerEncoder  # noqa: E402
from neurst.layers import layer_utils  # noqa: E402


def seeded(name, shape):
    key = hashlib.sha256(name.split(":")[0].encode()).digest()
    rng = np.random.RandomState(np.frombuffer(key[:4], np.uint32)[0])
    return rng.uniform(-0.5, 0.5, size=shape).astype(np.float32)


def assign_seeded(layer):
    weights = {}
    for w in layer.trainable_weights:
        value = seeded(w.name, w.shape.as_list())
        tf.compat.v1.assign(w, value)
        weights[w.name.split(":")[0]] = value
    return weights


def main():
    rng = np.random.RandomState(11)
    data = {}
    meta = {"num_heads": 2, "num_units": 8}

    # ---- self attention (with padding bias) ----
    x = rng.randn(2, 5, 8).astype(np.float32)
    padding = np.array([[0, 0, 0, 1, 1], [0, 0, 0, 0, 0]], np.float32)
    bias = layer_utils.input_padding_to_bias(padding)
    self_att = MultiHeadSelfAttention(
        num_heads=2, num_units=8, attention_dropout_rate=0.0,
        name="self_att")
    _ = self_att(tf.convert_to_tensor(x),
                 bias=tf.convert_to_tensor(bias), is_training=False)
    w = assign_seeded(self_att)
    out = self_att(tf.convert_to_tensor(x),
                   bias=tf.convert_to_tensor(bias), is_training=False)
    for k, v in w.items():
        data[f"self/{k.split('/', 1)[1]}"] = v
    data["self/__in__/x"] = x
    data["self/__in__/padding"] = padding
    data["self/__out__"] = np.asarray(out, np.float32)

    # ---- cross attention ----
    q = rng.randn(2, 3, 8).astype(np.float32)
    mem = rng.randn(2, 5, 8).astype(np.float32)
    cross = MultiHeadAttention(
        num_heads=2, num_units=8, attention_dropout_rate=0.0,
        name="cross_att")
    _ = cross(tf.convert_to_tensor(q), tf.convert_to_tensor(mem),
              memory_bias=tf.convert_to_tensor(bias), is_training=False)
    w = assign_seeded(cross)
    out = cross(tf.convert_to_tensor(q), tf.convert_to_tensor(mem),
                memory_bias=tf.convert_to_tensor(bias), is_training=False)
    for k, v in w.items():
        data[f"cross/{k.split('/', 1)[1]}"] = v
    data["cross/__in__/q"] = q
    data["cross/__in__/mem"] = mem
    data["cross/__in__/padding"] = padding
    data["cross/__out__"] = np.asarray(out, np.float32)

    # ---- full encoder stack, pre- and post-norm ----
    xe = rng.randn(2, 6, 8).astype(np.float32)
    pe = np.array([[0, 0, 0, 0, 1, 1], [0, 0, 0, 0, 0, 0]], np.float32)
    for post in (False, True):
        tag = "enc_post" if post else "enc_pre"
        enc = TransformerEncoder(
            num_layers=2, hidden_size=8, num_attention_heads=2,
            filter_size=10, attention_dropout_rate=0.0,
            ffn_dropout_rate=0.0, layer_postprocess_dropout_rate=0.0,
            post_normalize=post, name=f"encoder_{tag}")
        _ = enc(tf.convert_to_tensor(xe), tf.convert_to_tensor(pe),
                is_training=False)
        w = assign_seeded(enc)
        out = enc(tf.convert_to_tensor(xe), tf.convert_to_tensor(pe),
                  is_training=False)
        for k, v in w.items():
            # strip the unique keras outer scope -> TransformerEncoder/...
            data[f"{tag}/TransformerEncoder/{k.split('/', 1)[1]}"] = v
        data[f"{tag}/__in__/x"] = xe
        data[f"{tag}/__in__/padding"] = pe
        data[f"{tag}/__out__"] = np.asarray(out, np.float32)

    data["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({len(data)} arrays)")


if __name__ == "__main__":
    main()
