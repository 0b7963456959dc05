"""Offline generator for the SpeechTransformer golden fixture.

Extends the transformer goldens with the speech front-end: the
reference's AudioConv2dSubsamplingLayer (2x Conv2D stride-2 + LN +
ReLU + dense) feeding the encoder.  Pins our conv-subsampling numerics
(and the converter's audio-modality name mapping) to the reference.

Run offline:

    TF_USE_LEGACY_KERAS=1 python tests/tools/make_reference_speech_golden.py
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
                   "speech_transformer_toy.npz")

assert os.environ.get("TF_USE_LEGACY_KERAS") == "1", \
    "run with TF_USE_LEGACY_KERAS=1"
sys.path.insert(0, "/root/reference")

import tensorflow as tf  # noqa: E402

_shim = types.ModuleType(
    "tensorflow.python.distribute.distribution_strategy_context")
_shim.get_strategy = tf.distribute.get_strategy
_shim.has_strategy = tf.distribute.has_strategy
_shim.in_cross_replica_context = tf.distribute.in_cross_replica_context
sys.modules[
    "tensorflow.python.distribute.distribution_strategy_context"] = _shim

from neurst.models import build_model  # noqa: E402
from neurst.models.speech_transformer import SpeechTransformer  # noqa: E402

SRC_META = {"audio_feature_dim": 16, "audio_feature_channels": 1}
TRG_META = dict(vocab_size=12, eos_id=11, bos_id=10, unk_id=9)


def seeded(name, shape):
    key = hashlib.sha256(name.split(":")[0].encode()).digest()
    rng = np.random.RandomState(np.frombuffer(key[:4], np.uint32)[0])
    return rng.uniform(-0.5, 0.5, size=shape).astype(np.float32)


def main():
    args = SpeechTransformer.build_model_args_by_name(
        "speech_transformer_toy")
    params = dict(args["model.params"])
    for side in ("encoder", "decoder"):
        params[f"{side}.attention_dropout_rate"] = 0.0
        params[f"{side}.ffn_dropout_rate"] = 0.0
        params[f"{side}.layer_postprocess_dropout_rate"] = 0.0

    model = build_model({"model.class": "speech_transformer",
                         "params": params},
                        src_meta=SRC_META, trg_meta=TRG_META)
    rng = np.random.RandomState(3)
    inputs = {
        "src": tf.convert_to_tensor(
            rng.randn(2, 12, 16, 1).astype(np.float32)),
        "src_length": tf.convert_to_tensor([12, 8], tf.int64),
        "trg_input": tf.convert_to_tensor([[10, 0, 1], [10, 2, 11]],
                                          tf.int64),
    }
    _ = model(inputs, is_training=False)
    weights = {}
    for w in model.trainable_weights:
        value = seeded(w.name, w.shape.as_list())
        tf.compat.v1.assign(w, value)
        weights[w.name.split(":")[0]] = value
    logits = model(inputs, is_training=False).numpy().astype(np.float32)

    data = dict(weights)
    data["__input__/src"] = np.asarray(inputs["src"])
    data["__input__/src_length"] = np.asarray([12, 8], np.int64)
    data["__input__/trg_input"] = np.asarray(inputs["trg_input"])
    data["__output__/logits"] = logits
    data["__meta__"] = np.frombuffer(json.dumps({
        "src_meta": SRC_META, "trg_meta": TRG_META,
        "model_params": {k: v for k, v in params.items()
                         if isinstance(v, (int, float, bool, str,
                                           type(None)))},
    }).encode(), np.uint8)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}")
    for name in sorted(weights)[:40]:
        print(" ", name, weights[name].shape)


if __name__ == "__main__":
    main()
