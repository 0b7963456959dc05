"""Offline generator for reference-numerics golden fixtures.

Runs the REFERENCE NeurST (TF2, at /root/reference) transformer with
deterministically seeded weights on fixed inputs, and stores weights +
inputs + outputs as .npz fixtures under tests/fixtures/reference_goldens/.
The pytest suite (tests/models/test_reference_goldens.py) then loads the
fixtures, converts the weights through our ``neurst_transformer``
converter, and asserts our JAX model reproduces the reference numerics —
the cheapest evidence toward "BLEU within 0.1" parity (BASELINE.json).

Run offline (the fixtures are committed; tests never import TF/reference):

    TF_USE_LEGACY_KERAS=1 python tests/tools/make_reference_goldens.py

Requires /root/reference and tensorflow+tf_keras; the reference predates
Keras 3, hence the legacy-keras env var and the small import shims below.
"""

import copy
import hashlib
import json
import os
import sys
import types

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "reference_goldens")

assert os.environ.get("TF_USE_LEGACY_KERAS") == "1", \
    "run with TF_USE_LEGACY_KERAS=1 (the reference needs Keras 2)"
sys.path.insert(0, "/root/reference")

import tensorflow as tf  # noqa: E402

# the reference imports TF internals that moved since it was written
_shim = types.ModuleType(
    "tensorflow.python.distribute.distribution_strategy_context")
_shim.get_strategy = tf.distribute.get_strategy
_shim.has_strategy = tf.distribute.has_strategy
_shim.in_cross_replica_context = tf.distribute.in_cross_replica_context
sys.modules[
    "tensorflow.python.distribute.distribution_strategy_context"] = _shim

from neurst.models import build_model  # noqa: E402
from neurst.utils.hparams_sets import get_hyper_parameters  # noqa: E402

SRC_META = dict(vocab_size=8, eos_id=7, bos_id=6, unk_id=5)
TRG_META = dict(vocab_size=5, eos_id=4, bos_id=3, unk_id=2)

INPUTS = {
    "src": np.array([[0, 1, 1, 7], [1, 7, 7, 7]], np.int64),
    "src_padding": np.array([[0, 0, 0, 0.], [0, 0, 1, 1.]], np.float32),
    "trg_input": np.array([[3, 0, 1], [3, 2, 4]], np.int32),
    "trg": np.array([[0, 1, 4], [2, 4, 4]], np.int32),
    "trg_padding": np.array([[0, 0, 0.], [0, 0, 1.]], np.float32),
}


def seeded_value(name: str, shape) -> np.ndarray:
    """Deterministic pseudo-random weights keyed by the variable name
    (stable across runs/processes; independent of creation order)."""
    key = hashlib.sha256(name.split(":")[0].encode()).digest()
    rng = np.random.RandomState(np.frombuffer(key[:4], np.uint32)[0])
    return (rng.uniform(-0.5, 0.5, size=shape)).astype(np.float32)


def make_fixture(post_norm: bool):
    params = copy.deepcopy(
        get_hyper_parameters("transformer_toy")["model.params"])
    params["modality.source.dim"] = None
    params["modality.target.dim"] = None
    params["modality.source.timing"] = None
    params["modality.target.timing"] = None
    params["encoder.attention_dropout_rate"] = 0.0
    params["encoder.ffn_dropout_rate"] = 0.0
    params["encoder.layer_postprocess_dropout_rate"] = 0.0
    params["decoder.attention_dropout_rate"] = 0.0
    params["decoder.ffn_dropout_rate"] = 0.0
    params["decoder.layer_postprocess_dropout_rate"] = 0.0
    params["encoder.post_normalize"] = post_norm
    params["decoder.post_normalize"] = post_norm

    model = build_model({"model.class": "transformer", "params": params},
                        src_meta=SRC_META, trg_meta=TRG_META)
    parsed = {k: tf.convert_to_tensor(v) for k, v in INPUTS.items()}
    _ = model(parsed, is_training=False)

    weights = {}
    for w in model.trainable_weights:
        value = seeded_value(w.name, w.shape.as_list())
        tf.compat.v1.assign(w, value)
        weights[w.name.split(":")[0]] = value

    logits = model(parsed, is_training=False).numpy().astype(np.float32)

    data = dict(weights)
    for k, v in INPUTS.items():
        data[f"__input__/{k}"] = v
    data["__output__/logits"] = logits
    data["__meta__"] = np.frombuffer(json.dumps({
        "post_norm": post_norm,
        "src_meta": SRC_META, "trg_meta": TRG_META,
        "num_heads": int(params["encoder.num_attention_heads"]),
        "hparams": {k: v for k, v in params.items()
                    if isinstance(v, (int, float, bool, str, type(None)))},
    }).encode(), np.uint8)

    # beam-search golden: greedy/beam output ids from the reference's
    # static search layer, for end-to-end decode parity
    try:
        from neurst.layers.search import build_search_layer
        search = build_search_layer({
            "search_method.class": "beam_search",
            "search_method.params": {
                "beam_size": 4, "length_penalty": 0.6,
                "maximum_decode_length": 10, "extra_decode_length": 5,
                "minimum_decode_length": 5}})
        search.set_model(model)
        hypos = search({"src": parsed["src"],
                        "src_padding": parsed["src_padding"],
                        "trg_input": tf.fill([2], TRG_META["bos_id"])})
        if isinstance(hypos, (tuple, list)):
            hypos = hypos[0]
        data["__output__/beam_top1_ids"] = \
            np.asarray(hypos).astype(np.int64)
    except Exception as e:  # pragma: no cover
        print(f"beam golden skipped: {e}")

    name = "transformer_toy_postnorm" if post_norm \
        else "transformer_toy_prenorm"
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path}: logits[0,0,:3]={logits[0, 0, :3]}")

    if not post_norm:
        # also save a real name-based TF checkpoint exactly as the
        # reference's NameBasedCheckpointManager does
        # (/root/reference/neurst/utils/checkpoints.py:148-183), to
        # exercise the converter's TF-checkpoint reading path
        ckpt_dir = os.path.join(OUT_DIR, "tf_ckpt")
        ckpt = tf.train.Checkpoint(
            **{x.name.split(":")[0]: x for x in model.weights})
        ckpt.write(os.path.join(ckpt_dir, "ckpt-100"))
        with open(os.path.join(ckpt_dir, "checkpoint"), "w") as fw:
            fw.write('model_checkpoint_path: "ckpt-100"\n'
                     'all_model_checkpoint_paths: "ckpt-100"\n')
        print(f"wrote {ckpt_dir}")


if __name__ == "__main__":
    for pn in (False, True):
        make_fixture(pn)
