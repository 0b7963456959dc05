"""Offline generator for the SPEECH corpus-level decode-parity fixture.

Trains the reference SpeechTransformer (TF2, /root/reference) to
memorize a tiny synthetic corpus (fixed pseudo-fbank utterances ->
short token sequences), beam-decodes the same utterances with the
reference's search (exercising its post-conv src_length recompute,
speech_transformer.py:179-190), and stores checkpoint + inputs + hypo
ids.  The pytest side converts the checkpoint and must reproduce the
decode exactly through OUR conv front-end + length recompute + beam.

Run offline:

    TF_USE_LEGACY_KERAS=1 python tests/tools/make_reference_speech_corpus_golden.py
"""

import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "reference_goldens")

assert os.environ.get("TF_USE_LEGACY_KERAS") == "1"
sys.path.insert(0, "/root/reference")

import tensorflow as tf  # noqa: E402

_shim = types.ModuleType(
    "tensorflow.python.distribute.distribution_strategy_context")
_shim.get_strategy = tf.distribute.get_strategy
_shim.has_strategy = tf.distribute.has_strategy
_shim.in_cross_replica_context = tf.distribute.in_cross_replica_context
sys.modules[
    "tensorflow.python.distribute.distribution_strategy_context"] = _shim

from neurst.layers.search import build_search_layer  # noqa: E402
from neurst.models import build_model  # noqa: E402
from neurst.models.speech_transformer import SpeechTransformer  # noqa: E402

SRC_META = {"audio_feature_dim": 16, "audio_feature_channels": 1}
TRG_META = dict(vocab_size=20, eos_id=19, bos_id=18, unk_id=17)
N_UTTS = 16
FRAMES = (9, 12, 16, 20)  # mixed lengths exercise the length recompute
SEARCH_PARAMS = {"beam_size": 4, "length_penalty": 0.6,
                 "maximum_decode_length": 10, "extra_decode_length": 4,
                 "minimum_decode_length": 1}
STEPS = 400
SEED = 13
WIDE = False  # --wide: 64 utterances, frames 9..40, 800 steps


def make_corpus():
    rng = np.random.RandomState(SEED)
    feats, lengths, targets = [], [], []
    max_f = max(FRAMES)
    for i in range(N_UTTS):
        f = FRAMES[i % len(FRAMES)]
        x = np.zeros([max_f, 16, 1], np.float32)
        x[:f] = rng.randn(f, 16, 1).astype(np.float32)
        feats.append(x)
        lengths.append(f)
        t = rng.randint(0, 17, size=rng.randint(2, 5)).tolist() \
            + [TRG_META["eos_id"]]
        targets.append(t)
    return np.stack(feats), np.asarray(lengths, np.int64), targets


def main():
    tf.random.set_seed(SEED)
    args = SpeechTransformer.build_model_args_by_name(
        "speech_transformer_toy")
    params = dict(args["model.params"])
    params["modality.dim"] = 32
    for side in ("encoder", "decoder"):
        params[f"{side}.num_layers"] = 2
        params[f"{side}.hidden_size"] = 32
        params[f"{side}.num_attention_heads"] = 4
        params[f"{side}.filter_size"] = 64
        params[f"{side}.attention_dropout_rate"] = 0.0
        params[f"{side}.ffn_dropout_rate"] = 0.0
        params[f"{side}.layer_postprocess_dropout_rate"] = 0.0
    model = build_model({"model.class": "speech_transformer",
                         "params": params},
                        src_meta=SRC_META, trg_meta=TRG_META)

    feats, lengths, targets = make_corpus()
    tl = max(len(t) for t in targets)
    trg = np.full([N_UTTS, tl], TRG_META["eos_id"], np.int64)
    tpad = np.ones([N_UTTS, tl], np.float32)
    tin = np.full([N_UTTS, tl], TRG_META["eos_id"], np.int64)
    for i, t in enumerate(targets):
        trg[i, :len(t)] = t
        tpad[i, :len(t)] = 0.0
        tin[i, 0] = TRG_META["bos_id"]
        tin[i, 1:len(t)] = t[:-1]
    batch = {"src": tf.constant(feats),
             "src_length": tf.constant(lengths),
             "trg_input": tf.constant(tin),
             "trg": tf.constant(trg),
             "trg_padding": tf.constant(tpad)}
    _ = model(batch, is_training=False)
    opt = tf.keras.optimizers.Adam(2e-3)

    @tf.function
    def step():
        with tf.GradientTape() as tape:
            logits = model(batch, is_training=True)
            mask = 1.0 - batch["trg_padding"]
            ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
                labels=batch["trg"], logits=logits)
            loss = tf.reduce_sum(ce * mask) / tf.reduce_sum(mask)
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    for i in range(STEPS):
        loss = step()
        if i % 50 == 0 or i == STEPS - 1:
            print(f"step {i}: loss {float(loss):.4f}")

    search = build_search_layer({
        "search_method.class": "beam_search",
        "search_method.params": dict(SEARCH_PARAMS)})
    search.set_model(model)
    out = search({"src": tf.constant(feats),
                  "src_length": tf.constant(lengths),
                  "trg_input": tf.fill([N_UTTS], TRG_META["bos_id"])})
    if isinstance(out, (tuple, list)):
        out = out[0]
    hypo_ids = np.asarray(out).astype(np.int64)
    exact = sum(1 for i in range(N_UTTS)
                if hypo_ids[i, 1:1 + len(targets[i])].tolist()
                == targets[i])
    print(f"memorized {exact}/{N_UTTS} utterances")

    ckpt_dir = os.path.join(
        OUT_DIR, "speech_corpus_tf_ckpt_wide" if WIDE
        else "speech_corpus_tf_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt = tf.train.Checkpoint(
        **{x.name.split(":")[0]: x for x in model.weights})
    ckpt.write(os.path.join(ckpt_dir, f"ckpt-{STEPS}"))
    with open(os.path.join(ckpt_dir, "checkpoint"), "w") as fw:
        fw.write(f'model_checkpoint_path: "ckpt-{STEPS}"\n')

    tag = ("speech_corpus_golden_wide" if WIDE
           else "speech_corpus_golden")
    np.savez_compressed(
        os.path.join(OUT_DIR, f"{tag}.npz"),
        feats=feats, lengths=lengths, hypo_ids=hypo_ids,
        __meta__=np.frombuffer(json.dumps({
            "src_meta": SRC_META, "trg_meta": TRG_META,
            "search_params": SEARCH_PARAMS, "num_heads": 4,
            "model_params": {k: v for k, v in params.items()
                             if isinstance(v, (int, float, bool, str,
                                               type(None)))},
        }).encode(), np.uint8))
    print(f"wrote {ckpt_dir} and {tag}.npz")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--wide", action="store_true",
                    help="64 mixed-length utterances (frames 9..40), "
                         "800 memorization steps")
    if ap.parse_args().wide:
        WIDE = True
        N_UTTS = 64
        FRAMES = (9, 12, 16, 20, 24, 28, 32, 40)
        STEPS = 800
    main()
