"""Offline generator for the corpus-level decode-parity fixture.

Trains the REFERENCE NeurST (TF2, /root/reference) transformer on the
committed miniature corpus (tests/examples/, a token-reversal task)
until it actually learns the task, beam-decodes the dev set with the
reference's own search layer + data pipeline, and scores it with the
reference's BLEU metric.  Stored fixture:

  tests/fixtures/reference_goldens/corpus_tf_ckpt/   (TF checkpoint)
  tests/fixtures/reference_goldens/corpus_golden.json (hypos + BLEU + cfg)

The pytest side (tests/models/test_reference_corpus_decode.py) converts
the checkpoint with our ``neurst_transformer`` converter, re-encodes the
same dev set with OUR pipeline, beam-decodes with OUR search, and
asserts hypothesis-for-hypothesis equality plus BLEU equality — the
corpus-level form of the "BLEU within 0.1" north-star.

Run offline (fixtures are committed; tests never import TF/reference):

    TF_USE_LEGACY_KERAS=1 python tests/tools/make_reference_corpus_golden.py
"""

import copy
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "reference_goldens")
EXAMPLES = os.path.join(REPO, "tests", "examples")

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

from neurst.data.data_pipelines.text_data_pipeline import \
    TextDataPipeline  # noqa: E402
from neurst.layers.search import build_search_layer  # noqa: E402
from neurst.metrics.bleu import BLEU  # noqa: E402
from neurst.models import build_model  # noqa: E402
from neurst.utils.hparams_sets import get_hyper_parameters  # noqa: E402

SEARCH_PARAMS = {
    "beam_size": 4, "length_penalty": 0.6,
    "maximum_decode_length": 24, "extra_decode_length": 8,
    "minimum_decode_length": 1,
}

TRAIN_STEPS = 600
BATCH_SIZE = 64
LR = 2e-3
SEED = 7
DIM = 32

POST_NORM = False  # overridden by main() for the post-norm fixture
WIDE = False       # --wide: 240-dev-sentence 200-word corpus
                   # (tests/tools/gen_wide_corpus.py), d=64 model


def model_params():
    params = copy.deepcopy(
        get_hyper_parameters("transformer_toy")["model.params"])
    params.update({
        "modality.share_source_target_embedding": False,
        "modality.share_embedding_and_softmax_weights": True,
        "modality.dim": DIM,
        "modality.timing": "sinusoids",
    })
    for side in ("encoder", "decoder"):
        params[f"{side}.num_layers"] = 2
        params[f"{side}.hidden_size"] = DIM
        params[f"{side}.num_attention_heads"] = 4
        params[f"{side}.filter_size"] = 2 * DIM
        params[f"{side}.attention_dropout_rate"] = 0.0
        params[f"{side}.ffn_dropout_rate"] = 0.0
        params[f"{side}.layer_postprocess_dropout_rate"] = 0.0
        params[f"{side}.post_normalize"] = POST_NORM
    return params


def load_pairs(split):
    with open(os.path.join(EXAMPLES, f"{split}.src")) as f:
        src = [line.rstrip("\n") for line in f]
    with open(os.path.join(EXAMPLES, f"{split}.trg")) as f:
        trg = [line.rstrip("\n") for line in f]
    assert len(src) == len(trg)
    return src, trg


def make_batch(pipeline, src_lines, trg_lines, idx):
    eos, bos = pipeline.meta["eos_id"], pipeline.meta["bos_id"]
    src_ids = [pipeline.encode(src_lines[i], is_processed=True)
               for i in idx]
    trg_ids = [pipeline.encode(trg_lines[i], is_processed=True)
               for i in idx]
    sl = max(len(x) for x in src_ids)
    tl = max(len(x) for x in trg_ids)
    b = len(idx)
    src = np.full([b, sl], eos, np.int64)
    spad = np.ones([b, sl], np.float32)
    trg = np.full([b, tl], eos, np.int64)
    tpad = np.ones([b, tl], np.float32)
    tin = np.full([b, tl], eos, np.int64)
    for i, (s, t) in enumerate(zip(src_ids, trg_ids)):
        src[i, :len(s)] = s
        spad[i, :len(s)] = 0.0
        trg[i, :len(t)] = t
        tpad[i, :len(t)] = 0.0
        tin[i, 0] = bos
        tin[i, 1:len(t)] = t[:-1]
    return {"src": tf.constant(src),
            "src_padding": tf.constant(spad),
            "trg_input": tf.constant(tin),
            "trg": tf.constant(trg),
            "trg_padding": tf.constant(tpad)}


def main():
    tf.random.set_seed(SEED)
    np.random.seed(SEED)
    pipeline = TextDataPipeline(
        vocab_path=os.path.join(EXAMPLES, "vocab.txt"))
    params = model_params()
    model = build_model({"model.class": "transformer", "params": params},
                        src_meta=pipeline.meta, trg_meta=pipeline.meta)

    src_lines, trg_lines = load_pairs("train")
    # trigger variable creation
    _ = model(make_batch(pipeline, src_lines, trg_lines, [0, 1]),
              is_training=False)
    opt = tf.keras.optimizers.Adam(LR)

    @tf.function
    def step(batch):
        with tf.GradientTape() as tape:
            logits = model(batch, is_training=True)
            mask = 1.0 - batch["trg_padding"]
            ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
                labels=batch["trg"], logits=logits)
            loss = tf.reduce_sum(ce * mask) / tf.reduce_sum(mask)
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    rng = np.random.RandomState(SEED)
    n = len(src_lines)
    for i in range(TRAIN_STEPS):
        idx = rng.choice(n, size=BATCH_SIZE, replace=True)
        # bucket by rough length so padding stays modest
        idx = sorted(idx, key=lambda j: len(src_lines[j].split()))
        loss = step(make_batch(pipeline, src_lines, trg_lines, idx))
        if i % 50 == 0 or i == TRAIN_STEPS - 1:
            print(f"step {i}: loss {float(loss):.4f}")

    # ---- decode the dev set with the reference search layer ----
    search = build_search_layer({
        "search_method.class": "beam_search",
        "search_method.params": dict(SEARCH_PARAMS)})
    search.set_model(model)
    dev_src, dev_trg = load_pairs("dev")
    bos = pipeline.meta["bos_id"]
    hypos = []
    for start in range(0, len(dev_src), 8):
        chunk = dev_src[start:start + 8]
        ids = [pipeline.encode(s, is_processed=True) for s in chunk]
        sl = max(len(x) for x in ids)
        src = np.full([len(chunk), sl], pipeline.meta["eos_id"], np.int64)
        spad = np.ones([len(chunk), sl], np.float32)
        for i, s in enumerate(ids):
            src[i, :len(s)] = s
            spad[i, :len(s)] = 0.0
        out = search({"src": tf.constant(src),
                      "src_padding": tf.constant(spad),
                      "trg_input": tf.fill([len(chunk)], bos)})
        if isinstance(out, (tuple, list)):
            out = out[0]
        for row in np.asarray(out):
            hypos.append(pipeline.decode(row.tolist()))
    metric = BLEU()
    bleu = metric(hypos, dev_trg)
    print("reference dev decode BLEU:", bleu)
    for h in hypos[:5]:
        print("  hypo:", h)

    ckpt_dir = os.path.join(
        OUT_DIR, "corpus_tf_ckpt_wide" if WIDE
        else "corpus_tf_ckpt_postnorm" if POST_NORM
        else "corpus_tf_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt = tf.train.Checkpoint(
        **{x.name.split(":")[0]: x for x in model.weights})
    ckpt.write(os.path.join(ckpt_dir, f"ckpt-{TRAIN_STEPS}"))
    with open(os.path.join(ckpt_dir, "checkpoint"), "w") as fw:
        fw.write(f'model_checkpoint_path: "ckpt-{TRAIN_STEPS}"\n'
                 f'all_model_checkpoint_paths: "ckpt-{TRAIN_STEPS}"\n')

    golden = {
        "model_params": {k: v for k, v in params.items()
                         if isinstance(v, (int, float, bool, str,
                                           type(None)))},
        "search_params": SEARCH_PARAMS,
        "num_heads": 4,
        "bleu": {k: float(v) for k, v in bleu.items()}
        if isinstance(bleu, dict) else float(bleu),
        "hypotheses": hypos,
        "train_steps": TRAIN_STEPS,
    }
    tag = ("corpus_golden_wide" if WIDE
           else "corpus_golden_postnorm" if POST_NORM
           else "corpus_golden")
    with open(os.path.join(OUT_DIR, f"{tag}.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {ckpt_dir} and {tag}.json")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--post_norm", action="store_true")
    ap.add_argument("--wide", action="store_true",
                    help="240-dev-sentence 200-word corpus "
                         "(gen_wide_corpus.py), d=64 model, more steps")
    _args = ap.parse_args()
    POST_NORM = _args.post_norm
    WIDE = _args.wide
    if WIDE:
        EXAMPLES = os.path.join(EXAMPLES, "wide")
        DIM = 64
        TRAIN_STEPS = 1500
    main()
