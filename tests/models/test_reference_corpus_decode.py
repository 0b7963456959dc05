"""Corpus-level decode parity with a TRAINED reference checkpoint.

The fixture (tests/tools/make_reference_corpus_golden.py) trained the
reference NeurST TF transformer on the committed miniature corpus and
beam-decoded the dev set with the reference's own pipeline + search.
Here the same checkpoint is converted through our ``neurst_transformer``
converter and the same dev set is decoded with OUR pipeline + beam
search; hypotheses must match string-for-string and our BLEU must match
the reference's — the corpus-level form of the "BLEU within 0.1"
north-star (BASELINE.json).
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures", "reference_goldens")
# (golden json, ckpt dir, corpus dir relative to repo).  "wide" is the
# statistically meaningful fixture: 240 mixed-length dev sentences over
# a 200-word vocab (tests/tools/gen_wide_corpus.py), d=64 model.
VARIANTS = {
    "prenorm": ("corpus_golden.json", "corpus_tf_ckpt",
                "tests/examples"),
    "postnorm": ("corpus_golden_postnorm.json", "corpus_tf_ckpt_postnorm",
                 "tests/examples"),
    "wide": ("corpus_golden_wide.json", "corpus_tf_ckpt_wide",
             "tests/examples/wide"),
}


@pytest.fixture(scope="module", params=sorted(VARIANTS),
                ids=sorted(VARIANTS))
def variant(request):
    golden_name, ckpt_name, corpus_dir = VARIANTS[request.param]
    golden_path = os.path.join(FIXTURE_DIR, golden_name)
    ckpt_path = os.path.join(FIXTURE_DIR, ckpt_name)
    if not os.path.exists(golden_path) or not os.path.isdir(ckpt_path):
        pytest.skip(f"{request.param} corpus fixture not generated")
    return golden_path, ckpt_path, os.path.join(REPO, corpus_dir)


@pytest.fixture(scope="module")
def golden(variant):
    with open(variant[0]) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ckpt_dir(variant):
    return variant[1]


@pytest.fixture(scope="module")
def task_and_model(golden, variant):
    from neurst_tpu.tasks.task import build_task
    os.chdir(REPO)
    vocab = os.path.join(variant[2], "vocab.txt")
    task = build_task({
        "task.class": "translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {"vocab_path": vocab},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {"vocab_path": vocab},
        }})
    params = dict(golden["model_params"])
    params["dtype"] = "float32"
    model = task.build_model({"model.class": "transformer",
                              "model.params": params})
    return task, model


def _converted_params(model, golden, ckpt_dir):
    pytest.importorskip("tensorflow")
    from neurst_tpu.utils.checkpoints import unflatten_params
    from neurst_tpu.utils.converters.converter import build_converter
    conv = build_converter({"converter.class": "neurst_transformer",
                            "converter.params": {
                                "num_heads": golden["num_heads"]}})
    flat = conv.convert_to_flat(ckpt_dir)
    converted = unflatten_params(flat)
    init = model.init_params(jax.random.PRNGKey(0))
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    our_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(init)[0]}
    assert ref_paths == our_paths, (
        f"missing={sorted(map(str, our_paths - ref_paths))} "
        f"extra={sorted(map(str, ref_paths - our_paths))}")
    return converted


def test_converted_checkpoint_reproduces_reference_decode(
        golden, task_and_model, ckpt_dir, variant):
    task, model = task_and_model
    params = _converted_params(model, golden, ckpt_dir)
    pipeline = task._src_data_pipeline
    eos = pipeline.meta["eos_id"]
    bos = task._trg_data_pipeline.meta["bos_id"]

    from neurst_tpu.layers.search.sequence_search import build_search_layer
    search = build_search_layer({
        "search_method.class": "beam_search",
        "search_method.params": dict(golden["search_params"])})
    search.set_model(model)

    with open(os.path.join(variant[2], "dev.src")) as f:
        dev_src = [line.rstrip("\n") for line in f]
    with open(os.path.join(variant[2], "dev.trg")) as f:
        dev_trg = [line.rstrip("\n") for line in f]

    hypos = []
    for start in range(0, len(dev_src), 8):
        chunk = dev_src[start:start + 8]
        ids = [pipeline.encode(s, is_processed=True) for s in chunk]
        sl = max(len(x) for x in ids)
        src = np.full([len(chunk), sl], eos, np.int32)
        spad = np.ones([len(chunk), sl], np.float32)
        for i, s in enumerate(ids):
            src[i, :len(s)] = s
            spad[i, :len(s)] = 0.0
        out = search(params, {
            "src": src, "src_padding": spad,
            "trg_input": np.full([len(chunk)], bos, np.int32)})
        if isinstance(out, (tuple, list)):
            out = out[0]
        for row in np.asarray(out):
            hypos.append(task._trg_data_pipeline.decode(row.tolist()))

    assert hypos == golden["hypotheses"], (
        "\n".join(f"ours={o!r} ref={r!r}"
                  for o, r in zip(hypos, golden["hypotheses"])
                  if o != r))

    # BLEU parity: our metric on our hypos vs the reference's score
    from neurst_tpu.metrics.metric import build_metric
    metric = build_metric({"metric.class": "bleu", "metric.params": {}})
    ours = metric(hypos, dev_trg)
    our_bleu = ours.get("BLEU", ours.get("tok_bleu"))
    ref_bleu = golden["bleu"]["tok_bleu"]
    assert abs(float(our_bleu) - float(ref_bleu)) < 0.1, \
        (our_bleu, ref_bleu)
