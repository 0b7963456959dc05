"""SpeechTransformer golden parity: the reference's audio conv
subsampling front-end + encoder/decoder must reproduce in our flax
model through the converter (fixture from
tests/tools/make_reference_speech_golden.py).
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "reference_goldens", "speech_transformer_toy.npz")


def test_speech_transformer_golden_logits():
    if not os.path.exists(FIXTURE):
        pytest.skip("speech golden not generated")
    with np.load(FIXTURE) as d:
        blob = {k: d[k] for k in d.files}
    meta = json.loads(bytes(blob.pop("__meta__")).decode())
    inputs = {k.split("/", 1)[1]: v for k, v in blob.items()
              if k.startswith("__input__/")}
    ref_logits = blob.pop("__output__/logits")
    weights = {k: v for k, v in blob.items() if not k.startswith("__")}

    from neurst_tpu.models.model import build_model
    from neurst_tpu.utils.checkpoints import unflatten_params
    from neurst_tpu.utils.converters.neurst_transformer import \
        map_reference_variables

    cfg = dict(meta["model_params"])
    cfg["dtype"] = "float32"
    model = build_model(
        {"model.class": "speech_transformer", "model.params": cfg},
        src_meta=meta["src_meta"], trg_meta=meta["trg_meta"])
    flat = map_reference_variables(
        weights, num_heads=cfg["encoder.num_attention_heads"])
    converted = unflatten_params(flat)

    init = model.init_params(jax.random.PRNGKey(0))
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    our_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(init)[0]}
    assert ref_paths == our_paths, (
        f"missing={sorted(map(str, our_paths - ref_paths))} "
        f"extra={sorted(map(str, ref_paths - our_paths))}")

    ours = np.asarray(model.call(converted, {
        "src": inputs["src"].astype(np.float32),
        "src_length": inputs["src_length"].astype(np.int32),
        "trg_input": inputs["trg_input"].astype(np.int32),
    }, is_training=False), np.float32)
    diff = float(np.max(np.abs(ours - ref_logits)))
    assert diff < 5e-5, diff
