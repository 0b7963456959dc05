"""Golden-numerics parity with the reference NeurST implementation.

Fixtures under tests/fixtures/reference_goldens/ were produced by
running the REFERENCE (TF) transformer with deterministically seeded
weights (tests/tools/make_reference_goldens.py).  Here we convert those
weights through the ``neurst_transformer`` converter and assert our JAX
transformer reproduces the reference logits and beam-search output ids
— the unit-level form of the "BLEU within 0.1" north-star (parity:
/root/reference/tests/neurst/models/transformer_test.py:23-120 which
pins the same architecture to stored numerics).
"""

import glob
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                           "reference_goldens")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR,
                                         "transformer_toy_*.npz")))


def _load(path):
    with np.load(path) as data:
        blob = {k: data[k] for k in data.files}
    meta = json.loads(bytes(blob.pop("__meta__")).decode())
    inputs = {k.split("/", 1)[1]: v for k, v in blob.items()
              if k.startswith("__input__/")}
    outputs = {k.split("/", 1)[1]: v for k, v in blob.items()
               if k.startswith("__output__/")}
    weights = {k: v for k, v in blob.items() if not k.startswith("__")}
    return meta, inputs, outputs, weights


def _build_our_model(meta):
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
        cfg[f"{prefix}.post_normalize"] = bool(meta["post_norm"])
    return build_model(
        {"model.class": "transformer", "model.params": cfg},
        src_meta=meta["src_meta"], trg_meta=meta["trg_meta"])


def _converted_params(model, weights, num_heads):
    from neurst_tpu.utils.checkpoints import unflatten_params
    from neurst_tpu.utils.converters.neurst_transformer import \
        map_reference_variables
    flat = map_reference_variables(weights, num_heads=num_heads)
    converted = unflatten_params(flat)
    # every parameter of our model must be covered by the conversion
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    init = model.init_params(jax.random.PRNGKey(0))
    our_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(init)[0]}
    assert ref_paths == our_paths, (
        f"missing={sorted(map(str, our_paths - ref_paths))} "
        f"extra={sorted(map(str, ref_paths - our_paths))}")
    for (path, ours), (_, theirs) in zip(
            jax.tree_util.tree_flatten_with_path(init)[0],
            jax.tree_util.tree_flatten_with_path(converted)[0]):
        assert ours.shape == np.asarray(theirs).shape, \
            f"{path}: {ours.shape} vs {np.asarray(theirs).shape}"
    return converted


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p) for p in FIXTURES])
def test_reference_golden_logits(path):
    meta, inputs, outputs, weights = _load(path)
    model = _build_our_model(meta)
    params = _converted_params(model, weights, meta["num_heads"])
    ours = np.asarray(model.call(params, {
        "src": inputs["src"].astype(np.int32),
        "src_padding": inputs["src_padding"],
        "trg_input": inputs["trg_input"],
    }, is_training=False), np.float32)
    ref = outputs["logits"]
    # non-padded positions must match the reference bit-tight (f32)
    nonpad = (1.0 - inputs["trg_padding"])[:, :, None]
    diff = float(np.max(np.abs((ours - ref) * nonpad)))
    assert diff < 5e-5, diff


def test_tf_checkpoint_conversion_matches_npz():
    """The converter's TF-checkpoint reading path (a real name-based
    checkpoint written like the reference's NameBasedCheckpointManager)
    must produce the same flat arrays as the npz path."""
    pytest.importorskip("tensorflow")
    from neurst_tpu.utils.converters.converter import build_converter
    ckpt_dir = os.path.join(FIXTURE_DIR, "tf_ckpt")
    npz = os.path.join(FIXTURE_DIR, "transformer_toy_prenorm.npz")
    if not os.path.isdir(ckpt_dir):
        pytest.skip("no TF checkpoint fixture")
    conv = build_converter({"converter.class": "neurst_transformer",
                            "converter.params": {"num_heads": 2}})
    from_ckpt = conv.convert_to_flat(ckpt_dir)
    meta, _, _, weights = _load(npz)
    from neurst_tpu.utils.converters.neurst_transformer import \
        map_reference_variables
    from_npz = map_reference_variables(weights, num_heads=2)
    assert set(from_ckpt) == set(from_npz)
    for k in from_npz:
        np.testing.assert_allclose(from_ckpt[k], from_npz[k], atol=1e-7,
                                   err_msg=k)


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p) for p in FIXTURES])
def test_reference_golden_beam_ids(path):
    meta, inputs, outputs, weights = _load(path)
    if "beam_top1_ids" not in outputs:
        pytest.skip("fixture lacks a beam golden")
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    model = _build_our_model(meta)
    params = _converted_params(model, weights, meta["num_heads"])
    gen_inputs = {
        "src": inputs["src"].astype(np.int32),
        "src_padding": inputs["src_padding"],
        "trg_input": np.full([inputs["src"].shape[0]],
                             meta["trg_meta"]["bos_id"], np.int32),
    }
    s2l, init = model.prepare_generation(params, gen_inputs,
                                         decode_padded_length=10)
    hypos, _ = sequence_beam_search(
        s2l, init, beam_size=4, top_k=1, length_penalty=0.6,
        maximum_decode_length=10, extra_decode_length=5,
        minimum_decode_length=5)
    ref_ids = outputs["beam_top1_ids"]
    ours = np.asarray(hypos)[:, :ref_ids.shape[1]]
    eos = meta["trg_meta"]["eos_id"]

    def _truncate(row):
        # the hypothesis ends at the first EOS; what follows is padding
        # (the reference pads with EOS, we pad with 0)
        out = []
        for t in row:
            out.append(int(t))
            if t == eos:
                break
        return out

    for ours_row, ref_row in zip(ours, ref_ids):
        assert _truncate(ours_row) == _truncate(ref_row), \
            (ours.tolist(), ref_ids.tolist())
