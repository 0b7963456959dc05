"""The serving levers compose: int8 weight-only params + tensor-
parallel placement + chunked prefix decode + data-parallel batches,
all at once, must reproduce the plain single-device f32 decode of the
same (quantized) weights."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _build(dtype="float32"):
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = dtype
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


def test_int8_tp_chunked_decode_composes():
    from neurst_tpu.exps.sequence_generator import SequenceGenerator
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    os.chdir(REPO)
    assert jax.device_count() == 8

    plain = _build()
    params_f32 = plain.init_params(jax.random.PRNGKey(0))
    flat = {k: np.asarray(v)
            for k, v in flatten_params(params_f32).items()}

    rng = np.random.RandomState(2)
    batch = {
        "src": np.concatenate(
            [rng.randint(4, 18, size=[8, 5]),
             np.full([8, 1], META["eos_id"])], axis=1).astype(np.int32),
        "src_padding": np.zeros([8, 6], np.float32),
        "trg_input": np.full([8], META["bos_id"], np.int32),
    }

    quant_layers.set_int8_serving(True)
    try:
        model = _build()
        tmpl = model.init_params(jax.random.PRNGKey(1))
        flat_q = quant_layers.int8ify_flat_params(
            flat, flatten_params(tmpl))
        params_q, _, missing = restore_into(tmpl, flat_q)
        assert not missing, missing

        def decode(tp, chunk):
            exp = SequenceGenerator(
                {"search_method.class": "beam_search",
                 "search_method.params": {
                     "beam_size": 2, "maximum_decode_length": 12,
                     "extra_decode_length": 8,
                     "prefix_decode_chunk": chunk},
                 "decode_tensor_parallel": tp,
                 "decode_data_parallel": None if tp else False},
                task=None, model=model)
            hyp, score = exp.build_generation_fn(params_q)(dict(batch))
            return np.asarray(hyp), np.asarray(score)

        hyp_stack, score_stack = decode(tp=2, chunk=4)   # dp4 x tp2
        hyp_base, score_base = decode(tp=0, chunk=0)     # single, plain
    finally:
        quant_layers.set_int8_serving(False)

    np.testing.assert_array_equal(hyp_stack, hyp_base)
    np.testing.assert_allclose(score_stack, score_base,
                               rtol=1e-5, atol=1e-5)
