"""bf16-at-rest inference params (utils/param_policy): the cast hoists
the use-site f32->bf16 conversion into storage, so decode outputs are
BITWISE identical for the transformer families while weight HBM reads
halve.  LayerNorm scale/bias and QAT clip scalars are consumed in f32
and must keep f32 storage; f32-compute models and QAT are no-ops."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _model(dtype):
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


def test_cast_selects_leaves_and_keeps_f32_consumers():
    from neurst_tpu.utils.checkpoints import flatten_params
    from neurst_tpu.utils.param_policy import cast_params_for_inference
    model = _model("bfloat16")
    params = model.init_params(jax.random.PRNGKey(0))
    cast = cast_params_for_inference(params, "bfloat16")
    flat = flatten_params(cast)
    kernels = {n: v for n, v in flat.items() if n.endswith("kernel")}
    assert kernels and all(v.dtype == jnp.bfloat16 for v in kernels.values())
    ln_scales = {n: v for n, v in flat.items() if n.endswith("/scale")}
    assert ln_scales
    for n, v in ln_scales.items():
        assert v.dtype == jnp.float32, n
        base = n.rsplit("/", 1)[0]
        assert flat[base + "/bias"].dtype == jnp.float32, base

    # f32-compute model: no-op
    same = cast_params_for_inference(params, "float32")
    assert all(v.dtype == jnp.float32
               for v in flatten_params(same).values())


def test_bf16_at_rest_decode_is_bitwise_identical():
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.utils.param_policy import cast_params_for_inference
    model = _model("bfloat16")
    params = model.init_params(jax.random.PRNGKey(1))
    inputs = {
        "src": np.array([[3, 4, 5, 19, 0, 0], [6, 7, 8, 9, 10, 19]],
                        np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1], [0] * 6], np.float32),
        "trg_input": np.full([2], META["bos_id"], np.int32),
    }

    def decode(p):
        s2l, init = model.prepare_generation(
            p, inputs, decode_padded_length=12)
        return sequence_beam_search(s2l, init, beam_size=3, top_k=1,
                                    maximum_decode_length=12,
                                    extra_decode_length=12)

    hyp_f32, score_f32 = decode(params)
    hyp_bf16, score_bf16 = decode(
        cast_params_for_inference(params, "bfloat16"))
    np.testing.assert_array_equal(np.asarray(hyp_bf16), np.asarray(hyp_f32))
    np.testing.assert_array_equal(np.asarray(score_bf16),
                                  np.asarray(score_f32))


def test_qat_params_stay_f32():
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.utils.checkpoints import flatten_params
    from neurst_tpu.utils.param_policy import cast_params_for_inference
    quant_layers.global_init(True, quant_bits=8)
    try:
        model = _model("bfloat16")
        params = model.init_params(jax.random.PRNGKey(2))
        cast = cast_params_for_inference(params, "bfloat16")
        flat = flatten_params(cast)
        assert any(n.endswith("_clip_max") for n in flat)
        assert all(v.dtype == jnp.float32 for v in flat.values())
    finally:
        quant_layers.global_init(False)
