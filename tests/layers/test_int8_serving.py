"""int8 weight-only serving (quant_layers.Int8DenseGeneral +
int8ify_flat_params): dense kernels are STORED int8 (quarter the HBM
reads of f32-at-rest) with an absmax per-output-channel f32 scale
applied after the matmul.  Beyond-reference: the reference only
fake-quantizes inside TF graphs and never serves real int8 weights."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _model(dtype="float32"):
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


def _batch():
    return {
        "src": np.array([[3, 4, 5, 19, 0, 0], [6, 7, 8, 9, 10, 19]],
                        np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1], [0] * 6], np.float32),
        "trg_input": np.array([[19, 2, 3], [19, 4, 5]], np.int32),
    }


def test_int8_dense_equals_dequantized_matmul():
    """y == x @ (q * scale) + b exactly (f32 compute)."""
    from neurst_tpu.layers.quantization.quant_layers import Int8DenseGeneral
    rng = np.random.RandomState(0)
    x = rng.randn(3, 5).astype(np.float32)
    q = rng.randint(-127, 128, size=(5, 4)).astype(np.int8)
    scale = np.abs(rng.randn(4)).astype(np.float32) * 0.01
    bias = rng.randn(4).astype(np.float32)
    layer = Int8DenseGeneral(features=4, dtype=jnp.float32)
    params = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale),
              "bias": jnp.asarray(bias)}
    y = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    expect = x @ (q.astype(np.float32) * scale) + bias
    np.testing.assert_allclose(y, expect, rtol=0, atol=1e-5)


def test_int8ify_quantizes_within_half_step():
    from neurst_tpu.layers.quantization.quant_layers import \
        int8ify_flat_params
    rng = np.random.RandomState(1)
    w = rng.randn(6, 3).astype(np.float32)
    flat = {"m/kernel": w, "m/bias": np.zeros([3], np.float32)}
    tmpl = {"m/kernel_q": np.zeros([6, 3], np.int8),
            "m/kernel_scale": np.zeros([3], np.float32),
            "m/bias": np.zeros([3], np.float32)}
    out = int8ify_flat_params(flat, tmpl)
    assert "m/kernel" not in out
    assert out["m/kernel_q"].dtype == np.int8
    w_hat = out["m/kernel_q"].astype(np.float32) * out["m/kernel_scale"]
    step = out["m/kernel_scale"][None, :]
    assert np.all(np.abs(w_hat - w) <= step / 2 + 1e-7)
    np.testing.assert_array_equal(out["m/bias"], flat["m/bias"])


def test_int8_embedding_row_scale_roundtrip():
    """Embedding table [V, D] gets a per-vocab-ROW scale: the same
    scale dequantizes gathered rows and tied-softmax logit channels."""
    from neurst_tpu.layers.quantization.quant_layers import \
        int8ify_flat_params
    rng = np.random.RandomState(2)
    w = (rng.randn(10, 4) * np.linspace(0.1, 2.0, 10)[:, None]
         ).astype(np.float32)
    flat = {"emb/weights": w}
    tmpl = {"emb/weights_q": np.zeros([10, 4], np.int8),
            "emb/weights_scale": np.zeros([10], np.float32)}
    out = int8ify_flat_params(flat, tmpl)
    w_hat = (out["emb/weights_q"].astype(np.float32)
             * out["emb/weights_scale"][:, None])
    assert np.all(np.abs(w_hat - w) <= out["emb/weights_scale"][:, None]
                  / 2 + 1e-7)
    # rows with very different magnitudes keep their own precision
    assert out["emb/weights_scale"][0] < out["emb/weights_scale"][-1]


def test_int8_transformer_restores_and_decodes_close_to_f32():
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    plain = _model()
    params = plain.init_params(jax.random.PRNGKey(0))
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    logits = np.asarray(plain.call(params, _batch()))

    quant_layers.set_int8_serving(True)
    try:
        m8 = _model()
        tmpl = m8.init_params(jax.random.PRNGKey(1))
        tmpl_flat = flatten_params(tmpl)
        qnames = [n for n in tmpl_flat if n.endswith("kernel_q")]
        assert qnames, "int8 model has no int8 kernels"
        enames = [n for n in tmpl_flat if n.endswith("weights_q")]
        assert enames, "int8 model has no int8 embedding table"
        flat_q = quant_layers.int8ify_flat_params(flat, tmpl_flat)
        params_q, _, missing = restore_into(tmpl, flat_q)
        assert not missing, missing
        for n, v in flatten_params(params_q).items():
            if n.endswith("kernel_q"):
                assert jnp.asarray(v).dtype == jnp.int8, n
        logits_q = np.asarray(m8.call(params_q, _batch()))
        # weight-only int8: ~0.4% per-weight error; logits stay close
        assert np.max(np.abs(logits_q - logits)) < 0.2, \
            np.max(np.abs(logits_q - logits))

        # beam decode runs end-to-end through the int8 modules
        inputs = {k: v for k, v in _batch().items() if k != "trg_input"}
        inputs["trg_input"] = np.full([2], META["bos_id"], np.int32)
        s2l, init = m8.prepare_generation(
            params_q, inputs, decode_padded_length=12)
        hyp, score = sequence_beam_search(
            s2l, init, beam_size=2, top_k=1, maximum_decode_length=12,
            extra_decode_length=12, prefix_decode_chunk=4)
        assert np.asarray(hyp).shape == (2, 12)
        assert np.all(np.isfinite(np.asarray(score)))
    finally:
        quant_layers.set_int8_serving(False)


def test_full_int8_activation_path():
    """--int8_activations: dynamic per-token absmax activation scales,
    int8 x int8 -> int32 dot, one f32 dequant — matches the manual
    computation exactly, stays close to f32, and composes with a full
    transformer decode."""
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.layers.quantization.quant_layers import Int8DenseGeneral
    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 5).astype(np.float32)
    q = rng.randint(-127, 128, size=(5, 4)).astype(np.int8)
    scale = np.abs(rng.randn(4)).astype(np.float32) * 0.01
    layer = Int8DenseGeneral(features=4, use_bias=False,
                             dtype=jnp.float32)
    params = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale)}
    quant_layers.set_int8_serving(True, activations=True)
    try:
        y = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    finally:
        quant_layers.set_int8_serving(False)
    s_x = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-9) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127)
    expect = (x_q @ q.astype(np.float64)) * s_x * scale
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-6)
    # and close to the unquantized product (per-token int8 error bound)
    full = x @ (q.astype(np.float32) * scale)
    assert np.max(np.abs(y - full)) < 0.02 * np.abs(full).max() + 1e-3

    # whole-model: logits stay close to f32 under full int8
    plain = _model()
    params_f = plain.init_params(jax.random.PRNGKey(0))
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    flat = {k: np.asarray(v)
            for k, v in flatten_params(params_f).items()}
    logits_f = np.asarray(plain.call(params_f, _batch()))
    quant_layers.set_int8_serving(True, activations=True)
    try:
        m8 = _model()
        tmpl = m8.init_params(jax.random.PRNGKey(1))
        flat_q = quant_layers.int8ify_flat_params(
            flat, flatten_params(tmpl))
        params_q, _, missing = restore_into(tmpl, flat_q)
        assert not missing, missing
        logits_q = np.asarray(m8.call(params_q, _batch()))
    finally:
        quant_layers.set_int8_serving(False)
    assert np.max(np.abs(logits_q - logits_f)) < 0.35, \
        np.max(np.abs(logits_q - logits_f))


def test_restore_inference_params_int8ifies_for_every_entry():
    """The shared restore path (used by predict, evaluator, export,
    ensemble members and the speculative draft) must quantize the f32
    flat dict when int8 serving is on — restoring raw f32 into an int8
    template would silently keep the all-zero placeholder kernels."""
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.utils.checkpoints import flatten_params
    from neurst_tpu.utils.param_policy import restore_inference_params

    plain = _model()
    flat = {k: np.asarray(v) for k, v in flatten_params(
        plain.init_params(jax.random.PRNGKey(0))).items()}
    quant_layers.set_int8_serving(True)
    try:
        m8 = _model()
        tmpl = m8.init_params(jax.random.PRNGKey(1))
        params, missing = restore_inference_params(m8, tmpl, flat)
        assert not missing, missing
        qleaves = {n: v for n, v in flatten_params(params).items()
                   if n.endswith("kernel_q")}
        assert qleaves
        assert all(np.abs(np.asarray(v)).max() > 0
                   for v in qleaves.values()), "zero placeholder kernels"
    finally:
        quant_layers.set_int8_serving(False)


def test_qat_bits_drive_int8_grid():
    """A 4-bit QAT checkpoint serves on the 4-bit grid (step clip/7,
    levels [-8, 7]), not the hardcoded 8-bit one."""
    from neurst_tpu.layers.quantization import quant_layers
    rng = np.random.RandomState(5)
    w = (rng.randn(6, 4) * 0.3).astype(np.float32)
    flat = {"m/kernel": w,
            "m/kernel_clip_max": np.asarray(0.5, np.float32)}
    tmpl = {"m/kernel_q": np.zeros([6, 4], np.int8),
            "m/kernel_scale": np.zeros([4], np.float32)}
    quant_layers.set_int8_serving(True, qat_bits=4)
    try:
        out = quant_layers.int8ify_flat_params(flat, tmpl)
    finally:
        quant_layers.set_int8_serving(False)
    np.testing.assert_allclose(out["m/kernel_scale"], 0.5 / 7.0,
                               rtol=1e-6)
    assert out["m/kernel_q"].min() >= -8
    assert out["m/kernel_q"].max() <= 7


def test_int8_composes_with_scan_layers():
    """scan_layers stacks kernels [L, in, out] and scales [L, out]:
    the quantizer must keep the layer axis and reduce only the input
    axes (per-layer per-output-channel grid)."""
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    def scan_model():
        from neurst_tpu.models.model import build_model
        from neurst_tpu.models.transformer import Transformer
        cfg = dict(Transformer.build_model_args_by_name(
            "transformer_toy")["model.params"])
        cfg["dtype"] = "float32"
        cfg["decoder.scan_layers"] = True
        cfg["encoder.scan_layers"] = True
        for prefix in ("encoder", "decoder"):
            cfg[f"{prefix}.attention_dropout_rate"] = 0.0
            cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
            cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
        return build_model(
            {"model.class": "transformer", "model.params": cfg},
            src_meta=META, trg_meta=META)

    plain = scan_model()
    params_f = plain.init_params(jax.random.PRNGKey(0))
    flat = {k: np.asarray(v)
            for k, v in flatten_params(params_f).items()}
    logits_f = np.asarray(plain.call(params_f, _batch()))

    quant_layers.set_int8_serving(True)
    try:
        m8 = scan_model()
        tmpl = m8.init_params(jax.random.PRNGKey(1))
        tmpl_flat = flatten_params(tmpl)
        stacked = [n for n in tmpl_flat if "/layers/layer/" in n
                   and n.endswith("kernel_q")]
        assert stacked, "no stacked int8 kernels"
        flat_q = quant_layers.int8ify_flat_params(flat, tmpl_flat)
        # per-layer scales survive: stacked scale leads with L
        for n in stacked:
            sc = flat_q[n[:-2] + "_scale"]
            w = flat_q[n]
            assert sc.shape[0] == w.shape[0], (n, sc.shape, w.shape)
            assert not np.allclose(sc[0], sc[1])  # layers differ
        params_q, _, missing = restore_into(tmpl, flat_q)
        assert not missing, missing
        logits_q = np.asarray(m8.call(params_q, _batch()))
    finally:
        quant_layers.set_int8_serving(False)
    assert np.max(np.abs(logits_q - logits_f)) < 0.2, \
        np.max(np.abs(logits_q - logits_f))


def test_int8_requires_qat_modules_off():
    from neurst_tpu.layers.quantization import quant_layers
    quant_layers.global_init(True, quant_bits=8)
    try:
        with pytest.raises(ValueError):
            quant_layers.set_int8_serving(True)
    finally:
        quant_layers.global_init(False)
        quant_layers.set_int8_serving(False)


def test_int8_uses_learned_qat_clip_ranges():
    """A QAT checkpoint's kernel_clip_max drives the int8 scale: the
    dequantized weights land on the QAT fake-quant grid."""
    from neurst_tpu.layers.quantization.quant_layers import (
        fake_quant_minmax, int8ify_flat_params)
    rng = np.random.RandomState(3)
    w = (rng.randn(6, 4) * 0.7).astype(np.float32)
    cmax = 0.5  # tighter than absmax -> clipping occurs
    flat = {"m/kernel": w,
            "m/kernel_clip_max": np.asarray(cmax, np.float32)}
    tmpl = {"m/kernel_q": np.zeros([6, 4], np.int8),
            "m/kernel_scale": np.zeros([4], np.float32)}
    out = int8ify_flat_params(flat, tmpl)
    assert "m/kernel_clip_max" not in out
    np.testing.assert_allclose(out["m/kernel_scale"], cmax / 127.0,
                               rtol=1e-6)
    w_hat = out["m/kernel_q"].astype(np.float32) * out["m/kernel_scale"]
    expect = np.asarray(fake_quant_minmax(
        jnp.asarray(w), -cmax * 128.0 / 127.0, cmax, 8))
    np.testing.assert_allclose(w_hat, expect, rtol=0, atol=1e-6)
    assert out["m/kernel_q"].min() >= -128


def test_static_activation_scales_calibrate_and_serve():
    """static_activation_scales: calibration records each dense input's
    running absmax into the "calibration" collection; the written
    ``act_scale`` params replace the per-token absmax reduction, and
    the static full-int8 logits stay close to the dynamic full-int8
    logits on the calibration distribution."""
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    plain = _model()
    params_f = plain.init_params(jax.random.PRNGKey(0))
    flat = {k: np.asarray(v) for k, v in flatten_params(params_f).items()}
    batch = _batch()

    # dynamic full-int8 reference
    quant_layers.set_int8_serving(True, activations=True)
    try:
        m_dyn = _model()
        tmpl = m_dyn.init_params(jax.random.PRNGKey(1))
        flat_q = quant_layers.int8ify_flat_params(flat,
                                                  flatten_params(tmpl))
        params_dyn, _, missing = restore_into(tmpl, flat_q)
        assert not missing, missing
        logits_dyn = np.asarray(m_dyn.call(params_dyn, batch))
    finally:
        quant_layers.set_int8_serving(False)

    # static: calibrate on the same batch, then serve
    quant_layers.set_int8_serving(True, activations=True,
                                  static_activation_scales=True)
    try:
        m_st = _model()
        tmpl = m_st.init_params(jax.random.PRNGKey(1))
        tmpl_flat = flatten_params(tmpl)
        snames = [n for n in tmpl_flat if n.endswith("act_scale")]
        assert snames, "static mode declared no act_scale params"
        flat_q = quant_layers.int8ify_flat_params(flat, tmpl_flat)
        params_st, _, missing = restore_into(tmpl, flat_q)
        # act_scale is not in the checkpoint: calibration fills it
        assert all(n.endswith("act_scale") for n in missing), missing
        params_st = quant_layers.calibrate_int8_act_scales(
            m_st, params_st, [batch])
        written = [float(np.asarray(v)) for n, v in
                   flatten_params(params_st).items()
                   if n.endswith("act_scale")]
        assert any(abs(s - 1.0) > 1e-6 for s in written), written
        assert all(s > 0 for s in written)
        logits_st = np.asarray(m_st.call(params_st, batch))
    finally:
        quant_layers.set_int8_serving(False)

    # per-tensor static scales are coarser than per-token dynamic ones;
    # on the calibration batch they must stay close
    assert np.max(np.abs(logits_st - logits_dyn)) < 0.5, \
        np.max(np.abs(logits_st - logits_dyn))


def test_static_act_scales_require_full_int8():
    from neurst_tpu.layers.quantization import quant_layers
    quant_layers.set_int8_serving(True, activations=True,
                                  static_activation_scales=True)
    try:
        with pytest.raises(ValueError):
            # not in static mode anymore after turning serving off
            quant_layers.set_int8_serving(False)
            quant_layers.calibrate_int8_act_scales(None, {}, [])
    finally:
        quant_layers.set_int8_serving(False)
    # static without activations is ignored (weight-only has no
    # activation quantization to make static)
    quant_layers.set_int8_serving(True, activations=False,
                                  static_activation_scales=True)
    try:
        from neurst_tpu.layers.quantization.quant_layers import \
            _INT8_SERVING
        assert not _INT8_SERVING["static_act"]
    finally:
        quant_layers.set_int8_serving(False)


def test_qat_clips_become_static_activation_scales():
    """VERDICT r3 #7: a QAT checkpoint's learned FFN relu clip
    (dense1/output_clip_max) becomes dense2's static ``act_scale``
    (clip/127) with NO calibration pass, calibration leaves those
    QAT-derived scales alone, and serving with a clip that matches the
    activation range reproduces the calibrated-static serve exactly."""
    from neurst_tpu.layers.quantization import quant_layers
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    plain = _model()
    params_f = plain.init_params(jax.random.PRNGKey(0))
    flat = {k: np.asarray(v) for k, v in flatten_params(params_f).items()}
    batch = _batch()

    # 1. calibrated-static reference: observed absmax drives ALL scales
    quant_layers.set_int8_serving(True, activations=True,
                                  static_activation_scales=True)
    try:
        m_cal = _model()
        tmpl = m_cal.init_params(jax.random.PRNGKey(1))
        flat_q = quant_layers.int8ify_flat_params(flat,
                                                  flatten_params(tmpl))
        params_cal, _, _ = restore_into(tmpl, flat_q)
        params_cal = quant_layers.calibrate_int8_act_scales(
            m_cal, params_cal, [batch])
        cal_scales = {n: float(np.asarray(v)) for n, v in
                      flatten_params(params_cal).items()
                      if n.endswith("dense2/act_scale")}
        assert cal_scales
        logits_cal = np.asarray(m_cal.call(params_cal, batch))
    finally:
        quant_layers.set_int8_serving(False)

    # 2. a "QAT checkpoint" whose learned FFN clips equal the true
    # activation range (what QAT training converges to): clip = 127 *
    # calibrated scale for that dense
    flat_qat = dict(flat)
    for n, s in cal_scales.items():
        clip_name = n.replace("dense2/act_scale",
                              "dense1/output_clip_max")
        flat_qat[clip_name] = np.asarray(127.0 * s, np.float32)

    quant_layers.set_int8_serving(True, activations=True,
                                  static_activation_scales=True)
    try:
        m_st = _model()
        tmpl = m_st.init_params(jax.random.PRNGKey(1))
        flat_q = quant_layers.int8ify_flat_params(flat_qat,
                                                  flatten_params(tmpl))
        derived = {n: v for n, v in flat_q.items()
                   if n.endswith("dense2/act_scale")}
        assert set(derived) == set(cal_scales)
        for n, v in derived.items():
            np.testing.assert_allclose(float(v), cal_scales[n], rtol=1e-6)
            assert n[:-len("/act_scale")] in \
                quant_layers._INT8_SERVING["qat_act_paths"]
        params_st, _, _ = restore_into(tmpl, flat_q)
        # the remaining act_scales (qkv, output proj) calibrate; the
        # QAT-derived ones must survive calibration untouched even
        # though this batch's observed absmax differs from the clip
        params_st = quant_layers.calibrate_int8_act_scales(
            m_st, params_st, [batch])
        for n, v in flatten_params(params_st).items():
            if n.endswith("dense2/act_scale"):
                np.testing.assert_allclose(
                    float(np.asarray(v)), cal_scales[n], rtol=1e-6,
                    err_msg=f"calibration overwrote QAT scale {n}")
        logits_st = np.asarray(m_st.call(params_st, batch))
    finally:
        quant_layers.set_int8_serving(False)

    # same scales everywhere -> identical serve
    np.testing.assert_allclose(logits_st, logits_cal, rtol=0, atol=1e-5)
