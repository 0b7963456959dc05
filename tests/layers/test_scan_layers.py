"""scan-over-layers encoder: numerics identical to the per-layer loop,
and per-layer checkpoints load into the stacked layout (and back)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 20, "eos_id": 19, "bos_id": 19, "unk_id": 18}


def _model(scan):
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    cfg["encoder.scan_layers"] = scan
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


def _batch():
    return {
        "src": np.array([[3, 4, 5, 19, 0, 0], [6, 7, 8, 9, 10, 19]],
                        np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1], [0] * 6], np.float32),
        "trg_input": np.array([[19, 2, 3], [19, 4, 5]], np.int32),
    }


def test_scan_encoder_matches_loop_encoder():
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    loop = _model(False)
    scan = _model(True)
    params_loop = loop.init_params(jax.random.PRNGKey(0))
    params_scan = scan.init_params(jax.random.PRNGKey(1))

    # per-layer flat names restore into the stacked layout
    flat_loop = flatten_params(params_loop)
    params_scan2, restored, missing = restore_into(params_scan, flat_loop)
    assert not missing, missing
    stacked_names = [n for n in flatten_params(params_scan)
                     if "/layers/layer/" in n]
    assert stacked_names, "scan model has no stacked params"

    out_loop = np.asarray(loop.call(params_loop, _batch()))
    out_scan = np.asarray(scan.call(params_scan2, _batch()))
    np.testing.assert_allclose(out_scan, out_loop, rtol=0, atol=1e-5)

    # and the stacked layout restores back into the per-layer layout
    flat_scan = flatten_params(params_scan2)
    params_loop2, _, missing2 = restore_into(params_loop, flat_scan)
    assert not missing2, missing2
    out_loop2 = np.asarray(loop.call(params_loop2, _batch()))
    np.testing.assert_allclose(out_loop2, out_loop, rtol=0, atol=1e-6)


def test_scan_encoder_grads_match_loop():
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    loop = _model(False)
    scan = _model(True)
    params_loop = loop.init_params(jax.random.PRNGKey(0))
    params_scan, _, _ = restore_into(scan.init_params(jax.random.PRNGKey(1)),
                                     flatten_params(params_loop))
    batch = dict(_batch())
    batch["trg"] = np.array([[2, 3, 19], [4, 5, 19]], np.int32)
    batch["trg_padding"] = np.zeros([2, 3], np.float32)
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})

    def loss(model, p):
        logits = model.call(p, batch, is_training=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
        return criterion.reduce_loss(batch, logits)

    l1 = float(loss(loop, params_loop))
    l2 = float(loss(scan, params_scan))
    assert abs(l1 - l2) < 1e-5
    g_loop = flatten_params(jax.grad(lambda p: loss(loop, p))(params_loop))
    g_scan = flatten_params(jax.grad(lambda p: loss(scan, p))(params_scan))
    # compare the scan model's stacked grads against stacked loop grads
    for name, g in g_scan.items():
        if "/layers/layer/" in name:
            base, rest = name.split("/layers/layer/")
            ref = np.stack([np.asarray(g_loop[f"{base}/layer_{i}/{rest}"])
                            for i in range(np.asarray(g).shape[0])], 0)
        else:
            ref = np.asarray(g_loop[name])
        np.testing.assert_allclose(np.asarray(g), ref, rtol=0, atol=2e-5,
                                   err_msg=name)


def test_scan_layers_on_speech_transformer():
    """encoder.scan_layers composes with the audio conv front-end
    (SpeechTransformer): forward equals the loop encoder after the
    per-layer -> stacked param bridge."""
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.speech_transformer import SpeechTransformer
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    cfg = SpeechTransformer.build_model_args_by_name("speech_transformer_toy")
    if cfg is not None:
        pc = dict(cfg["model.params"])
        pc["dtype"] = "float32"   # bf16 reduction order differs loop/scan
        for k in list(pc):
            if k.endswith("dropout_rate"):
                pc[k] = 0.0
        cfg = dict(cfg, **{"model.params": pc})
    if cfg is None:
        base = SpeechTransformer.build_model_args_by_name(
            "speech_transformer_s")
        params_cfg = dict(base["model.params"])
        for k in list(params_cfg):
            if k.endswith("num_layers"):
                params_cfg[k] = 2
            if k.endswith("hidden_size") or k == "modality.dim":
                params_cfg[k] = 16
            if k.endswith("filter_size"):
                params_cfg[k] = 32
            if k.endswith("num_attention_heads"):
                params_cfg[k] = 2
            if k.endswith("dropout_rate"):
                params_cfg[k] = 0.0
        params_cfg["dtype"] = "float32"
        cfg = dict(base, **{"model.params": params_cfg})
    trg_meta = {"vocab_size": 20, "eos_id": 1, "bos_id": 2, "unk_id": 3,
                "pad_id": 1, "language": "fr"}
    src_meta = {"audio_feature_dim": 8, "audio_feature_channels": 1}

    def make(scan):
        pc = dict(cfg["model.params"])
        pc["encoder.scan_layers"] = scan
        return build_model(dict(cfg, **{"model.params": pc}),
                           src_meta=src_meta, trg_meta=trg_meta)

    loop = make(False)
    scan = make(True)
    params_loop = loop.init_params(jax.random.PRNGKey(0))
    params_scan, _, missing = restore_into(
        scan.init_params(jax.random.PRNGKey(1)),
        flatten_params(params_loop))
    assert not missing, missing
    rng = np.random.RandomState(0)
    batch = {
        "src": rng.randn(2, 37, 8, 1).astype(np.float32),
        "src_length": np.asarray([37, 20], np.int32),
        "trg_input": np.array([[2, 4, 5], [2, 6, 7]], np.int32),
    }
    out_loop = np.asarray(loop.call(params_loop, batch))
    out_scan = np.asarray(scan.call(params_scan, batch))
    np.testing.assert_allclose(out_scan, out_loop, rtol=0, atol=1e-5)
