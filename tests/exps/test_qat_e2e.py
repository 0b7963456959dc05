"""QAT end-to-end: train with --enable_quant, decode from the model_dir
(quant state persists via model_configs.yml), and export — the
reference's quantization recipe surface
(/root/reference/examples/quantization/README.md: train -> quantized
inference from the same model_dir with no extra flags).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TRAIN_YML = "tests/examples/example_train_seq2seq.yml"
QUANT_PARAMS = ("{quant_strategy: min/max, quant_bits: 8, "
                "quant_weight_clip_max: 1.0, quant_act_clip_max: 16.0}")


@pytest.mark.slow
def test_qat_train_decode_export_roundtrip(tmp_path):
    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.layers.quantization.quant_layers import (
        get_global_config, global_init, quant_enabled)

    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train", "--config_paths", TRAIN_YML,
              "--model_dir", model_dir,
              "--train_steps", "15", "--save_checkpoint_steps", "15",
              "--summary_steps", "15",
              "--enable_quant", "--quant_params", QUANT_PARAMS])

    # 1. learned clip-max variables exist in the checkpoint and moved
    ckpt = np.load(os.path.join(model_dir, "ckpt-15.npz"))
    clip_vars = [k for k in ckpt.files if "clip_max" in k]
    assert clip_vars, ckpt.files
    moved = [k for k in clip_vars
             if abs(float(np.asarray(ckpt[k])) - 1.0) > 1e-6
             and abs(float(np.asarray(ckpt[k])) - 16.0) > 1e-6]
    assert moved, ("no clip var moved from its init", clip_vars)

    # 2. quant config persisted into model_configs.yml
    cfg_text = open(os.path.join(model_dir, "model_configs.yml")).read()
    assert "enable_quant" in cfg_text

    # 3. predict from the model_dir with NO quant flags: the persisted
    #    config must re-enable quantization for the decode build
    global_init(False)
    assert not quant_enabled()
    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset.class", "parallel_text",
         "--dataset.params", "{src_file: tests/examples/dev.src, "
                             "trg_file: tests/examples/dev.trg}",
         "--search_method.params",
         "{beam_size: 2, maximum_decode_length: 12}"])
    assert quant_enabled(), get_global_config()
    assert get_global_config()["quant_bits"] == 8
    hypos = result["hypotheses"]
    assert len(hypos) == 24

    # 4. export the QAT model; the artifact directory carries the
    #    quantized-decode config so serving rebuilds identically
    export_path = str(tmp_path / "export")
    cli_main(["--entry", "export", "--model_dir", model_dir,
              "--entry.params",
              "{export_path: %s, export_batch_size: 2, "
              "export_src_length: 8}" % export_path,
              "--search_method.params",
              "{beam_size: 2, maximum_decode_length: 8, "
              "extra_decode_length: 4}"])
    assert os.path.exists(os.path.join(export_path, "model_configs.yml"))
    exported_cfg = open(os.path.join(export_path,
                                     "model_configs.yml")).read()
    assert "enable_quant" in exported_cfg
    assert os.path.exists(os.path.join(export_path,
                                       "generation.jaxexport.bin"))

    # 5. decoding with quantization forced OFF must change behavior
    #    relative to the quantized decode path at the logits level:
    #    compare greedy logits of the restored model quant-on vs off.
    from neurst_tpu.models.model import build_model
    from neurst_tpu.utils import checkpoints as ckpt_lib
    from neurst_tpu.utils.configurable import ModelConfigs
    cfgs = ModelConfigs.load(model_dir)
    batch = {
        "src": np.array([[5, 6, 7, 3, 0, 0]], np.int32),
        "src_padding": np.array([[0, 0, 0, 0, 1, 1]], np.float32),
        "trg_input": np.array([[3, 5, 6]], np.int32),
    }
    vocab = int(np.asarray(
        ckpt["shared_symbol_modality/weights"]).shape[0])
    meta = {"vocab_size": vocab, "eos_id": 3, "bos_id": 3, "unk_id": 2}

    def logits_with(quant_on):
        global_init(quant_on, quant_bits=8, quant_weight_clip_max=1.0,
                    quant_act_clip_max=16.0)
        model = build_model(
            {"model.class": cfgs["model.class"],
             "model.params": cfgs.get("model.params")},
            src_meta=meta, trg_meta=meta)
        params = model.init_params(jax.random.PRNGKey(0))
        flat = ckpt_lib.restore_checkpoint_params(
            ckpt_lib.latest_checkpoint(model_dir))
        params, _, _ = ckpt_lib.restore_into(params, flat)
        out = model.call(params, batch, is_training=False)
        global_init(False)
        return np.asarray(out)

    quant_logits = logits_with(True)
    dense_logits = logits_with(False)
    assert float(np.max(np.abs(quant_logits - dense_logits))) > 1e-6


@pytest.mark.slow
def test_qat_checkpoint_drives_static_int8_serving(tmp_path):
    """The round-4 feature's actual claim, end-to-end: train with QAT,
    then serve the SAME model_dir full-int8 with STATIC activation
    scales — the learned FFN relu clips (dense1/output_clip_max) drive
    dense2's static act_scale with no calibration (int8ify_flat_params),
    the unbounded dense inputs self-calibrate at predict time, and the
    static-scale decode stays consistent with the dynamic-scale decode.
    Ref: /root/reference/examples/quantization/README.md (the reference
    trains these clips but only ever fake-quantizes in-graph)."""
    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.layers.quantization.quant_layers import _INT8_SERVING

    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train", "--config_paths", TRAIN_YML,
              "--model_dir", model_dir,
              "--train_steps", "15", "--save_checkpoint_steps", "15",
              "--summary_steps", "15",
              "--enable_quant", "--quant_params", QUANT_PARAMS])

    predict_argv = [
        "--entry", "predict", "--model_dir", model_dir,
        "--dataset.class", "parallel_text",
        "--dataset.params", "{src_file: tests/examples/dev.src, "
                            "trg_file: tests/examples/dev.trg}",
        "--search_method.params",
        "{beam_size: 2, maximum_decode_length: 12}",
        "--int8_serving", "--int8_activations"]

    try:
        dyn = cli_main(list(predict_argv))
        dyn_hypos = dyn["hypotheses"]

        static = cli_main(predict_argv + ["--int8_static_activations"])
        static_hypos = static["hypotheses"]
        # the learned QAT clips must have been consumed as static
        # scales (not calibrated away): int8ify records those paths
        qat_paths = _INT8_SERVING.get("qat_act_paths")
        assert qat_paths, "no act_scale came from a learned QAT clip"
        assert all(p.endswith("dense2") for p in qat_paths), qat_paths
    finally:
        from neurst_tpu.layers.quantization.quant_layers import \
            set_int8_serving
        set_int8_serving(False)

    assert len(static_hypos) == len(dyn_hypos) == 24
    agree = sum(a == b for a, b in zip(static_hypos, dyn_hypos))
    # per-tensor static scales are coarser than per-token dynamic ones;
    # on a 15-step model the decodes must still largely agree
    assert agree >= len(dyn_hypos) * 0.8, (
        f"static int8 decode diverged from dynamic: {agree}/24 match")
