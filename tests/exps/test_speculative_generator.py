"""Speculative decoding through the predict entry: SequenceGenerator
with --search_method speculative_decode loads the draft model from its
own model_dir (model_configs.yml + checkpoint) and the output equals
the plain greedy decode (sampling top_k=1) of the target."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def _task():
    from neurst_tpu.tasks.task import build_task
    return build_task({
        "task.class": "translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
        }})


def _build(task, layers, seed):
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg.update({"dtype": "float32",
                "encoder.num_layers": layers,
                "decoder.num_layers": layers})
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=task.src_pipeline.meta,
                        trg_meta=task.trg_pipeline.meta)
    return model, model.init_params(jax.random.PRNGKey(seed))


def test_generator_speculative_matches_greedy(tmp_path):
    from neurst_tpu.exps.sequence_generator import SequenceGenerator
    from neurst_tpu.utils import checkpoints as ckpt_lib
    from neurst_tpu.utils.configurable import ModelConfigs

    os.chdir(REPO)
    task = _task()
    target, params_t = _build(task, layers=2, seed=1)
    draft, params_d = _build(task, layers=1, seed=9)

    draft_dir = str(tmp_path / "draft")
    ckpt_lib.save_checkpoint(draft_dir, 1, params_d)
    ModelConfigs.dump(task.model_configs(draft), draft_dir)

    eos = task.src_pipeline.meta["eos_id"]
    bos = task.trg_pipeline.meta["bos_id"]
    rng = np.random.RandomState(4)
    batch = {
        "src": np.concatenate(
            [rng.randint(4, 30, size=[4, 5]),
             np.full([4, 1], eos)], axis=1).astype(np.int32),
        "src_padding": np.zeros([4, 6], np.float32),
        "trg_input": np.full([4], bos, np.int32),
    }

    spec_exp = SequenceGenerator(
        {"search_method.class": "speculative_decode",
         "search_method.params": {"draft_model_dir": draft_dir,
                                  "speculative_k": 3,
                                  "maximum_decode_length": 12,
                                  "extra_decode_length": 8},
         "decode_data_parallel": False},
        task=task, model=target)
    hyp_spec, _ = spec_exp.build_generation_fn(params_t)(dict(batch))

    greedy_exp = SequenceGenerator(
        {"search_method.class": "top_sampling",
         "search_method.params": {"top_k": 1,
                                  "maximum_decode_length": 12,
                                  "extra_decode_length": 8},
         "decode_data_parallel": False},
        task=task, model=target)
    hyp_ref, _ = greedy_exp.build_generation_fn(params_t)(dict(batch))

    def canon(ids):
        out = []
        for row in np.asarray(ids):
            row = list(row)
            cut = row.index(eos) + 1 if eos in row else len(row)
            out.append(tuple(row[:cut]))
        return out

    assert canon(hyp_spec) == canon(hyp_ref)

    # data-parallel speculative decode: the per-row cache writes and
    # per-row times partition over the 8-device mesh unchanged
    assert jax.device_count() == 8
    batch8 = {
        "src": np.concatenate([batch["src"]] * 2, axis=0),
        "src_padding": np.concatenate([batch["src_padding"]] * 2, axis=0),
        "trg_input": np.concatenate([batch["trg_input"]] * 2, axis=0),
    }
    spec_dp = SequenceGenerator(
        {"search_method.class": "speculative_decode",
         "search_method.params": {"draft_model_dir": draft_dir,
                                  "speculative_k": 3,
                                  "maximum_decode_length": 12,
                                  "extra_decode_length": 8}},
        task=task, model=target)
    hyp_dp, _ = spec_dp.build_generation_fn(params_t)(dict(batch8))
    assert canon(hyp_dp)[:4] == canon(hyp_spec)
    assert canon(hyp_dp)[4:] == canon(hyp_spec)
