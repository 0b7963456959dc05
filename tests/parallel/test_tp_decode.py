"""Tensor-parallel decode: --decode_tensor_parallel shards the model's
parameters (heads/mlp/vocab logical axes) over a "model" mesh axis
during predict — serving models too large for one chip — and must
produce exactly the single-device hypotheses.  Beyond-reference: the
reference's predict is single-replica."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def test_tp_decode_matches_single_device():
    from neurst_tpu.exps.sequence_generator import SequenceGenerator
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.tasks.task import build_task

    os.chdir(REPO)
    task = build_task({
        "task.class": "translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
        }})
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=task.src_pipeline.meta,
                        trg_meta=task.trg_pipeline.meta)
    params = model.init_params(jax.random.PRNGKey(5))

    search_args = {
        "search_method.class": "beam_search",
        "search_method.params": {"beam_size": 2,
                                 "maximum_decode_length": 10,
                                 "extra_decode_length": 4},
    }
    eos = task.src_pipeline.meta["eos_id"]
    bos = task.trg_pipeline.meta["bos_id"]
    rng = np.random.RandomState(1)
    batch = {
        "src": np.concatenate(
            [rng.randint(4, 30, size=[8, 5]),
             np.full([8, 1], eos)], axis=1).astype(np.int32),
        "src_padding": np.zeros([8, 6], np.float32),
        "trg_input": np.full([8], bos, np.int32),
    }

    def decode(tp):
        exp = SequenceGenerator(
            dict(search_args,
                 decode_tensor_parallel=tp,
                 decode_data_parallel=None if tp else False),
            task=task, model=model)
        fn = exp.build_generation_fn(params)
        hyp, score = fn(dict(batch))
        return np.asarray(hyp), np.asarray(score)

    assert jax.device_count() == 8  # conftest virtual CPU mesh

    # spy: the params really shard over the "model" axis
    sharded_params = []
    from neurst_tpu.exps import sequence_generator as sg
    real = sg.SequenceGenerator._dp_placement

    def spy(self, params):
        mesh, placed = real(self, params)
        sharded_params.append((mesh, placed))
        return mesh, placed

    sg.SequenceGenerator._dp_placement = spy
    try:
        hyp_tp, score_tp = decode(2)
    finally:
        sg.SequenceGenerator._dp_placement = real
    hyp_1, score_1 = decode(0)
    np.testing.assert_array_equal(hyp_tp, hyp_1)
    np.testing.assert_allclose(score_tp, score_1, rtol=1e-5, atol=1e-5)

    mesh, placed = sharded_params[0]
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    import jax.tree_util as jtu
    specs = [x.sharding.spec for x in jtu.tree_leaves(placed)]
    assert any("model" in str(spec) for spec in specs), \
        "no parameter sharded over 'model'"
