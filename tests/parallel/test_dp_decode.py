"""Data-parallel decode: predict's sharded beam search over the
8-device mesh must produce exactly the single-device hypotheses
(scale-out inference — the reference's predict is single-replica)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def test_dp_decode_matches_single_device(tmp_path):
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
    params = model.init_params(jax.random.PRNGKey(3))

    search_args = {
        "search_method.class": "beam_search",
        "search_method.params": {"beam_size": 2,
                                 "maximum_decode_length": 10,
                                 "extra_decode_length": 4},
    }
    eos = task.src_pipeline.meta["eos_id"]
    bos = task.trg_pipeline.meta["bos_id"]
    rng = np.random.RandomState(0)
    batch = {
        "src": np.concatenate(
            [rng.randint(4, 30, size=[8, 5]),
             np.full([8, 1], eos)], axis=1).astype(np.int32),
        "src_padding": np.zeros([8, 6], np.float32),
        "trg_input": np.full([8], bos, np.int32),
    }

    def decode(dp):
        exp = SequenceGenerator(
            dict(search_args, decode_data_parallel=dp),
            task=task, model=model)
        fn = exp.build_generation_fn(params)
        hyp, score = fn(dict(batch))
        return np.asarray(hyp), np.asarray(score)

    assert jax.device_count() == 8  # conftest virtual CPU mesh

    # spy on the placement to prove the batch really sharded 8-way
    placed = []
    real_put = SequenceGenerator._dp_put

    def spy_put(self, mesh, inp):
        out = real_put(self, mesh, inp)
        placed.append(out)
        return out

    SequenceGenerator._dp_put = spy_put
    try:
        hyp_dp, score_dp = decode(True)
    finally:
        SequenceGenerator._dp_put = real_put
    hyp_1, score_1 = decode(False)
    np.testing.assert_array_equal(hyp_dp, hyp_1)
    np.testing.assert_allclose(score_dp, score_1, rtol=1e-5, atol=1e-5)
    assert placed, "dp placement was never exercised"
    src_sharded = placed[0]["src"]
    assert len(src_sharded.sharding.device_set) == 8
    assert src_sharded.addressable_shards[0].data.shape[0] == 1  # 8/8