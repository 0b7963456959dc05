"""Sharded (orbax) checkpoint format: each process/device shard writes
and restores without gathering the full pytree to one host — the
pod-scale complement to the reference-compatible npz format (new
TPU-native capability; the reference's TF checkpoints are host-gathered).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def test_orbax_roundtrip_with_sharded_params(tmp_path):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from neurst_tpu.parallel.mesh import make_mesh
    from neurst_tpu.utils.orbax_checkpoints import (
        latest_orbax_checkpoint, restore_checkpoint_orbax,
        save_checkpoint_orbax)

    mesh = make_mesh(model_parallel=2)
    sharding = NamedSharding(mesh, PartitionSpec("model", None))
    params = {
        "layer": {
            "kernel": jax.device_put(
                np.arange(64, dtype=np.float32).reshape(8, 8), sharding),
            "bias": jax.device_put(np.ones([8], np.float32)),
        }
    }
    model_dir = str(tmp_path / "m")
    save_checkpoint_orbax(model_dir, 10, params)
    save_checkpoint_orbax(model_dir, 20, params)
    assert latest_orbax_checkpoint(model_dir).endswith("ckpt-20.orbax")

    # restore directly into the sharded layout via ShapeDtypeStructs
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding), params)
    restored = restore_checkpoint_orbax(
        latest_orbax_checkpoint(model_dir), template)
    np.testing.assert_array_equal(
        np.asarray(restored["layer"]["kernel"]),
        np.arange(64, dtype=np.float32).reshape(8, 8))
    assert restored["layer"]["kernel"].sharding.is_equivalent_to(
        sharding, 2)

    # max_to_keep prunes old steps (and their optstate sidecars)
    for step in (30, 40, 50):
        save_checkpoint_orbax(model_dir, step, params, max_to_keep=2)
    left = sorted(f for f in os.listdir(model_dir) if f.endswith(".orbax"))
    assert left == ["ckpt-40.orbax", "ckpt-50.orbax"]


@pytest.mark.slow
def test_trainer_orbax_format_and_resume(tmp_path, caplog):
    """CLI train with --checkpoint_format orbax, then resume: the
    sharded checkpoint (and optimizer-state sidecar) must be found and
    training continue from the saved step."""
    import logging

    from neurst_tpu.cli.run_exp import cli_main
    os.chdir(REPO)
    model_dir = str(tmp_path / "model")
    common = ["--entry", "train",
              "--config_paths", "tests/examples/example_train_seq2seq.yml",
              "--model_dir", model_dir,
              "--checkpoint_format", "orbax",
              "--save_checkpoint_steps", "20", "--summary_steps", "10"]
    cli_main(common + ["--train_steps", "20"])
    assert os.path.isdir(os.path.join(model_dir, "ckpt-20.orbax"))
    assert os.path.isdir(os.path.join(model_dir, "ckpt-20.optstate.orbax"))
    assert not os.path.exists(os.path.join(model_dir, "ckpt-20.npz"))

    with caplog.at_level(logging.INFO):
        cli_main(common + ["--train_steps", "40"])
    msgs = [r.getMessage() for r in caplog.records]
    assert os.path.isdir(os.path.join(model_dir, "ckpt-40.orbax"))
    assert any("Start training from step 20 to 40" in m for m in msgs), \
        [m for m in msgs if "Start training" in m]
    assert any("Restored sharded optimizer state" in m for m in msgs)

    # predict must find the orbax checkpoint (a silent random-init
    # decode here was a round-2 review finding)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        result = cli_main(
            ["--entry", "predict", "--model_dir", model_dir,
             "--dataset.class", "parallel_text",
             "--dataset.params", "{src_file: tests/examples/dev.src, "
                                 "trg_file: tests/examples/dev.trg}",
             "--search_method.params",
             "{beam_size: 2, maximum_decode_length: 12}"])
    msgs = [r.getMessage() for r in caplog.records]
    assert result["samples"] == 24
    assert not any("using random init" in m for m in msgs), \
        [m for m in msgs if "random" in m]
    assert any("Restored generation model from" in m
               and "ckpt-40.orbax" in m for m in msgs), \
        [m for m in msgs if "Restored" in m]
