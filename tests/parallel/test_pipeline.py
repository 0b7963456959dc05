"""Pipeline parallelism (layers/pipeline.py): the GPipe tick schedule
must reproduce the sequential layer stack exactly, shard over a mesh
"stage" axis, and train end-to-end under dp x pp x tp.

Beyond-reference capability (the reference scales only by data
parallelism: /root/reference/neurst/training/distribution_utils.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh")


def _enc_kwargs(num_layers=4):
    return dict(num_layers=num_layers, hidden_size=16,
                num_attention_heads=2, filter_size=32)


def test_pipelined_encoder_matches_sequential():
    from neurst_tpu.layers.encoders.transformer_encoder import \
        TransformerEncoder

    from flax import linen as nn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 12, 16), jnp.float32)
    pad = jnp.zeros([8, 12], jnp.float32)
    seq = TransformerEncoder(**_enc_kwargs())
    pipe = TransformerEncoder(**_enc_kwargs(), pipeline_stages=2,
                              pipeline_microbatches=4)
    params = nn.meta.unbox(seq.init({"params": jax.random.PRNGKey(0)},
                                    x, pad))
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    p_pipe = nn.meta.unbox(pipe.init({"params": jax.random.PRNGKey(1)},
                                     x, pad))
    bridged, restored, missing = restore_into(
        p_pipe, {k: np.asarray(v)
                 for k, v in flatten_params(params).items()})
    assert not missing, missing
    y_seq = seq.apply(params, x, pad)
    y_pipe = pipe.apply(bridged, x, pad)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_encoder_grads_match_sequential():
    """Bubble-tick garbage must contribute zero gradient."""
    from neurst_tpu.layers.encoders.transformer_encoder import \
        TransformerEncoder
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    from flax import linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 6, 16), jnp.float32)
    pad = jnp.zeros([4, 6], jnp.float32)
    seq = TransformerEncoder(**_enc_kwargs(num_layers=2))
    pipe = TransformerEncoder(**_enc_kwargs(num_layers=2),
                              pipeline_stages=2, pipeline_microbatches=2)
    params = nn.meta.unbox(seq.init({"params": jax.random.PRNGKey(0)},
                                    x, pad))
    p_pipe0 = nn.meta.unbox(pipe.init({"params": jax.random.PRNGKey(1)},
                                      x, pad))
    p_pipe, _, missing = restore_into(
        p_pipe0, {k: np.asarray(v)
                  for k, v in flatten_params(params).items()})
    assert not missing

    g_seq = jax.grad(lambda p: jnp.sum(seq.apply(p, x, pad) ** 2))(params)
    g_pipe = jax.grad(lambda p: jnp.sum(pipe.apply(p, x, pad) ** 2))(p_pipe)
    flat_seq = flatten_params(g_seq)
    flat_pipe = flatten_params(g_pipe)
    # compare via the bridge in the reverse direction: flatten the
    # pipelined [S, P, ...] grads to the scan layout names
    bridged_back, _, missing = restore_into(
        g_seq, {k: np.asarray(v) for k, v in flat_pipe.items()})
    assert not missing
    for k, v in flatten_params(bridged_back).items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_seq[k]), rtol=1e-4, atol=1e-5,
            err_msg=k)


def test_pipeline_trains_under_dp_pp_tp_mesh():
    """Full transformer train step on a dp2 x pp2 x tp2 mesh; loss
    matches the unpipelined single-device step."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import (TrainState, batch_sharding, make_mesh,
                                     make_train_step, params_shardings)
    from neurst_tpu.parallel.utils import put_batch
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into

    meta = {"vocab_size": 64, "eos_id": 1, "bos_id": 2, "unk_id": 3}

    def _cfg(pp_stages):
        p = {
            "modality.share_source_target_embedding": True,
            "modality.share_embedding_and_softmax_weights": True,
            "modality.dim": 16, "modality.timing": "sinusoids",
        }
        for side in ("encoder", "decoder"):
            p.update({f"{side}.num_layers": 2,
                      f"{side}.hidden_size": 16,
                      f"{side}.num_attention_heads": 2,
                      f"{side}.filter_size": 32})
            if pp_stages > 1:
                p.update({f"{side}.pipeline_stages": pp_stages,
                          f"{side}.pipeline_microbatches": 4})
        return {"model.class": "transformer", "model.params": p}

    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 16, "warmup_steps": 100,
                       "initial_factor": 1.0})

    rng = np.random.RandomState(0)
    b, L = 8, 10
    host_batch = {
        "src": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "src_padding": np.zeros([b, L], np.float32),
        "trg_input": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "trg": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "trg_padding": np.zeros([b, L], np.float32),
        "trg_length": np.full([b], L, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }

    losses = {}
    params_by = {}
    for key, pp in (("plain", 1), ("piped", 2)):
        model = build_model(_cfg(2 if key == "piped" else 1),
                            src_meta=meta, trg_meta=meta)
        tx = create_optax_chain(
            Adam({"epsilon": 1e-9, "beta_1": 0.9, "beta_2": 0.98}), lr)
        params = model.init_params(jax.random.PRNGKey(0))
        if key == "piped":
            params, _, missing = restore_into(
                params, {k: np.asarray(v) for k, v in flatten_params(
                    params_by["plain"]).items()})
            assert not missing, missing
            mesh = make_mesh(model_parallel=2, pipeline_parallel=2)
            assert dict(mesh.shape) == {"data": 2, "stage": 2, "model": 2}
            p_shard = params_shardings(mesh, model.params_spec())
            params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
            state = TrainState.create(params, tx)
            step = jax.jit(make_train_step(model, criterion, tx),
                           donate_argnums=(0,))
            with mesh:
                device_batch = put_batch(mesh, host_batch)
                state, metrics = step(state, device_batch,
                                      jax.random.PRNGKey(7))
                losses[key] = float(metrics["loss"])
        else:
            params_by[key] = params
            state = TrainState.create(params, tx)
            step = jax.jit(make_train_step(model, criterion, tx))
            state, metrics = step(state, host_batch,
                                  jax.random.PRNGKey(7))
            losses[key] = float(metrics["loss"])
    assert np.isfinite(losses["piped"])
    # dp2 x pp2 x tp2 sharded reductions reorder f32 sums vs the
    # single-device step; observed delta ~1e-4 relative
    np.testing.assert_allclose(losses["piped"], losses["plain"],
                               rtol=5e-4)


def test_cli_pipeline_train_then_predict(tmp_path):
    """End-to-end: `--entry train --pipeline_parallel 2` on a
    dp4 x pp2 mesh (the example vocab, 43 tokens, is not divisible by
    a tp axis; dp x pp x tp together is covered above), then
    `--entry predict` from the same model_dir — the predict entry
    strips the training-only pipeline flags and the checkpoint bridge
    reshapes the stacked [stages, layers_per_stage, ...] params into
    the sequential layout."""
    import os

    from neurst_tpu.cli.run_exp import cli_main

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    os.chdir(repo)
    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train",
              "--config_paths", "tests/examples/example_train_seq2seq.yml",
              "--model_dir", model_dir,
              "--pipeline_parallel", "2",
              "--encoder.pipeline_stages", "2",
              "--decoder.pipeline_stages", "2",
              "--train_steps", "10", "--save_checkpoint_steps", "10",
              "--summary_steps", "5"])
    assert os.path.exists(os.path.join(model_dir, "ckpt-10.npz"))
    # the persisted config keeps the pipeline flags (training resume)
    import yaml as _yaml
    with open(os.path.join(model_dir, "model_configs.yml")) as f:
        saved = _yaml.safe_load(f)
    assert saved["model.params"].get("encoder.pipeline_stages") == 2

    out = str(tmp_path / "hypo.txt")
    cli_main(["--entry", "predict", "--model_dir", model_dir,
              "--dataset.class", "parallel_text",
              "--dataset.params",
              "{src_file: tests/examples/dev.src, "
              "trg_file: tests/examples/dev.trg}",
              "--search_method.class", "beam_search",
              "--search_method.params",
              "{beam_size: 2, maximum_decode_length: 16}",
              "--metric", "bleu",
              "--output_file", out])
    assert os.path.exists(out)
    assert open(out).read() is not None


def test_pipeline_composes_with_grad_accumulation():
    """update_cycle=2 micro-batches, each GPipe-microbatched inside the
    pipelined model: the accumulated step must match the single
    big-batch step on the same dp4 x pp2 mesh."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import (TrainState, make_mesh, make_train_step,
                                     params_shardings)
    from neurst_tpu.parallel.utils import put_batch

    meta = {"vocab_size": 64, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    p = {
        "modality.share_source_target_embedding": True,
        "modality.share_embedding_and_softmax_weights": True,
        "modality.dim": 16, "modality.timing": "sinusoids",
    }
    for side in ("encoder", "decoder"):
        p.update({f"{side}.num_layers": 2, f"{side}.hidden_size": 16,
                  f"{side}.num_attention_heads": 2,
                  f"{side}.filter_size": 32,
                  f"{side}.pipeline_stages": 2,
                  f"{side}.pipeline_microbatches": 2})
    model = build_model({"model.class": "transformer", "model.params": p},
                        src_meta=meta, trg_meta=meta)
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 16, "warmup_steps": 100,
                       "initial_factor": 1.0})

    rng = np.random.RandomState(7)
    b, L = 8, 10
    big = {
        "src": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "src_padding": np.zeros([b, L], np.float32),
        "trg_input": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "trg": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "trg_padding": np.zeros([b, L], np.float32),
        "trg_length": np.full([b], L, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }
    stacked = {k: np.stack([v[: b // 2], v[b // 2:]], 0)
               for k, v in big.items()}

    mesh = make_mesh(model_parallel=1, pipeline_parallel=2)
    # host copies: the donated step below deletes device buffers
    params = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(0)))
    p_shard = params_shardings(mesh, model.params_spec())
    losses = {}
    for key, (cycle, batch) in (("big", (1, big)),
                                ("accum", (2, stacked))):
        placed = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        tx = create_optax_chain(
            Adam({"epsilon": 1e-9, "beta_1": 0.9, "beta_2": 0.98}), lr)
        state = TrainState.create(placed, tx)
        step = jax.jit(make_train_step(model, criterion, tx,
                                       update_cycle=cycle),
                       donate_argnums=(0,))
        with mesh:
            placed_batch = put_batch(mesh, batch,
                                     batch_axis=1 if cycle > 1 else 0)
            state, metrics = step(state, placed_batch,
                                  jax.random.PRNGKey(11))
            losses[key] = float(metrics["loss"])
    # dropout-free config; only reduction order differs
    np.testing.assert_allclose(losses["accum"], losses["big"], rtol=2e-5)


def test_pipeline_stage_params_actually_sharded():
    """The stacked [S, P, ...] layer params carry the "stage" logical
    axis and land sharded over the mesh's stage axis."""
    from neurst_tpu.models.model import build_model
    from neurst_tpu.parallel import make_mesh, params_shardings

    meta = {"vocab_size": 64, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    p = {
        "modality.share_source_target_embedding": True,
        "modality.share_embedding_and_softmax_weights": True,
        "modality.dim": 16, "modality.timing": "sinusoids",
        "encoder.num_layers": 2, "encoder.hidden_size": 16,
        "encoder.num_attention_heads": 2, "encoder.filter_size": 32,
        "encoder.pipeline_stages": 2,
        "decoder.num_layers": 2, "decoder.hidden_size": 16,
        "decoder.num_attention_heads": 2, "decoder.filter_size": 32,
        "decoder.pipeline_stages": 2,
    }
    model = build_model({"model.class": "transformer", "model.params": p},
                        src_meta=meta, trg_meta=meta)
    mesh = make_mesh(model_parallel=1, pipeline_parallel=2)
    shardings = params_shardings(mesh, model.params_spec())
    from neurst_tpu.utils.checkpoints import flatten_params
    flat = flatten_params(shardings)
    # kernels carry Partitioned metadata (biases/LN scales are plain
    # leaves and stay replicated, as on the scan_layers path)
    staged = {k: s for k, s in flat.items()
              if "/pipeline/stages/" in k and k.endswith("kernel")}
    assert staged, "no pipelined kernels found"
    for k, s in staged.items():
        assert s.spec and s.spec[0] == "stage", (k, s.spec)
