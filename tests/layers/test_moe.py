"""Mixture-of-experts FFN (layers/moe.py): routing/capacity semantics,
the Switch auxiliary loss through the train step, expert-parallel
sharding, and stepwise-decode equivalence.

Beyond-reference capability (the reference's FFN is dense:
/root/reference/neurst/layers/common_layers.py TransformerFFN).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _moe(E, top_k=1, cf=1.25, H=8, F=16):
    from neurst_tpu.layers.moe import MoeFFN
    return MoeFFN(num_experts=E, filter_size=F, output_size=H,
                  top_k=top_k, capacity_factor=cf, router_jitter=0.0)


def _init_unboxed(layer, x):
    from flax import linen as nn
    return jax.tree_util.tree_map(
        np.asarray, nn.meta.unbox(layer.init(jax.random.PRNGKey(0), x)))


def test_single_expert_equals_dense_math():
    """E=1: every token goes to the only expert with gate 1.0, so the
    MoE layer IS the dense FFN computed with that expert's weights."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 8), jnp.float32)
    layer = _moe(E=1)
    params = _init_unboxed(layer, x)
    y = layer.apply(params, x)

    p = params["params"]
    w1, b1 = p["expert_dense1_kernel"][0], p["expert_dense1_bias"][0]
    w2, b2 = p["expert_dense2_kernel"][0], p["expert_dense2_bias"][0]
    ref = np.maximum(np.asarray(x) @ w1 + b1, 0.0) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_capacity_overflow_tokens_get_zero_output():
    """All tokens route to expert 0; beyond its capacity the layer
    outputs zero (the residual connection carries those tokens)."""
    rng = np.random.RandomState(1)
    B, T, H = 1, 6, 8
    x = jnp.asarray(rng.randn(B, T, H), jnp.float32)
    layer = _moe(E=2, cf=0.5)  # capacity = ceil(6*0.5/2) = 2
    params = _init_unboxed(layer, x)
    # zero router weights -> uniform probs -> argmax tie-breaks to
    # expert 0 for EVERY token (gate 0.5)
    params["params"]["router_kernel"] = np.zeros((H, 2), np.float32)
    y = np.asarray(layer.apply(params, x, is_training=True),
                   np.float32)
    # first 2 tokens fit (capacity 2); tokens 2..5 are dropped
    assert np.abs(y[0, :2]).sum() > 0
    np.testing.assert_allclose(y[0, 2:], 0.0, atol=1e-6)


def test_top2_gates_renormalized():
    """top_k=2 with ample capacity: output = sum_i g_i * FFN_i(x) with
    g renormalized over the two selected experts."""
    rng = np.random.RandomState(2)
    B, T, H, F, E = 1, 3, 8, 16, 4
    x = jnp.asarray(rng.randn(B, T, H), jnp.float32)
    layer = _moe(E=E, top_k=2, cf=4.0, H=H, F=F)
    params = _init_unboxed(layer, x)
    y = np.asarray(layer.apply(params, x))

    p = params["params"]
    logits = np.asarray(x, np.float32) @ p["router_kernel"]
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ref = np.zeros((B, T, H), np.float32)
    for b in range(B):
        for t in range(T):
            order = np.argsort(-probs[b, t])
            e1, e2 = order[0], order[1]
            g1, g2 = probs[b, t, e1], probs[b, t, e2]
            s = g1 + g2
            for e, g in ((e1, g1 / s), (e2, g2 / s)):
                h = np.maximum(
                    x[b, t] @ p["expert_dense1_kernel"][e]
                    + p["expert_dense1_bias"][e], 0.0)
                ref[b, t] += g * (h @ p["expert_dense2_kernel"][e]
                                  + p["expert_dense2_bias"][e])
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def _tiny_moe_model_cfg(freq=1, experts=2):
    p = {
        "modality.share_source_target_embedding": True,
        "modality.share_embedding_and_softmax_weights": True,
        "modality.dim": 16, "modality.timing": "sinusoids",
    }
    for side in ("encoder", "decoder"):
        p.update({f"{side}.num_layers": 2,
                  f"{side}.hidden_size": 16,
                  f"{side}.num_attention_heads": 2,
                  f"{side}.filter_size": 32,
                  f"{side}.moe_num_experts": experts,
                  f"{side}.moe_layer_frequency": freq})
    return {"model.class": "transformer", "model.params": p}


def test_aux_loss_surfaces_through_call_train_and_train_step():
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    meta = {"vocab_size": 64, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    model = build_model(_tiny_moe_model_cfg(), src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    b, L = 4, 6
    batch = {
        "src": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "src_padding": np.zeros([b, L], np.float32),
        "trg_input": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "trg": rng.randint(4, 64, size=[b, L]).astype(np.int32),
        "trg_padding": np.zeros([b, L], np.float32),
        "trg_length": np.full([b], L, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }
    logits, aux = model.call_train(params, batch,
                                   rngs={"dropout": jax.random.PRNGKey(1)})
    # 4 MoE layers (freq 1, 2 enc + 2 dec); aux = sum of per-layer
    # Switch losses, each ~coef * E * sum(f*P) ~ coef for balanced
    assert float(aux) > 0.0
    assert np.isfinite(float(aux))

    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 16, "warmup_steps": 100,
                       "initial_factor": 1.0})
    tx = create_optax_chain(
        Adam({"epsilon": 1e-9, "beta_1": 0.9, "beta_2": 0.98}), lr)

    # plain step
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, criterion, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["aux_loss"]) > 0.0  # surfaced for telemetry

    # router gets gradients (load-balancing backward works)
    def router_moved(old, new):
        moved = []
        def _walk(o, n, path=""):
            if isinstance(o, dict):
                for k in o:
                    _walk(o[k], n[k], path + "/" + k)
            elif "router_kernel" in path:
                moved.append(
                    float(np.abs(np.asarray(o) - np.asarray(n)).max()))
        _walk(old, new)
        return moved
    deltas = router_moved(params, state.params)
    assert deltas and max(deltas) > 0.0

    # grad-accum path: micro-batches stacked on the leading axis
    step2 = jax.jit(make_train_step(model, criterion, tx, update_cycle=2))
    stacked = {k: np.stack([v[:2], v[2:]], 0) for k, v in batch.items()}
    state2 = TrainState.create(params, tx)
    state2, metrics2 = step2(state2, stacked, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics2["loss"]))


def test_expert_params_shard_over_data_axis():
    pytest.importorskip("jax")
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from neurst_tpu.models.model import build_model
    from neurst_tpu.parallel import make_mesh, params_shardings
    from neurst_tpu.utils.checkpoints import flatten_params

    meta = {"vocab_size": 64, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    model = build_model(_tiny_moe_model_cfg(), src_meta=meta, trg_meta=meta)
    mesh = make_mesh(model_parallel=1)
    flat = flatten_params(params_shardings(mesh, model.params_spec()))
    expert_kernels = {k: s for k, s in flat.items()
                      if "expert_dense" in k and k.endswith("kernel")}
    assert expert_kernels, "no expert kernels found"
    for k, s in expert_kernels.items():
        assert s.spec and s.spec[0] == "data", (k, s.spec)
    routers = {k: s for k, s in flat.items() if "router_kernel" in k}
    assert routers
    for k, s in routers.items():  # router replicated
        assert not any(s.spec), (k, s.spec)


def test_moe_stepwise_decode_matches_teacher_forcing():
    """E=2 keeps eval capacity = T (never drops), so incremental decode
    logits must equal the teacher-forcing logits."""
    from neurst_tpu.models.model import build_model

    meta = {"vocab_size": 32, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    model = build_model(_tiny_moe_model_cfg(experts=2),
                        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    b, S, T = 2, 5, 4
    inputs = {
        "src": rng.randint(4, 32, size=[b, S]).astype(np.int32),
        "src_padding": np.zeros([b, S], np.float32),
        "trg_input": rng.randint(4, 32, size=[b, T]).astype(np.int32),
    }
    tf_logits = np.asarray(model.call(params, inputs))

    s2l, init = model.prepare_generation(params, inputs,
                                         decode_padded_length=T)
    cache = init["decoder_internal_cache"]
    ids = jnp.asarray(inputs["trg_input"][:, 0])
    step_logits = []
    for t in range(T):
        lg, cache = s2l(ids, cache, t)
        step_logits.append(np.asarray(lg))
        if t < T - 1:
            ids = jnp.asarray(inputs["trg_input"][:, t + 1])
    inc = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc, tf_logits, rtol=2e-4, atol=2e-4)


def test_moe_composes_with_speech_transformer_and_bf16_params():
    """MoE FFNs inside the SpeechTransformer audio front-end, trained
    under --bf16_params (bf16 stored params + f32 master)."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.speech_transformer import SpeechTransformer
    from neurst_tpu.optimizers.master_weights import (cast_params_bf16,
                                                      with_bf16_params)
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    cfg = SpeechTransformer.build_model_args_by_name(
        "speech_transformer_toy")
    params_cfg = dict(cfg["model.params"])
    for side in ("encoder", "decoder"):
        params_cfg[f"{side}.moe_num_experts"] = 2
        params_cfg[f"{side}.moe_layer_frequency"] = 1
    model = build_model(
        cfg | {"model.params": params_cfg},
        src_meta={"audio_feature_dim": 80, "audio_feature_channels": 1},
        trg_meta={"vocab_size": 64, "eos_id": 1, "bos_id": 2, "unk_id": 3})

    lr = NoamSchedule({"dmodel": 16, "warmup_steps": 100,
                       "initial_factor": 1.0})
    tx = with_bf16_params(create_optax_chain(
        Adam({"epsilon": 1e-9, "beta_1": 0.9, "beta_2": 0.98}), lr))
    params = cast_params_bf16(model.init_params(jax.random.PRNGKey(0)))
    state = TrainState.create(params, tx)
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    step = jax.jit(make_train_step(model, criterion, tx))

    rng = np.random.RandomState(9)
    b = 4
    batch = {
        "src": rng.randn(b, 32, 80, 1).astype(np.float32),
        "src_length": np.full([b], 32, np.int32),
        "trg_input": np.ones([b, 8], np.int32),
        "trg": np.ones([b, 8], np.int32),
        "trg_length": np.full([b], 8, np.int32),
        "trg_padding": np.zeros([b, 8], np.float32),
        "sample_mask": np.ones([b], np.float32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_cli_moe_train_then_predict(tmp_path):
    """End-to-end through the real CLI: train with MoE flags on the
    8-device mesh (2 experts on an 8-way data axis exercises the
    graceful replicate-fallback sharding), then predict from the saved
    model_dir (the persisted config rebuilds the MoE structure; the
    router runs per decode step)."""
    import os

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from neurst_tpu.cli.run_exp import cli_main

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    os.chdir(repo)
    model_dir = str(tmp_path / "model")
    cli_main(["--entry", "train",
              "--config_paths", "tests/examples/example_train_seq2seq.yml",
              "--model_dir", model_dir,
              "--encoder.moe_num_experts", "2",
              "--decoder.moe_num_experts", "2",
              "--train_steps", "10", "--save_checkpoint_steps", "10",
              "--summary_steps", "5"])
    assert os.path.exists(os.path.join(model_dir, "ckpt-10.npz"))
    import yaml as _yaml
    with open(os.path.join(model_dir, "model_configs.yml")) as f:
        saved = _yaml.safe_load(f)
    assert saved["model.params"].get("encoder.moe_num_experts") == 2

    out = str(tmp_path / "hypo.txt")
    result = cli_main(
        ["--entry", "predict", "--model_dir", model_dir,
         "--dataset.class", "parallel_text",
         "--dataset.params",
         "{src_file: tests/examples/dev.src, "
         "trg_file: tests/examples/dev.trg}",
         "--search_method.class", "beam_search",
         "--search_method.params",
         "{beam_size: 2, maximum_decode_length: 16}",
         "--metric", "bleu", "--output_file", out])
    assert os.path.exists(out)
    assert all(np.isfinite(s) for s in result["scores"])


def test_moe_rejects_pipeline_and_nondivisible_scan_layouts():
    """pipeline_stages>1 with MoE stays rejected; scan_layers with MoE
    (tests/layers/test_scan_moe.py) requires num_layers divisible by
    moe_layer_frequency."""
    from neurst_tpu.models.model import build_model

    meta = {"vocab_size": 32, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    cfg = _tiny_moe_model_cfg()
    cfg["model.params"]["encoder.pipeline_stages"] = 2
    model = build_model(cfg, src_meta=meta, trg_meta=meta)
    with pytest.raises(ValueError, match="pipeline_stages"):
        model.init_params(jax.random.PRNGKey(0))

    cfg = _tiny_moe_model_cfg(freq=2)  # 2 layers, freq 2 divides
    cfg["model.params"]["encoder.num_layers"] = 3  # ...but 3 does not
    cfg["model.params"]["encoder.scan_layers"] = True
    model = build_model(cfg, src_meta=meta, trg_meta=meta)
    with pytest.raises(ValueError, match="divisible"):
        model.init_params(jax.random.PRNGKey(0))
