"""MoE x scan_layers composition: the stack compiles as one lax.scan
over BLOCKS of `moe_layer_frequency` layers (dense then MoE — the
per-layer pattern exactly); the sown load-balancing losses ride the
scan; the decode cache gains a leading block axis; per-layer
checkpoints bridge to/from the block layout.

Beyond-reference capability (the reference has neither conditional
computation nor scan-compiled stacks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

META = {"vocab_size": 32, "eos_id": 1, "bos_id": 2, "unk_id": 3}


def _cfg(scan, layers=4, freq=2, experts=2):
    p = {
        "modality.share_source_target_embedding": True,
        "modality.share_embedding_and_softmax_weights": True,
        "modality.dim": 16, "modality.timing": "sinusoids",
        "dtype": "float32",  # bf16 reduction order differs loop/scan
    }
    for side in ("encoder", "decoder"):
        p.update({f"{side}.num_layers": layers,
                  f"{side}.hidden_size": 16,
                  f"{side}.num_attention_heads": 2,
                  f"{side}.filter_size": 32,
                  f"{side}.moe_num_experts": experts,
                  f"{side}.moe_layer_frequency": freq,
                  # jitter/dropout off so the layouts are comparable
                  # (rng streams fold differently per module path)
                  f"{side}.moe_router_jitter": 0.0,
                  f"{side}.attention_dropout_rate": 0.0,
                  f"{side}.ffn_dropout_rate": 0.0,
                  f"{side}.layer_postprocess_dropout_rate": 0.0,
                  f"{side}.scan_layers": scan})
    return {"model.class": "transformer", "model.params": p}


def _model(scan, **kw):
    from neurst_tpu.models.model import build_model
    return build_model(_cfg(scan, **kw), src_meta=META, trg_meta=META)


def _batch(rng=None):
    rng = rng or np.random.RandomState(0)
    b, S, T = 2, 6, 4
    return {
        "src": rng.randint(4, 32, size=[b, S]).astype(np.int32),
        "src_padding": np.zeros([b, S], np.float32),
        "trg_input": rng.randint(4, 32, size=[b, T]).astype(np.int32),
        "trg": rng.randint(4, 32, size=[b, T]).astype(np.int32),
        "trg_padding": np.zeros([b, T], np.float32),
        "trg_length": np.full([b], T, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }


def _bridged_params(per_layer_model, scan_model):
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    params_pl = per_layer_model.init_params(jax.random.PRNGKey(0))
    params_scan, _, missing = restore_into(
        scan_model.init_params(jax.random.PRNGKey(1)),
        flatten_params(params_pl))
    assert not missing, missing
    return params_pl, params_scan


def test_scan_moe_forward_and_aux_match_per_layer():
    loop = _model(False)
    scan = _model(True)
    params_pl, params_scan = _bridged_params(loop, scan)

    from neurst_tpu.utils.checkpoints import flatten_params
    block_names = [n for n in flatten_params(params_scan)
                   if "/layers/block_layer_" in n]
    assert block_names, "scan model has no block-stacked params"
    # MoE params live only on the last sub-layer of each block
    assert any("block_layer_1" in n and "expert_dense1_kernel" in n
               for n in block_names)
    assert not any("block_layer_0" in n and "expert" in n
                   for n in block_names)

    batch = _batch()
    rngs = {"dropout": jax.random.PRNGKey(2)}
    logits_pl, aux_pl = loop.call_train(params_pl, batch, rngs=rngs)
    logits_sc, aux_sc = scan.call_train(params_scan, batch, rngs=rngs)
    np.testing.assert_allclose(np.asarray(logits_sc),
                               np.asarray(logits_pl), rtol=0, atol=1e-5)
    # 4 MoE layers sown (2 enc + 2 dec blocks); sums must agree
    assert float(aux_pl) > 0.0
    np.testing.assert_allclose(float(aux_sc), float(aux_pl),
                               rtol=1e-6, atol=1e-7)


def test_scan_moe_grads_match_per_layer():
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.utils.checkpoints import flatten_params
    loop = _model(False)
    scan = _model(True)
    params_pl, params_scan = _bridged_params(loop, scan)
    batch = _batch(np.random.RandomState(1))
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})

    def loss(model, p):
        logits, aux = model.call_train(
            p, batch, rngs={"dropout": jax.random.PRNGKey(2)})
        return criterion.reduce_loss(batch, logits) + aux

    assert abs(float(loss(loop, params_pl))
               - float(loss(scan, params_scan))) < 1e-5
    g_pl = flatten_params(jax.grad(lambda p: loss(loop, p))(params_pl))
    g_sc = flatten_params(jax.grad(lambda p: loss(scan, p))(params_scan))
    f = 2
    for name, g in g_sc.items():
        g = np.asarray(g)
        if "/layers/block_layer_" in name:
            base, tail = name.split("/layers/block_layer_", 1)
            j, rest = tail.split("/", 1)
            ref = np.stack(
                [np.asarray(g_pl[f"{base}/layer_{b * f + int(j)}/{rest}"])
                 for b in range(g.shape[0])], 0)
        else:
            ref = np.asarray(g_pl[name])
        np.testing.assert_allclose(g, ref, rtol=0, atol=2e-5, err_msg=name)


def test_scan_moe_stepwise_decode_matches_teacher_forcing():
    """The block-layout cache ({"stacked": {"block_layer_j": ...}} with
    a leading block axis) must reproduce teacher-forcing logits
    stepwise (capacity never binds at T=1)."""
    scan = _model(True)
    params = scan.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    b, S, T = 2, 5, 4
    inputs = {
        "src": rng.randint(4, 32, size=[b, S]).astype(np.int32),
        "src_padding": np.zeros([b, S], np.float32),
        "trg_input": rng.randint(4, 32, size=[b, T]).astype(np.int32),
    }
    tf_logits = np.asarray(scan.call(params, inputs))
    s2l, init = scan.prepare_generation(params, inputs,
                                        decode_padded_length=T)
    cache = init["decoder_internal_cache"]
    leaf = cache["layers"]["stacked"]["block_layer_0"]["self"]["keys"]
    assert leaf.shape[0] == 2, "expected a leading num_blocks axis"
    ids = jnp.asarray(inputs["trg_input"][:, 0])
    step_logits = []
    for t in range(T):
        lg, cache = s2l(ids, cache, t)
        step_logits.append(np.asarray(lg))
        if t < T - 1:
            ids = jnp.asarray(inputs["trg_input"][:, t + 1])
    inc = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc, tf_logits, rtol=2e-4, atol=2e-4)


def test_scan_moe_beam_decode_matches_per_layer():
    """Full beam search over the block cache (tile/reorder on the batch
    axis BEHIND the leading block axis) equals the per-layer model's
    hypotheses given the same (bridged) parameters."""
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    loop = _model(False)
    scan = _model(True)
    params_pl, params_scan = _bridged_params(loop, scan)
    rng = np.random.RandomState(7)
    b, S = 3, 6
    inputs = {
        "src": rng.randint(4, 32, size=[b, S]).astype(np.int32),
        "src_padding": np.zeros([b, S], np.float32),
        "trg_input": np.full([b], META["bos_id"], np.int32),
    }

    def decode(model, params):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=10)
        return sequence_beam_search(
            s2l, init, beam_size=2, top_k=1,
            maximum_decode_length=10, extra_decode_length=4)

    hyp_pl, score_pl = decode(loop, params_pl)
    hyp_sc, score_sc = decode(scan, params_scan)
    np.testing.assert_array_equal(np.asarray(hyp_sc), np.asarray(hyp_pl))
    np.testing.assert_allclose(np.asarray(score_sc),
                               np.asarray(score_pl), rtol=0, atol=1e-5)


def test_scan_moe_bridge_roundtrip_back_to_per_layer():
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    loop = _model(False)
    scan = _model(True)
    params_pl, params_scan = _bridged_params(loop, scan)
    params_pl2, _, missing = restore_into(
        loop.init_params(jax.random.PRNGKey(3)),
        flatten_params(params_scan))
    assert not missing, missing
    batch = _batch()
    out1 = np.asarray(loop.call(params_pl, batch))
    out2 = np.asarray(loop.call(params_pl2, batch))
    np.testing.assert_allclose(out2, out1, rtol=0, atol=1e-6)


def test_scan_moe_train_step_runs_with_grad_accum():
    """The losses collection threads through nn.scan AND the
    update-cycle lax.scan of the train step."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    model = _model(True)
    params = model.init_params(jax.random.PRNGKey(0))
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 16, "warmup_steps": 100,
                       "initial_factor": 1.0})
    tx = create_optax_chain(
        Adam({"epsilon": 1e-9, "beta_1": 0.9, "beta_2": 0.98}), lr)
    batch = _batch(np.random.RandomState(11))
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, criterion, tx, update_cycle=2))
    stacked = {k: np.stack([v[:1], v[1:]], 0) for k, v in batch.items()}
    state, metrics = step(state, stacked, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["aux_loss"]) > 0.0
