"""Multi-device training correctness on the virtual 8-CPU mesh.

These tests close the reference's own upstream-trust gap (SURVEY.md §4:
"no multi-node test harness... distributed correctness relies on
tf.distribute/Horovod upstream"): we assert that our mesh-sharded
training is *numerically identical* to single-device training.

  * dp=8 sharded train steps == single-device steps (loss + params)
  * tp=2 sharded forward logits == unsharded forward
  * grad accumulation (update_cycle=4) == one big batch
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 24, "eos_id": 22, "bos_id": 22, "unk_id": 21}


def _toy_model():
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    args = Transformer.build_model_args_by_name("transformer_toy")
    cfg = dict(args["model.params"])
    cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


def _batch(batch_size=8, src_len=6, trg_len=5, seed=0, ragged=True):
    # ragged rows by default: per-row lengths differ, so micro-batches
    # carry unequal token counts — grad accumulation must still equal
    # big-batch semantics (token-weighted accumulation in train_step)
    rng = np.random.RandomState(seed)
    src_lens = (rng.randint(2, src_len + 1, size=[batch_size])
                if ragged else np.full([batch_size], src_len))
    trg_lens = (rng.randint(2, trg_len + 1, size=[batch_size])
                if ragged else np.full([batch_size], trg_len))
    src_pad = (np.arange(src_len)[None, :]
               >= src_lens[:, None]).astype(np.float32)
    trg_pad = (np.arange(trg_len)[None, :]
               >= trg_lens[:, None]).astype(np.float32)
    return {
        "src": rng.randint(3, 20, size=[batch_size, src_len]).astype(np.int32),
        "src_padding": src_pad,
        "trg_input": rng.randint(3, 20,
                                 size=[batch_size, trg_len]).astype(np.int32),
        "trg": rng.randint(3, 20, size=[batch_size, trg_len]).astype(np.int32),
        "trg_padding": trg_pad,
        "trg_length": trg_lens.astype(np.int32),
        "sample_mask": np.ones([batch_size], np.float32),
    }


def _train_setup(model):
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 8, "warmup_steps": 100,
                       "initial_factor": 1.0})
    tx = create_optax_chain(Adam({"epsilon": 1e-9, "beta_1": 0.9,
                                  "beta_2": 0.98}), lr, clip_norm=1.0)
    return criterion, tx, lr


def _run_steps(model, mesh, n_steps, update_cycle=1, batch_seed=0):
    """Runs n_steps identical-batch train steps on `mesh`, returns
    (losses, final params as host arrays).

    Uses plain SGD: sharded vs unsharded forwards differ by float
    reduction-order noise (~1e-7), and an adaptive optimizer (Adam
    m/sqrt(v)) amplifies that noise to full-update magnitude on
    near-zero-gradient coordinates — SGD keeps parameter trajectories
    comparable at float tolerance, which is what this test is for.
    """
    import optax
    from neurst_tpu.parallel import (TrainState, batch_sharding,
                                     make_train_step, params_shardings)
    from neurst_tpu.parallel.utils import put_batch
    criterion, _, _ = _train_setup(model)
    tx = optax.sgd(0.1)
    params = model.init_params(jax.random.PRNGKey(0))
    p_shard = params_shardings(mesh, model.params_spec())
    params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, criterion, tx,
                              update_cycle=update_cycle)
    jit_step = jax.jit(step_fn)
    host = _batch(seed=batch_seed)
    if update_cycle > 1:
        host = {k: v.reshape((update_cycle, -1) + v.shape[1:])
                for k, v in host.items()}
    losses = []
    with mesh:
        batch = put_batch(mesh, host,
                          batch_axis=1 if update_cycle > 1 else 0)
        for i in range(n_steps):
            state, metrics = jit_step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
    final = jax.tree_util.tree_map(np.asarray, state.params)
    return losses, final


def _max_tree_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return max(float(np.max(np.abs(x - y)))
               for x, y in zip(leaves_a, leaves_b))


@pytest.fixture(scope="module")
def meshes():
    from neurst_tpu.parallel import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (see conftest)")
    return {
        "dp8": make_mesh(model_parallel=1),
        "dp4tp2": make_mesh(model_parallel=2),
        "single": make_mesh(devices=jax.devices()[:1]),
    }


def test_dp8_train_matches_single_device(meshes):
    """Data-parallel sharded steps must equal single-device steps:
    same loss trajectory, same parameters after 3 updates."""
    model = _toy_model()
    losses8, params8 = _run_steps(model, meshes["dp8"], n_steps=3)
    losses1, params1 = _run_steps(model, meshes["single"], n_steps=3)
    np.testing.assert_allclose(losses8, losses1, rtol=0, atol=1e-5)
    assert _max_tree_diff(params8, params1) < 1e-5


def test_tp2_forward_matches_unsharded(meshes):
    """Tensor-parallel (model-sharded) forward logits == unsharded."""
    from neurst_tpu.parallel import batch_sharding, params_shardings
    from neurst_tpu.parallel.utils import put_batch
    model = _toy_model()
    params = model.init_params(jax.random.PRNGKey(0))
    host = _batch()
    inputs = {k: host[k] for k in ("src", "src_padding", "trg_input")}

    ref = np.asarray(model.call(params, inputs, is_training=False))

    mesh = meshes["dp4tp2"]
    p_shard = params_shardings(mesh, model.params_spec())
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    fwd = jax.jit(lambda p, x: model.call(p, x, is_training=False))
    with mesh:
        device_inputs = put_batch(mesh, inputs)
        out = np.asarray(fwd(sharded_params, device_inputs))
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-4)
    # sanity: the tp axis really shards some parameter
    specs = jax.tree_util.tree_leaves(
        p_shard, is_leaf=lambda s: hasattr(s, "spec"))
    assert any("model" in str(s.spec) for s in specs)


def test_grad_accum_equals_big_batch(meshes):
    """update_cycle=4 over 2-example micro-batches == one 8-example
    batch, with RAGGED rows (unequal per-micro token counts): the
    token-weighted accumulation must reproduce big-batch normalization
    exactly."""
    model = _toy_model()
    host = _batch(seed=12)
    # sanity: the micro-batches really have unequal token counts
    micro_tokens = (5 - host["trg_padding"].sum(axis=1)).reshape(4, 2).sum(1)
    assert len(set(micro_tokens.tolist())) > 1
    losses_acc, params_acc = _run_steps(model, meshes["single"],
                                        n_steps=2, update_cycle=4,
                                        batch_seed=12)
    losses_big, params_big = _run_steps(model, meshes["single"], n_steps=2,
                                        batch_seed=12)
    np.testing.assert_allclose(losses_acc, losses_big, rtol=0, atol=1e-5)
    assert _max_tree_diff(params_acc, params_big) < 1e-5


def test_dp_grads_match_single_device(meshes):
    """The raw gradient pytree from a dp=8 sharded loss equals the
    single-device gradients on the same batch."""
    from neurst_tpu.parallel.utils import put_batch
    model = _toy_model()
    criterion, _, _ = _train_setup(model)
    params = model.init_params(jax.random.PRNGKey(0))
    host = _batch(seed=3)

    def loss_fn(p, b):
        logits = model.call(p, b, is_training=True,
                            rngs={"dropout": jax.random.PRNGKey(5)})
        return criterion.reduce_loss(b, logits)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss_ref, grads_ref = grad_fn(params, host)
    mesh = meshes["dp8"]
    with mesh:
        batch = put_batch(mesh, host)
        loss_dp, grads_dp = grad_fn(params, batch)
    assert abs(float(loss_dp) - float(loss_ref)) < 1e-6
    assert _max_tree_diff(
        jax.tree_util.tree_map(np.asarray, grads_dp),
        jax.tree_util.tree_map(np.asarray, grads_ref)) < 1e-5


def test_bf16_params_with_f32_master_tracks_f32_training(meshes):
    """--bf16_params option: bf16 stored params + f32 master must track
    plain-f32 SGD training closely (master accumulates exactly; the
    live params are just bf16 roundings of it)."""
    import optax

    from neurst_tpu.optimizers.master_weights import (cast_params_bf16,
                                                      with_bf16_params)
    from neurst_tpu.parallel import TrainState, make_train_step
    model = _toy_model()
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    host = _batch(seed=4)

    def run(bf16):
        tx = optax.sgd(0.05)
        params = model.init_params(jax.random.PRNGKey(0))
        if bf16:
            tx = with_bf16_params(tx)
            params = cast_params_bf16(params)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, criterion, tx))
        for _ in range(3):
            state, metrics = step(state, host, jax.random.PRNGKey(7))
        return state, float(metrics["loss"])

    state32, loss32 = run(False)
    state16, loss16 = run(True)
    assert abs(loss32 - loss16) < 5e-2
    # the f32 master tracks the f32 trajectory to fine tolerance
    master = state16.opt_state[-1]["master"] \
        if isinstance(state16.opt_state, tuple) else None
    if master is None:
        leaves = [x for x in jax.tree_util.tree_leaves(
            state16.opt_state,
            is_leaf=lambda x: isinstance(x, dict) and "master" in x)
            if isinstance(x, dict)]
        master = leaves[0]["master"]
    diff = _max_tree_diff(
        jax.tree_util.tree_map(np.asarray, master),
        jax.tree_util.tree_map(np.asarray, state32.params))
    assert diff < 5e-3, diff
    # live params are bf16
    dtypes = {str(x.dtype) for x in
              jax.tree_util.tree_leaves(state16.params)}
    assert dtypes == {"bfloat16"}, dtypes


def test_bf16_params_respects_frozen_variables(meshes):
    """with_bf16_params must wrap OUTSIDE masking transforms: a frozen
    variable's master must not advance, and the live bf16 weight must
    stay bit-identical across steps."""
    import optax

    from neurst_tpu.optimizers.master_weights import (cast_params_bf16,
                                                      with_bf16_params)
    from neurst_tpu.parallel import TrainState, make_train_step
    from neurst_tpu.utils.checkpoints import (flatten_params,
                                              unflatten_params)
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    model = _toy_model()
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})

    def label(params):
        flat = flatten_params(params)
        return unflatten_params(
            {k: ("frozen" if "ffn" in k else "train") for k in flat})

    tx = with_bf16_params(optax.multi_transform(
        {"train": optax.sgd(0.1), "frozen": optax.set_to_zero()}, label))
    params = cast_params_bf16(model.init_params(jax.random.PRNGKey(0)))
    before = {k: np.asarray(v).copy()
              for k, v in flatten_params(params).items() if "ffn" in k}
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, criterion, tx))
    host = _batch(seed=6)
    for _ in range(3):
        state, _ = step(state, host, jax.random.PRNGKey(7))
    after = flatten_params(state.params)
    changed_any = False
    for k, v in before.items():
        np.testing.assert_array_equal(np.asarray(after[k]), v, err_msg=k)
    # sanity: unfrozen weights did move
    all_after = {k: np.asarray(v) for k, v in after.items()}
    all_before = flatten_params(params)
    moved = [k for k, v in all_after.items()
             if "ffn" not in k
             and not np.array_equal(v, np.asarray(all_before[k]))]
    assert moved


def test_bf16_params_state_roundtrip_is_exact(meshes):
    """Serializing TrainState.opt_state (incl. the f32 master) and
    restoring it must continue training exactly: interrupt-after-2 ==
    straight-4 on fixed batches."""
    import optax
    from flax import serialization

    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.optimizers.master_weights import (cast_params_bf16,
                                                      with_bf16_params)
    from neurst_tpu.parallel import TrainState, make_train_step
    model = _toy_model()
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    tx = with_bf16_params(optax.sgd(0.05))
    host = _batch(seed=9)
    step = jax.jit(make_train_step(model, criterion, tx))

    def fresh_state():
        return TrainState.create(
            cast_params_bf16(model.init_params(jax.random.PRNGKey(0))), tx)

    # straight: 4 steps
    s = fresh_state()
    for _ in range(4):
        s, _ = step(s, host, jax.random.PRNGKey(7))
    straight = jax.tree_util.tree_map(np.asarray, s.params)

    # interrupted: 2 steps -> save (f32 master + optstate bytes) ->
    # restore exactly as the trainer does -> 2 more steps
    s = fresh_state()
    for _ in range(2):
        s, _ = step(s, host, jax.random.PRNGKey(7))
    master_saved = jax.tree_util.tree_map(
        np.asarray, s.opt_state["master"])
    opt_bytes = serialization.to_bytes(
        jax.tree_util.tree_map(np.asarray, s.opt_state))

    s2 = TrainState.create(cast_params_bf16(master_saved), tx)
    restored_opt = serialization.from_bytes(s2.opt_state, opt_bytes)
    s2 = s2.replace(opt_state=restored_opt,
                    step=jnp.asarray(2, jnp.int32))
    for _ in range(2):
        s2, _ = step(s2, host, jax.random.PRNGKey(7))
    resumed = jax.tree_util.tree_map(np.asarray, s2.params)
    assert _max_tree_diff(straight, resumed) == 0.0


def test_grad_accum_with_bf16_params_accumulates_in_f32(meshes):
    """update_cycle>1 with --bf16_params: micro-gradients arrive in
    bf16 (grads inherit the param dtype) but MUST be summed in an f32
    accumulator — a bf16 accumulator rounds away small micro-batch
    contributions before the f32 master ever sees them (regression:
    zeros_like(params) inherited bfloat16)."""
    import optax

    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.optimizers.master_weights import (cast_params_bf16,
                                                      with_bf16_params)
    from neurst_tpu.parallel import TrainState, make_train_step
    model = _toy_model()
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})

    seen = {}

    def probe():
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            seen["dtypes"] = {str(u.dtype) for u in
                              jax.tree_util.tree_leaves(updates)
                              if jnp.issubdtype(u.dtype, jnp.inexact)}
            return updates, state

        return optax.GradientTransformation(init, update)

    # probe OUTSIDE with_bf16_params: it must see the raw accumulated
    # gradients exactly as compute_grads emits them (the wrapper itself
    # casts to f32, which would mask a bf16 accumulator)
    tx = optax.chain(probe(), with_bf16_params(optax.sgd(0.05)))
    params = cast_params_bf16(model.init_params(jax.random.PRNGKey(0)))
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, criterion, tx, update_cycle=4))
    host = _batch(seed=11)
    host = {k: v.reshape((4, -1) + v.shape[1:]) for k, v in host.items()}
    state, metrics = step(state, host, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    # probe sits INSIDE with_bf16_params (it casts to f32 first), so
    # this asserts the whole accumulate->update path is f32
    assert seen["dtypes"] == {"float32"}, seen["dtypes"]
