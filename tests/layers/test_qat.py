"""Quantization-aware training with learned clip-max variables
(parity: reference quant_layers.py:18-207 min/max fake quantization)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

META = {"vocab_size": 16, "eos_id": 15, "bos_id": 15, "unk_id": 14}


@pytest.fixture()
def quant_on():
    from neurst_tpu.layers.quantization.quant_layers import global_init
    global_init(True, quant_bits=8, quant_weight_clip_max=1.0,
                quant_act_clip_max=16.0)
    yield
    global_init(False)


def _model():
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg["dtype"] = "float32"
    return build_model(
        {"model.class": "transformer", "model.params": cfg},
        src_meta=META, trg_meta=META)


def _batch():
    rng = np.random.RandomState(0)
    return {
        "src": rng.randint(3, 14, size=[4, 6]).astype(np.int32),
        "src_padding": np.zeros([4, 6], np.float32),
        "trg_input": rng.randint(3, 14, size=[4, 5]).astype(np.int32),
        "trg": rng.randint(3, 14, size=[4, 5]).astype(np.int32),
        "trg_padding": np.zeros([4, 5], np.float32),
    }


def test_fake_quant_minmax_levels_and_ste():
    from neurst_tpu.layers.quantization.quant_layers import \
        fake_quant_minmax
    x = jnp.linspace(-2.0, 2.0, 101)
    q = fake_quant_minmax(x, -1.0, 1.0, bits=8)
    # clipped to the range and snapped to the uniform grid
    assert float(jnp.max(q)) <= 1.0 + 1e-6
    assert float(jnp.min(q)) >= -1.0 - 1e-6
    scale = 2.0 / 255.0
    snapped = jnp.round((q + 1.0) / scale) * scale - 1.0
    np.testing.assert_allclose(np.asarray(q), np.asarray(snapped),
                               atol=1e-6)
    # straight-through: gradient 1 inside the range, 0 outside
    g = jax.grad(lambda v: jnp.sum(fake_quant_minmax(v, -1., 1., 8)))(x)
    inside = np.abs(np.asarray(x)) < 0.99
    assert np.all(np.asarray(g)[inside] == 1.0)
    assert np.all(np.asarray(g)[np.abs(np.asarray(x)) > 1.01] == 0.0)


def test_quant_model_has_learned_clip_vars(quant_on):
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    from neurst_tpu.utils.checkpoints import flatten_params
    flat = flatten_params(params)
    w_clips = [k for k in flat if k.endswith("kernel_clip_max")]
    a_clips = [k for k in flat if k.endswith("output_clip_max")]
    assert len(w_clips) >= 10, w_clips   # attention + ffn kernels
    assert len(a_clips) >= 10, a_clips
    assert all(float(flat[k]) == 1.0 for k in w_clips)
    assert all(float(flat[k]) == 16.0 for k in a_clips)


def test_clip_vars_receive_gradients(quant_on):
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.layers.quantization.quant_layers import clip_l2_penalty
    from neurst_tpu.utils.checkpoints import flatten_params
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    batch = _batch()

    def loss_fn(p):
        logits = model.call(p, batch, is_training=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return criterion.reduce_loss(batch, logits) + clip_l2_penalty(p)

    grads = jax.grad(loss_fn)(params)
    flat = flatten_params(grads)
    clip_grads = [abs(float(v)) for k, v in flat.items()
                  if k.endswith("_clip_max")]
    assert len(clip_grads) >= 20
    # at least the L2 penalty drives every clip var; most also get
    # boundary gradients from the fake-quant clip
    assert all(g > 0.0 for g in clip_grads)


def test_quantized_tiny_model_trains(quant_on):
    import optax
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.layers.quantization.quant_layers import clip_l2_penalty
    from neurst_tpu.parallel import TrainState, make_train_step
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    tx = optax.adam(1e-2)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, criterion, tx,
                                   extra_loss_fn=clip_l2_penalty))
    batch = _batch()
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_quant_off_param_tree_unchanged():
    """With quantization off the model's parameter tree has no clip
    vars — checkpoints stay byte-compatible with round 1."""
    from neurst_tpu.utils.checkpoints import flatten_params
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    assert not any(k.endswith("_clip_max")
                   for k in flatten_params(params))


def test_qat_forward_in_bfloat16():
    """QAT layers must compose with the production bf16 compute dtype
    (clip vars stay f32; fake-quant runs in f32 then casts back)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neurst_tpu.layers.quantization.quant_layers import (
        QuantDenseGeneral, global_init)
    global_init(True, quant_bits=8)
    try:
        layer = QuantDenseGeneral(features=(1, 2, 4), dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 8),
                        jnp.bfloat16)
        params = layer.init(jax.random.PRNGKey(0), x)
        flat = jax.tree_util.tree_leaves_with_path(params)
        for path, leaf in flat:
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if "clip_max" in name:
                assert leaf.dtype == jnp.float32, name
        out = layer.apply(params, x)
        assert out.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    finally:
        global_init(False)
