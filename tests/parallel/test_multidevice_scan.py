"""scan-over-layers models on the virtual 8-CPU mesh: the stacked
parameter layout (leading "layers" partition axis, never sharded) must
compose with the dp/tp shardings exactly like the per-layer layout."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tests.parallel.test_multidevice import (_batch, _max_tree_diff,  # noqa: E402
                                             _run_steps)

META = {"vocab_size": 24, "eos_id": 22, "bos_id": 22, "unk_id": 21}


def _scan_model():
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    args = Transformer.build_model_args_by_name("transformer_toy")
    cfg = dict(args["model.params"])
    cfg["dtype"] = "float32"
    for prefix in ("encoder", "decoder"):
        cfg[f"{prefix}.attention_dropout_rate"] = 0.0
        cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
        cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
        cfg[f"{prefix}.scan_layers"] = True
    return build_model({"model.class": "transformer", "model.params": cfg},
                       src_meta=META, trg_meta=META)


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


def test_tp2_forward_matches_unsharded_with_scan_layers(meshes):
    """Tensor-parallel forward of a scan-scan (encoder AND decoder)
    model == unsharded; the stacked axis stays unsharded while the
    heads/ffn axes shard over "model"."""
    from neurst_tpu.parallel import params_shardings
    from neurst_tpu.parallel.utils import put_batch
    model = _scan_model()
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

    # the tp axis shards some STACKED parameter, and no sharding ever
    # touches the leading layer axis (spec position 0 must be None)
    flat = jax.tree_util.tree_leaves_with_path(
        p_shard, is_leaf=lambda s: hasattr(s, "spec"))
    stacked = [(path, s) for path, s in flat
               if "layers" in jax.tree_util.keystr(path)
               and "layer" in jax.tree_util.keystr(path)]
    assert stacked
    assert any("model" in str(s.spec) for _, s in stacked)
    for path, s in stacked:
        if len(s.spec) > 0:
            assert s.spec[0] is None, (jax.tree_util.keystr(path), s.spec)


def test_dp8_train_matches_single_device_with_scan_layers(meshes):
    """dp=8 sharded train steps of the scan-scan model == single-device
    steps (loss trajectory + final params)."""
    model = _scan_model()
    losses8, params8 = _run_steps(model, meshes["dp8"], n_steps=3)
    losses1, params1 = _run_steps(model, meshes["single"], n_steps=3)
    np.testing.assert_allclose(losses8, losses1, rtol=0, atol=1e-5)
    assert _max_tree_diff(params8, params1) < 1e-5
