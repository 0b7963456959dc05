"""fairseq converter layout coverage: the OLD fused-``in_proj`` layout
(reference converter fairseq_transformer.py:140-181) and the NEW
separate-q/k/v layout (reference fairseq_transformer2.py:1) must
convert to identical parameters, and both registry names must resolve.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")

D, HEADS, FFN, VOCAB, LAYERS = 8, 2, 10, 24, 2


def _new_layout_sd(rng):
    sd = {}
    for side in ("encoder", "decoder"):
        sd[f"{side}.embed_tokens.weight"] = rng.randn(VOCAB, D)
        sd[f"{side}.layer_norm.weight"] = rng.randn(D)
        sd[f"{side}.layer_norm.bias"] = rng.randn(D)
        for i in range(LAYERS):
            p = f"{side}.layers.{i}"
            for proj in ("q", "k", "v"):
                sd[f"{p}.self_attn.{proj}_proj.weight"] = rng.randn(D, D)
                sd[f"{p}.self_attn.{proj}_proj.bias"] = rng.randn(D)
            sd[f"{p}.self_attn.out_proj.weight"] = rng.randn(D, D)
            sd[f"{p}.self_attn.out_proj.bias"] = rng.randn(D)
            sd[f"{p}.self_attn_layer_norm.weight"] = rng.randn(D)
            sd[f"{p}.self_attn_layer_norm.bias"] = rng.randn(D)
            if side == "decoder":
                for proj in ("q", "k", "v"):
                    sd[f"{p}.encoder_attn.{proj}_proj.weight"] = \
                        rng.randn(D, D)
                    sd[f"{p}.encoder_attn.{proj}_proj.bias"] = rng.randn(D)
                sd[f"{p}.encoder_attn.out_proj.weight"] = rng.randn(D, D)
                sd[f"{p}.encoder_attn.out_proj.bias"] = rng.randn(D)
                sd[f"{p}.encoder_attn_layer_norm.weight"] = rng.randn(D)
                sd[f"{p}.encoder_attn_layer_norm.bias"] = rng.randn(D)
            sd[f"{p}.fc1.weight"] = rng.randn(FFN, D)
            sd[f"{p}.fc1.bias"] = rng.randn(FFN)
            sd[f"{p}.fc2.weight"] = rng.randn(D, FFN)
            sd[f"{p}.fc2.bias"] = rng.randn(D)
            sd[f"{p}.final_layer_norm.weight"] = rng.randn(D)
            sd[f"{p}.final_layer_norm.bias"] = rng.randn(D)
    return {k: v.astype(np.float32) for k, v in sd.items()}


def _old_layout_sd(new_sd):
    """Fuses q/k/v into in_proj_* (the pre-0.9 fairseq layout)."""
    sd = dict(new_sd)
    bases = {k.rsplit(".", 2)[0] for k in new_sd
             if ".q_proj.weight" in k}
    for base in bases:
        sd[f"{base}.in_proj_weight"] = np.concatenate(
            [sd.pop(f"{base}.{p}_proj.weight")
             for p in ("q", "k", "v")], axis=0)
        sd[f"{base}.in_proj_bias"] = np.concatenate(
            [sd.pop(f"{base}.{p}_proj.bias")
             for p in ("q", "k", "v")], axis=0)
    return sd


@pytest.mark.parametrize("name", ["fairseq_transformer",
                                  "fairseq_transformer2"])
def test_both_layouts_convert_identically(tmp_path, name):
    from neurst_tpu.utils.converters.converter import build_converter
    rng = np.random.RandomState(0)
    new_sd = _new_layout_sd(rng)
    old_sd = _old_layout_sd(new_sd)
    new_path = str(tmp_path / "new.pt")
    old_path = str(tmp_path / "old.pt")
    torch.save({"model": {k: torch.tensor(v) for k, v in new_sd.items()}},
               new_path)
    torch.save({"model": {k: torch.tensor(v) for k, v in old_sd.items()}},
               old_path)

    conv = build_converter({"converter.class": name,
                            "converter.params": {"num_heads": HEADS}})
    flat_new = conv.convert_to_flat(new_path)
    flat_old = conv.convert_to_flat(old_path)
    assert set(flat_new) == set(flat_old)
    for k in flat_new:
        np.testing.assert_array_equal(flat_new[k], flat_old[k], err_msg=k)

    # the converted names load into the real model parameterization
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.utils.checkpoints import flatten_params, restore_into
    meta = {"vocab_size": VOCAB, "eos_id": 22, "bos_id": 22, "unk_id": 21}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    model = build_model({"model.class": "transformer", "model.params": cfg},
                        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))
    restored, matched, missing = restore_into(params, flat_new)
    model_names = set(flatten_params(params))
    # everything except the softmax bias (absent in fairseq) restores
    assert set(missing) <= {"target_symbol_modality/bias"}, missing
    assert set(flat_new) <= model_names
    got = flatten_params(restored)
    np.testing.assert_array_equal(
        got["encoder/layer_0/self_attention/qkv_transform/kernel"],
        flat_new["encoder/layer_0/self_attention/qkv_transform/kernel"])
