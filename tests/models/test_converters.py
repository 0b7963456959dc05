"""Cross-framework parity: convert HF torch checkpoints into our
parameter tree and compare forward outputs (the reference's strongest
correctness idea — TF-vs-PT tests — applied as torch-vs-JAX)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from neurst_tpu.models.model import build_model  # noqa: E402
from neurst_tpu.utils.checkpoints import restore_into  # noqa: E402


def test_gpt2_hf_parity(tmp_path):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.GPT2Config(
        vocab_size=23, n_positions=64, n_embd=16, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = transformers.GPT2LMHeadModel(cfg)
    hf.eval()
    pt_path = str(tmp_path / "gpt2.bin")
    torch.save(hf.state_dict(), pt_path)

    from neurst_tpu.utils.converters.converter import build_converter
    conv = build_converter({"converter.class": "openai_gpt2",
                            "converter.params": {"num_heads": 2}})
    flat = conv.convert_to_flat(pt_path)

    meta = {"vocab_size": 23, "eos_id": 22, "bos_id": 22, "unk_id": 21}
    model = build_model({"model.class": "gpt2", "model.params": {
        "num_layers": 2, "hidden_size": 16, "num_attention_heads": 2,
        "filter_size": 64, "max_positions": 64, "dropout_rate": 0.0,
        "dtype": "float32"}}, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))
    params, restored, missing = restore_into(params, flat)
    assert not missing, missing

    ids = np.array([[5, 7, 9, 11, 2], [1, 3, 2, 8, 4]], np.int64)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.call(params, {"trg_input": ids.astype(np.int32)}))
    diff = float(np.max(np.abs(ours - hf_logits)))
    assert diff < 5e-4, diff


def test_bert_hf_parity(tmp_path):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.BertConfig(
        vocab_size=29, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = transformers.BertModel(cfg)
    hf.eval()
    pt_path = str(tmp_path / "bert.bin")
    torch.save(hf.state_dict(), pt_path)

    from neurst_tpu.utils.converters.converter import build_converter
    conv = build_converter({"converter.class": "google_bert",
                            "converter.params": {"num_heads": 2}})
    flat = conv.convert_to_flat(pt_path)

    model = build_model({"model.class": "bert", "model.params": {
        "num_layers": 2, "hidden_size": 16, "num_attention_heads": 2,
        "filter_size": 64, "max_positions": 64, "dropout_rate": 0.0,
        "dtype": "float32"}}, src_meta={"vocab_size": 29})
    params = model.init_params(jax.random.PRNGKey(0))
    params, restored, missing = restore_into(params, flat)
    assert not missing, missing

    ids = np.array([[2, 5, 7, 9], [4, 6, 8, 1]], np.int64)
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids)).last_hidden_state.numpy()
    out = model.call(params, {"src": ids.astype(np.int32),
                              "src_padding": np.zeros([2, 4], np.float32)})
    ours = np.asarray(out["encoder_outputs"])
    diff = float(np.max(np.abs(ours - hf_out)))
    assert diff < 5e-4, diff


def test_wav2vec2_hf_parity(tmp_path):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[512] * 7,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, activation_dropout=0.0)
    hf = transformers.Wav2Vec2Model(cfg)
    hf.eval()
    pt_path = str(tmp_path / "w2v2.bin")
    torch.save(hf.state_dict(), pt_path)

    from neurst_tpu.utils.converters.converter import build_converter
    conv = build_converter({"converter.class": "fairseq_wav2vec2",
                            "converter.params": {"num_heads": 2}})
    flat = conv.convert_to_flat(pt_path)

    model = build_model({"model.class": "wav2vec2", "model.params": {
        "num_layers": 2, "hidden_size": 32, "num_attention_heads": 2,
        "filter_size": 64, "dropout_rate": 0.0, "dtype": "float32"}})
    params = model.init_params(jax.random.PRNGKey(0))
    params, restored, missing = restore_into(params, flat)
    assert not missing, missing

    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.tensor(wav)).last_hidden_state.numpy()
    out = model.call(params, {"src": wav})
    ours = np.asarray(out["encoder_outputs"])
    assert ours.shape == hf_out.shape, (ours.shape, hf_out.shape)
    diff = float(np.max(np.abs(ours - hf_out)))
    assert diff < 5e-3, diff
