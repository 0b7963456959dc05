"""Tokenizer round-trip tests (parity strategy:
tests/neurst/data/text/*_test.py)."""

import pytest

from neurst_tpu.data.text.tokenizer import build_tokenizer_by_name


def test_moses_roundtrip():
    pytest.importorskip("sacremoses")
    tok = build_tokenizer_by_name("moses", language="en")
    text = "Hello, world! It's a test."
    tokens = tok.tokenize(text, return_str=True)
    assert "," in tokens.split()
    detok = tok.detokenize(tokens)
    assert detok == text


def test_character_cjk():
    tok = build_tokenizer_by_name("character", language="zh")
    out = tok.tokenize("你好 世界", return_str=False)
    assert out == ["你", "好", "世", "界"]
    assert tok.detokenize(" ".join(out)) == "你好世界"


def test_character_en_space_token():
    tok = build_tokenizer_by_name("character", language="en")
    out = tok.tokenize("ab c", return_str=False)
    assert out == ["a", "b", "<SPACE>", "c"]
    assert tok.detokenize(" ".join(out)) == "ab c"


def test_jieba_segmentation():
    pytest.importorskip("jieba")
    tok = build_tokenizer_by_name("jieba", language="zh")
    out = tok.tokenize("我爱北京天安门", return_str=False)
    assert len(out) >= 2
    assert tok.detokenize(" ".join(out)) == "我爱北京天安门"


def test_bpe_glossaries():
    from neurst_tpu.data.text.bpe import BPE
    bpe = BPE(glossaries=["NeurST"])
    bpe.init_subtokenizer(["#version: 0.2", "N e", "Ne u"])
    toks = bpe.tokenize("NeurST", return_str=False)
    assert toks == ["NeurST"]  # glossary never split


def test_subtokenizer_reserved_and_escape():
    from neurst_tpu.data.text.subtokenizer import Subtokenizer
    st = Subtokenizer.build_from_corpus(
        ["abc def abc"] * 10, target_vocab_size=30, num_iterations=2)
    text = "abc_def\\x"
    rt = st.detokenize(st.tokenize(text, return_str=True))
    assert rt == text  # underscores and backslashes escape correctly


def test_cjk_deseg():
    from neurst_tpu.data.text.tokenizer import Tokenizer
    assert Tokenizer.cjk_deseg("你 好 world 世 界") == "你好 world 世界"
