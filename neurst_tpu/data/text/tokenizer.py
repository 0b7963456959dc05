# Copyright 2026 The NeurST-TPU Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
"""Tokenizer abstraction + registry.

Parity: /root/reference/neurst/data/text/tokenizer.py (base class with
``tokenize``/``detokenize``/``init_subtokenizer`` and CJK-aware
de-segmentation helpers).
"""

import re
from typing import List, Union

from neurst_tpu.utils.registry import setup_registry

__all__ = ["Tokenizer", "build_tokenizer", "register_tokenizer"]


class Tokenizer(object):
    """Base tokenizer. Subclasses implement tokenize/detokenize."""

    def __init__(self, language="en", glossaries=None, **kwargs):
        self._language = language
        self._glossaries = glossaries or []

    @property
    def language(self):
        return self._language

    def init_subtokenizer(self, codes):
        """Initializes subword codes (BPE merges, spm model, ...)."""
        pass

    def tokenize(self, text, return_str=False):
        raise NotImplementedError

    def detokenize(self, text, return_str=True):
        raise NotImplementedError

    @staticmethod
    def _output_wrapper(tokens: Union[str, List[str]], return_str: bool):
        if isinstance(tokens, str):
            return tokens if return_str else tokens.split()
        return " ".join(tokens) if return_str else tokens

    @staticmethod
    def _convert_to_str(text: Union[str, List[str]]) -> str:
        if isinstance(text, list):
            return " ".join(text)
        return text

    @staticmethod
    def cjk_deseg(text: str) -> str:
        """Removes spaces between CJK characters (for zh/ja detok)."""
        def _is_cjk(ch):
            code = ord(ch)
            return (0x4E00 <= code <= 0x9FFF or 0x3400 <= code <= 0x4DBF
                    or 0xF900 <= code <= 0xFAFF or 0x3000 <= code <= 0x303F
                    or 0xFF00 <= code <= 0xFFEF or 0x30A0 <= code <= 0x30FF
                    or 0x3040 <= code <= 0x309F)
        out = []
        chars = list(text)
        for i, ch in enumerate(chars):
            if ch == " ":
                prev_c = chars[i - 1] if i > 0 else ""
                next_c = chars[i + 1] if i + 1 < len(chars) else ""
                if prev_c and next_c and _is_cjk(prev_c) and _is_cjk(next_c):
                    continue
            out.append(ch)
        return "".join(out)


def _create_tokenizer(cls, args, **kwargs):
    args = dict(args or {})
    args.update(kwargs)
    return cls(**args)


build_tokenizer, register_tokenizer = setup_registry(
    "tokenizer", base_class=Tokenizer, create_fn=_create_tokenizer)


def build_tokenizer_by_name(name, **kwargs):
    """Builds a tokenizer from a bare name (None passes through)."""
    if name is None:
        return None
    if isinstance(name, Tokenizer):
        return name
    if isinstance(name, dict):
        return build_tokenizer(name, **kwargs)
    return build_tokenizer({"tokenizer.class": name, "tokenizer.params": {}},
                           **kwargs)
