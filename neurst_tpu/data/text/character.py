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
"""Character tokenizer (parity: /root/reference/neurst/data/text/character.py).

For CJK languages each character becomes a token; for space-delimited
languages, spaces are mapped to a visible token so they round-trip.
"""

from neurst_tpu.data.text.tokenizer import Tokenizer, register_tokenizer

__all__ = ["CharacterTokenizer"]

_SPACE_TOKEN = "<SPACE>"


@register_tokenizer("character", "char")
class CharacterTokenizer(Tokenizer):

    def __init__(self, language="en", glossaries=None, **kwargs):
        super().__init__(language=language, glossaries=glossaries)

    def tokenize(self, text, return_str=False):
        text = self._convert_to_str(text).strip()
        chars = []
        for ch in text:
            if ch == " ":
                if self._language in ("zh", "ja", "ko"):
                    continue
                chars.append(_SPACE_TOKEN)
            else:
                chars.append(ch)
        return self._output_wrapper(chars, return_str)

    def detokenize(self, text, return_str=True):
        text = self._convert_to_str(text)
        tokens = text.split()
        out = "".join(" " if t == _SPACE_TOKEN else t for t in tokens)
        return self._output_wrapper(out, return_str)
