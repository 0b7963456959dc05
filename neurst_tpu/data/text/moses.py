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
"""Moses tokenizer via sacremoses (parity: neurst/data/text/moses_tokenizer.py)."""

from neurst_tpu.data.text.tokenizer import Tokenizer, register_tokenizer

__all__ = ["MosesTokenizer"]

try:
    import sacremoses
    _HAS_SACREMOSES = True
except ImportError:  # pragma: no cover
    _HAS_SACREMOSES = False


@register_tokenizer("moses")
class MosesTokenizer(Tokenizer):

    def __init__(self, language="en", glossaries=None,
                 aggressive_dash_splits=False, escape=False, **kwargs):
        super().__init__(language=language, glossaries=glossaries)
        if not _HAS_SACREMOSES:
            raise ImportError(
                "sacremoses is required for MosesTokenizer")
        self._tok = sacremoses.MosesTokenizer(lang=language)
        self._detok = sacremoses.MosesDetokenizer(lang=language)
        self._aggressive = aggressive_dash_splits
        self._escape = escape

    def tokenize(self, text, return_str=False):
        text = self._convert_to_str(text)
        tokens = self._tok.tokenize(
            text, aggressive_dash_splits=self._aggressive,
            return_str=False, escape=self._escape,
            protected_patterns=self._glossaries or None)
        return self._output_wrapper(tokens, return_str)

    def detokenize(self, text, return_str=True):
        text = self._convert_to_str(text)
        out = self._detok.detokenize(text.split(), return_str=True)
        return self._output_wrapper(out, return_str)
