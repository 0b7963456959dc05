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
"""SentencePiece tokenizer (parity: /root/reference/neurst/data/text/spm.py).

Gated on the ``sentencepiece`` package; raises a clear error at
construction time if unavailable.
"""

from neurst_tpu.data.text.tokenizer import Tokenizer, register_tokenizer

__all__ = ["SentencePieceTokenizer"]

try:
    import sentencepiece as _spm
    _HAS_SPM = True
except ImportError:  # pragma: no cover
    _HAS_SPM = False


@register_tokenizer("spm", "sentencepiece")
class SentencePieceTokenizer(Tokenizer):

    def __init__(self, language="en", glossaries=None, **kwargs):
        super().__init__(language=language, glossaries=glossaries)
        if not _HAS_SPM:
            raise ImportError(
                "The `sentencepiece` package is required for the spm "
                "tokenizer but is not installed in this environment.")
        self._sp = None

    def init_subtokenizer(self, codes):
        """`codes` is the path to a trained .model file."""
        self._sp = _spm.SentencePieceProcessor()
        self._sp.Load(codes)

    def tokenize(self, text, return_str=False):
        if self._sp is None:
            raise ValueError("spm model not initialized")
        pieces = self._sp.EncodeAsPieces(self._convert_to_str(text))
        return self._output_wrapper(pieces, return_str)

    def detokenize(self, text, return_str=True):
        if self._sp is None:
            raise ValueError("spm model not initialized")
        text = self._convert_to_str(text)
        out = self._sp.DecodePieces(text.split())
        return self._output_wrapper(out, return_str)
