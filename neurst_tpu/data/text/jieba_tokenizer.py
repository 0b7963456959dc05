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
"""Jieba zh segmentation (parity: neurst/data/text/jieba_segment.py)."""

from neurst_tpu.data.text.tokenizer import Tokenizer, register_tokenizer

__all__ = ["JiebaTokenizer"]

try:
    import jieba
    _HAS_JIEBA = True
except ImportError:  # pragma: no cover
    _HAS_JIEBA = False


@register_tokenizer("jieba", "jieba_segment")
class JiebaTokenizer(Tokenizer):

    def __init__(self, language="zh", glossaries=None, **kwargs):
        super().__init__(language=language, glossaries=glossaries)
        if not _HAS_JIEBA:
            raise ImportError("jieba is required for JiebaTokenizer")
        for g in self._glossaries:
            jieba.add_word(g)

    def tokenize(self, text, return_str=False):
        text = self._convert_to_str(text)
        tokens = [t for t in jieba.cut(text) if t.strip()]
        return self._output_wrapper(tokens, return_str)

    def detokenize(self, text, return_str=True):
        text = self._convert_to_str(text)
        return self._output_wrapper(self.cjk_deseg(text), return_str)
