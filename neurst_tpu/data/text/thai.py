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
"""Thai tokenizer (parity: neurst/data/text/thai.py), gated on pythainlp."""

from neurst_tpu.data.text.tokenizer import Tokenizer, register_tokenizer

__all__ = ["ThaiTokenizer"]


@register_tokenizer("thai")
class ThaiTokenizer(Tokenizer):

    def __init__(self, language="th", glossaries=None, **kwargs):
        super().__init__(language=language, glossaries=glossaries)
        try:
            from pythainlp.tokenize import word_tokenize
        except ImportError as e:  # pragma: no cover
            raise ImportError("pythainlp is required for ThaiTokenizer "
                              "but is not installed") from e
        self._word_tokenize = word_tokenize

    def tokenize(self, text, return_str=False):
        tokens = [t for t in self._word_tokenize(self._convert_to_str(text))
                  if t.strip()]
        return self._output_wrapper(tokens, return_str)

    def detokenize(self, text, return_str=True):
        text = self._convert_to_str(text)
        return self._output_wrapper(text.replace(" ", ""), return_str)
