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
"""HuggingFace tokenizer wrapper (parity: neurst/data/text/huggingface_tokenizer.py)."""

from neurst_tpu.data.text.tokenizer import Tokenizer, register_tokenizer

__all__ = ["HuggingFaceTokenizer"]


@register_tokenizer("huggingface", "hf")
class HuggingFaceTokenizer(Tokenizer):

    def __init__(self, language="en", glossaries=None, **kwargs):
        super().__init__(language=language, glossaries=glossaries)
        self._tok = None

    def init_subtokenizer(self, codes):
        """`codes` is a HuggingFace model name or local path."""
        try:
            from transformers import AutoTokenizer
        except ImportError as e:  # pragma: no cover
            raise ImportError("transformers is required for the "
                              "huggingface tokenizer") from e
        self._tok = AutoTokenizer.from_pretrained(codes)

    def tokenize(self, text, return_str=False):
        if self._tok is None:
            raise ValueError("huggingface tokenizer not initialized")
        tokens = self._tok.tokenize(self._convert_to_str(text))
        return self._output_wrapper(tokens, return_str)

    def detokenize(self, text, return_str=True):
        if self._tok is None:
            raise ValueError("huggingface tokenizer not initialized")
        text = self._convert_to_str(text)
        out = self._tok.convert_tokens_to_string(text.split())
        return self._output_wrapper(out, return_str)
