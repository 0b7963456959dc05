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
"""DataPipeline base: raw sample <-> model features.

Parity: /root/reference/neurst/data/data_pipelines/data_pipeline.py
(``encode``/``decode``/``preprocess``/``postprocess`` + punctuation
normalization helper).
"""

import re

from neurst_tpu.utils.registry import setup_registry

__all__ = ["DataPipeline", "build_data_pipeline", "register_data_pipeline"]


class DataPipeline(object):
    """Converts one raw data sample to projected features and back."""

    def __init__(self, **kwargs):
        self._config = dict(kwargs)

    @property
    def config(self):
        return self._config

    @property
    def meta(self) -> dict:
        """Vocabulary/feature metadata (vocab_size, eos_id, ...)."""
        return {}

    def preprocess(self, input):
        """RAW -> PROCESSED (e.g. tokenization)."""
        return input

    def postprocess(self, input):
        """PROCESSED -> RAW (e.g. detokenization)."""
        return input

    def encode(self, input, is_processed=False):
        """RAW/PROCESSED -> PROJECTED (token ids / feature arrays)."""
        raise NotImplementedError

    def decode(self, input):
        """PROJECTED -> RAW (recovered text)."""
        raise NotImplementedError

    @staticmethod
    def text_pre_normalize(language, text, is_processed=False):
        """Light punctuation/whitespace normalization applied before
        tokenization (parity with the reference helper)."""
        if is_processed or not isinstance(text, str):
            return text
        text = text.replace(" ", " ").replace(" ", " ")
        text = re.sub(r"\s+", " ", text).strip()
        return text


def _create_pipeline(cls, args, **kwargs):
    args = dict(args or {})
    args.update(kwargs)
    return cls(**args)


build_data_pipeline, register_data_pipeline = setup_registry(
    "data_pipeline", base_class=DataPipeline, create_fn=_create_pipeline)
