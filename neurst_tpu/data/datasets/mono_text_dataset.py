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
"""Monolingual text dataset (parity: neurst/data/datasets/mono_text_dataset.py)."""

import gzip
from typing import Optional

from neurst_tpu.data.datasets.dataset import TextGenDataset, register_dataset
from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.utils.flags_core import Flag

__all__ = ["MonoTextDataset"]


@register_dataset("mono_text")
class MonoTextDataset(TextGenDataset):

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        self._data_file = self._args.get("data_file")
        self._data_is_processed = bool(self._args.get("data_is_processed"))

    @staticmethod
    def class_or_method_args():
        return [
            Flag("data_file", dtype=Flag.TYPE.STRING, default=None,
                 help="The text file."),
            Flag("data_is_processed", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Whether the text is already tokenized."),
        ]

    @property
    def status(self):
        return (DataStatus.PROCESSED if self._data_is_processed
                else DataStatus.RAW)

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        def gen():
            opener = gzip.open if self._data_file.endswith(".gz") else open
            with opener(self._data_file, "rt", encoding="utf-8") as f:
                for idx, line in enumerate(f):
                    if total_shards > 1 and idx % total_shards != shard_id:
                        continue
                    example = {"feature": line.strip()}
                    if map_func is not None:
                        example = map_func(example)
                    if example is not None:
                        yield example
        return gen

    @property
    def targets(self):
        if self._targets is None and self._data_file:
            opener = gzip.open if self._data_file.endswith(".gz") else open
            with opener(self._data_file, "rt", encoding="utf-8") as f:
                self._targets = [line.strip() for line in f]
        return self._targets
