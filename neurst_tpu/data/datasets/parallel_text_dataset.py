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
"""Parallel text datasets.

Parity: /root/reference/neurst/data/datasets/parallel_text_dataset.py
(``ParallelTextDataset``, ``MultipleParallelTextDataset``,
``InMemoryParallelTextDataset``, and the record-backed variant in
``neurst_tpu/data/datasets/record_text_dataset.py``).
Examples are dicts with "feature"/"label" fields.
"""

import gzip
from typing import Optional

from neurst_tpu.data.datasets.dataset import (Dataset, TextGenDataset,
                                              register_dataset)
from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.configurable import flatten_string_list

__all__ = ["AbstractParallelDataset", "ParallelTextDataset",
           "MultipleParallelTextDataset", "InMemoryParallelTextDataset"]


def _open_maybe_gz(path):
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, "r", encoding="utf-8")


class AbstractParallelDataset(TextGenDataset):
    """Parallel corpus: feature (source text) + label (target text)."""

    @property
    def sources(self):
        """Raw source texts (for logging / cascades)."""
        return None


@register_dataset("parallel_text")
class ParallelTextDataset(AbstractParallelDataset):

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        self._src_file = self._args.get("src_file")
        self._trg_file = self._args.get("trg_file")
        self._data_is_processed = bool(self._args.get("data_is_processed"))
        self._sources = None

    @staticmethod
    def class_or_method_args():
        return [
            Flag("src_file", dtype=Flag.TYPE.STRING, default=None,
                 help="The source-side text file."),
            Flag("trg_file", dtype=Flag.TYPE.STRING, default=None,
                 help="The target-side text file."),
            Flag("data_is_processed", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Whether the text data is already tokenized."),
        ]

    @property
    def status(self):
        return (DataStatus.PROCESSED if self._data_is_processed
                else DataStatus.RAW)

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        if not self._src_file:
            raise ValueError("`src_file` must be provided for ParallelTextDataset.")

        def gen():
            fsrc = _open_maybe_gz(self._src_file)
            ftrg = _open_maybe_gz(self._trg_file) if self._trg_file else None
            try:
                idx = 0
                while True:
                    src = fsrc.readline()
                    if not src:
                        break
                    trg = ftrg.readline() if ftrg else None
                    if total_shards > 1 and idx % total_shards != shard_id:
                        idx += 1
                        continue
                    idx += 1
                    example = {"feature": src.strip()}
                    if trg is not None:
                        example["label"] = trg.strip()
                    if map_func is not None:
                        example = map_func(example)
                    if example is not None:
                        yield example
            finally:
                fsrc.close()
                if ftrg:
                    ftrg.close()
        return gen

    @property
    def sources(self):
        if self._sources is None and self._src_file:
            with _open_maybe_gz(self._src_file) as f:
                self._sources = [line.strip() for line in f]
        return self._sources

    @property
    def targets(self):
        if self._targets is None and self._trg_file:
            with _open_maybe_gz(self._trg_file) as f:
                self._targets = [line.strip() for line in f]
        return self._targets


@register_dataset("multiple_parallel_text")
class MultipleParallelTextDataset(AbstractParallelDataset):
    """Concatenation of multiple parallel corpora (src/trg file lists)."""

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        self._src_files = flatten_string_list(self._args.get("src_files"))
        self._trg_files = flatten_string_list(self._args.get("trg_files"))
        self._data_is_processed = bool(self._args.get("data_is_processed"))
        if self._trg_files and len(self._src_files) != len(self._trg_files):
            raise ValueError("src_files and trg_files must pair up.")

    @staticmethod
    def class_or_method_args():
        return [
            Flag("src_files", dtype=Flag.TYPE.STRING, default=None, multiple=True,
                 help="The source-side text files."),
            Flag("trg_files", dtype=Flag.TYPE.STRING, default=None, multiple=True,
                 help="The target-side text files."),
            Flag("data_is_processed", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Whether the text data is already tokenized."),
        ]

    @property
    def status(self):
        return (DataStatus.PROCESSED if self._data_is_processed
                else DataStatus.RAW)

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        def gen():
            idx = 0
            for i, src_file in enumerate(self._src_files):
                trg_file = self._trg_files[i] if self._trg_files else None
                fsrc = _open_maybe_gz(src_file)
                ftrg = _open_maybe_gz(trg_file) if trg_file else None
                try:
                    while True:
                        src = fsrc.readline()
                        if not src:
                            break
                        trg = ftrg.readline() if ftrg else None
                        if total_shards > 1 and idx % total_shards != shard_id:
                            idx += 1
                            continue
                        idx += 1
                        example = {"feature": src.strip()}
                        if trg is not None:
                            example["label"] = trg.strip()
                        if map_func is not None:
                            example = map_func(example)
                        if example is not None:
                            yield example
                finally:
                    fsrc.close()
                    if ftrg:
                        ftrg.close()
        return gen

    @property
    def targets(self):
        if self._targets is None and self._trg_files:
            targets = []
            for trg_file in self._trg_files:
                with _open_maybe_gz(trg_file) as f:
                    targets.extend(line.strip() for line in f)
            self._targets = targets
        return self._targets


@register_dataset("in_memory_parallel_text")
class InMemoryParallelTextDataset(AbstractParallelDataset):
    """A parallel corpus held in memory (lists of strings)."""

    def __init__(self, args_or_src=None, trg_list=None, data_is_processed=False):
        if isinstance(args_or_src, dict) and "src_list" not in args_or_src:
            args = args_or_src
            src_list = args.get("src_list")
            trg_list = args.get("trg_list")
            data_is_processed = bool(args.get("data_is_processed"))
        else:
            src_list = args_or_src
            args = {"src_list": src_list, "trg_list": trg_list,
                    "data_is_processed": data_is_processed}
        super().__init__(args)
        self._src_list = list(src_list or [])
        self._trg_list = list(trg_list) if trg_list else None
        self._data_is_processed = data_is_processed

    @property
    def status(self):
        return (DataStatus.PROCESSED if self._data_is_processed
                else DataStatus.RAW)

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        def gen():
            for idx, src in enumerate(self._src_list):
                if total_shards > 1 and idx % total_shards != shard_id:
                    continue
                example = {"feature": src}
                if self._trg_list is not None:
                    example["label"] = self._trg_list[idx]
                if map_func is not None:
                    example = map_func(example)
                if example is not None:
                    yield example
        return gen

    @property
    def sources(self):
        return self._src_list

    @property
    def targets(self):
        if self._targets is None:
            self._targets = self._trg_list
        return self._targets

    @property
    def num_samples(self):
        return len(self._src_list)


@register_dataset("multilingual_translation_dataset")
class MultilingualTranslationDataset(ParallelTextDataset):
    """A parallel corpus tagged with its language direction.

    Parity: neurst/data/datasets/multilingual_translation_dataset.py —
    examples carry ``src_lang``/``trg_lang`` for the multilingual task
    (combine several directions with ``mixed_train``).
    """

    def __init__(self, args=None):
        super().__init__(args)
        self._src_lang = self._args.get("src_lang")
        self._trg_lang = self._args.get("trg_lang")

    @staticmethod
    def class_or_method_args():
        return ParallelTextDataset.class_or_method_args() + [
            Flag("src_lang", dtype=Flag.TYPE.STRING, default=None,
                 help="The source language code."),
            Flag("trg_lang", dtype=Flag.TYPE.STRING, default=None,
                 help="The target language code."),
        ]

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        base_iter = super().build_iterator(None, shard_id, total_shards)

        def gen():
            for example in base_iter():
                example = dict(example)
                example["src_lang"] = self._src_lang
                example["trg_lang"] = self._trg_lang
                if map_func is not None:
                    example = map_func(example)
                if example is not None:
                    yield example
        return gen
