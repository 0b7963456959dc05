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
"""Multi-corpus datasets for (multilingual) training.

Parity: /root/reference/neurst/data/datasets/mixed_train_dataset.py and
``MultipleDataset`` — named sub-datasets mixed by a DataSampler
(explicit or temperature-based ratios); examples are tagged with their
source dataset key so multilingual tasks can add language tags.
"""

import random
from typing import Dict, Optional

import yaml

from neurst_tpu.data.datasets.data_sampler import build_data_sampler
from neurst_tpu.data.datasets.dataset import (Dataset, build_dataset,
                                              register_dataset)
from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["MixedTrainDataset", "MultipleDataset"]


@register_dataset("mixed_train", "MixedTrainDataset")
class MixedTrainDataset(Dataset):
    """Infinite mixture over named sub-datasets."""

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        data_files = self._args.get("data_files") or {}
        if isinstance(data_files, str):
            data_files = yaml.safe_load(data_files)
        common_cls = self._args.get("dataset_class") or "parallel_text"
        self._datasets: Dict[str, Dataset] = {}
        for name, params in data_files.items():
            if isinstance(params, dict) and "dataset.class" in params:
                self._datasets[name] = build_dataset(params)
            else:
                self._datasets[name] = build_dataset(
                    {"dataset.class": common_cls,
                     "dataset.params": params})
        sampler_cls = self._args.get("data_sampler.class")
        self._sampler = build_data_sampler(
            {"data_sampler.class": sampler_cls or "data_sampler",
             "data_sampler.params":
                 self._args.get("data_sampler.params") or {}})
        self._seed = self._args.get("seed") or 0

    @staticmethod
    def class_or_method_args():
        return [
            Flag("data_files", dtype=Flag.TYPE.STRING, default=None,
                 help="A dict of name -> sub-dataset params."),
            Flag("dataset_class", dtype=Flag.TYPE.STRING,
                 default="parallel_text",
                 help="The dataset class for the data files."),
            ModuleFlag("data_sampler", "data_sampler",
                       help="The cross-corpus sampling strategy."),
            Flag("seed", dtype=Flag.TYPE.INTEGER, default=0,
                 help="The sampling random seed."),
        ]

    @property
    def datasets(self):
        return self._datasets

    @property
    def status(self):
        statuses = {ds.status for ds in self._datasets.values()}
        return statuses.pop() if len(statuses) == 1 else DataStatus.RAW

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        """Samples a sub-dataset per example; sub-iterators restart when
        exhausted (infinite mixture, parity mixed_train_dataset.py:92+)."""
        sizes = {}
        for name, ds in self._datasets.items():
            try:
                sizes[name] = ds.num_samples or 1
            except Exception:
                sizes[name] = 1
        ratios = self._sampler.normalized_ratios(sizes)
        unknown = set(ratios) - set(self._datasets)
        if unknown:
            raise ValueError(
                f"data_sampler ratios name unknown sub-datasets {unknown}; "
                f"known: {sorted(self._datasets)}")
        names = sorted(ratios.keys())
        weights = [ratios[n] for n in names]

        def gen():
            rng = random.Random(self._seed + shard_id)
            iters = {}
            empty = set()
            while True:
                name = rng.choices(names, weights=weights, k=1)[0]
                if name in empty:
                    continue
                if name not in iters:
                    iters[name] = self._datasets[name].build_iterator(
                        shard_id=shard_id, total_shards=total_shards)()
                try:
                    example = next(iters[name])
                except StopIteration:
                    iters[name] = self._datasets[name].build_iterator(
                        shard_id=shard_id, total_shards=total_shards)()
                    try:
                        example = next(iters[name])
                    except StopIteration:
                        empty.add(name)
                        if len(empty) == len(names):
                            raise RuntimeError(
                                "All sub-datasets of MixedTrainDataset are "
                                f"empty: {sorted(names)}")
                        continue
                example = dict(example)
                example.setdefault("dataset_key", name)
                if map_func is not None:
                    example = map_func(example)
                if example is not None:
                    yield example
        return gen

    @property
    def num_samples(self):
        return None  # infinite


@register_dataset("multiple_datasets", "MultipleDataset")
class MultipleDataset(Dataset):
    """Finite union of named sub-datasets with per-dataset weights
    (used by multi-dataset evaluation, parity: MultipleDataset)."""

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        multiple = self._args.get("multiple_datasets") or {}
        if isinstance(multiple, str):
            multiple = yaml.safe_load(multiple)
        self._datasets = {name: build_dataset(params)
                          for name, params in multiple.items()}
        weights = self._args.get("sample_weights") or {}
        if isinstance(weights, str):
            weights = yaml.safe_load(weights)
        total = sum(weights.get(n, 1.0) for n in self._datasets)
        self._sample_weights = {n: weights.get(n, 1.0) / total
                                for n in self._datasets}

    @staticmethod
    def class_or_method_args():
        return [
            Flag("multiple_datasets", dtype=Flag.TYPE.STRING, default=None,
                 help="A dict of name -> {dataset.class, dataset.params}."),
            Flag("sample_weights", dtype=Flag.TYPE.STRING, default=None,
                 help="A dict of name -> metric weight."),
        ]

    @property
    def datasets(self):
        return self._datasets

    @property
    def sample_weights(self):
        return self._sample_weights

    @property
    def status(self):
        statuses = {ds.status for ds in self._datasets.values()}
        return statuses.pop() if len(statuses) == 1 else DataStatus.RAW

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        def gen():
            for name in sorted(self._datasets):
                it = self._datasets[name].build_iterator(
                    shard_id=shard_id, total_shards=total_shards)()
                for example in it:
                    example = dict(example)
                    example.setdefault("dataset_key", name)
                    if map_func is not None:
                        example = map_func(example)
                    if example is not None:
                        yield example
        return gen
