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
"""Multi-corpus sampling strategies.

Parity: /root/reference/neurst/data/datasets/data_sampler/ —
``DataSampler`` (explicit ratios) and ``TemperatureSampler``
(ratio_i ∝ size_i^(1/T)) for unbalanced multilingual training.
"""

from typing import Dict

import yaml

from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.registry import setup_registry

__all__ = ["DataSampler", "TemperatureSampler", "build_data_sampler"]


class DataSampler(object):
    """Samples a dataset key according to normalized weights."""

    def __init__(self, args=None):
        self._args = dict(args or {})
        ratios = self._args.get("sample_ratios")
        if isinstance(ratios, str):
            ratios = yaml.safe_load(ratios)
        self._sample_ratios: Dict[str, float] = dict(ratios or {})

    @staticmethod
    def class_or_method_args():
        return [Flag("sample_ratios", dtype=Flag.TYPE.STRING, default=None,
                     help="A dict of dataset-name -> sampling weight.")]

    def get_sample_ratios(self, sample_sizes: Dict[str, int]
                          ) -> Dict[str, float]:
        if self._sample_ratios:
            return dict(self._sample_ratios)
        return {k: float(v) for k, v in sample_sizes.items()}

    def normalized_ratios(self, sample_sizes: Dict[str, int]
                          ) -> Dict[str, float]:
        ratios = self.get_sample_ratios(sample_sizes)
        total = sum(ratios.values())
        return {k: v / total for k, v in ratios.items()}


class TemperatureSampler(DataSampler):
    """ratio_i ∝ size_i^(1/T): T=1 proportional, T->inf uniform
    (parity: temperature_sampler.py)."""

    def __init__(self, args=None):
        super().__init__(args)
        self._temperature = float(self._args.get("temperature") or 5.0)

    @staticmethod
    def class_or_method_args():
        return DataSampler.class_or_method_args() + [
            Flag("temperature", dtype=Flag.TYPE.FLOAT, default=5.0,
                 help="The sampling temperature T."),
        ]

    def get_sample_ratios(self, sample_sizes):
        return {k: float(v) ** (1.0 / self._temperature)
                for k, v in sample_sizes.items()}


def _create_sampler(cls, args, **kwargs):
    return cls(args, **kwargs)


build_data_sampler, register_data_sampler = setup_registry(
    "data_sampler", base_class=DataSampler, create_fn=_create_sampler)

register_data_sampler(DataSampler)
register_data_sampler(TemperatureSampler)
