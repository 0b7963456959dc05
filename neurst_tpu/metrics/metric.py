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
"""Metric protocol (parity: /root/reference/neurst/metrics/metric.py)."""

from neurst_tpu.utils.registry import setup_registry

__all__ = ["Metric", "MetricWrapper", "build_metric", "register_metric"]


class Metric(object):
    """A named scalar (or dict of scalars) quality measure."""

    def __init__(self, args=None):
        self._args = dict(args or {})
        self._flag = None

    @property
    def flag(self):
        """The primary metric key used for model selection."""
        return self._flag

    @flag.setter
    def flag(self, value):
        self._flag = value

    @staticmethod
    def class_or_method_args():
        return []

    def set_groundtruth(self, groundtruth):
        """Stores references for corpus-level metrics."""
        self._groundtruth = groundtruth

    def greater_or_eq(self, result1, result2) -> bool:
        """Whether result1 is at least as good as result2."""
        return self.get_value(result1) >= self.get_value(result2)

    def get_value(self, result) -> float:
        if isinstance(result, dict):
            return float(result[self.flag])
        return float(result)

    def call(self, hypothesis, groundtruth=None) -> dict:
        raise NotImplementedError

    def __call__(self, hypothesis, groundtruth=None) -> dict:
        if groundtruth is None:
            groundtruth = getattr(self, "_groundtruth", None)
        return self.call(hypothesis, groundtruth)


class MetricWrapper(Metric):
    """Wraps a loss-like value (e.g. NLL) into the Metric protocol."""

    def __init__(self, flag: str, greater_is_better: bool = False):
        super().__init__({})
        self._flag = flag
        self._greater_is_better = greater_is_better

    def greater_or_eq(self, result1, result2):
        v1, v2 = self.get_value(result1), self.get_value(result2)
        return v1 >= v2 if self._greater_is_better else v1 <= v2

    def call(self, hypothesis, groundtruth=None):
        raise NotImplementedError("MetricWrapper holds external values")


def _create_metric(cls, args, **kwargs):
    return cls(args, **kwargs)


build_metric, register_metric = setup_registry(
    "metric", base_class=Metric, create_fn=_create_metric)
