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
"""Audio feature extractor registry.

Parity: /root/reference/neurst/data/audio/feature_extractor.py.
"""

from neurst_tpu.utils.registry import setup_registry

__all__ = ["FeatureExtractor", "build_feature_extractor",
           "register_feature_extractor"]


class FeatureExtractor(object):
    """Maps a 1-D waveform (float array) to a feature sequence."""

    def __init__(self, args=None):
        self._args = dict(args or {})

    @staticmethod
    def class_or_method_args():
        return []

    @property
    def feature_dim(self) -> int:
        raise NotImplementedError

    def seq_len_fn(self, raw_len: int) -> int:
        """Number of output frames for a waveform of `raw_len` samples."""
        raise NotImplementedError

    def __call__(self, signal, rate: int):
        raise NotImplementedError


def _create_fe(cls, args, **kwargs):
    return cls(args, **kwargs)


build_feature_extractor, register_feature_extractor = setup_registry(
    "feature_extractor", base_class=FeatureExtractor, create_fn=_create_fe)


@register_feature_extractor("float_identity")
class FloatIdentity(FeatureExtractor):
    """Pass-through (pre-extracted features or raw waveform models)."""

    @property
    def feature_dim(self):
        return 1

    def seq_len_fn(self, raw_len):
        return raw_len

    def __call__(self, signal, rate):
        import numpy as np
        return np.asarray(signal, np.float32)
