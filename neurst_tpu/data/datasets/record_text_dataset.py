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
"""TFRecord-backed parallel text dataset.

Parity: ``ParallelTFRecordDataset``
(/root/reference/neurst/data/datasets/parallel_text_dataset.py:294-303):
records hold PROJECTED int64 "feature"/"label" id lists.  Files written
by the reference's ``create_tfrecords`` CLI parse unchanged.
"""

from neurst_tpu.data.datasets.dataset import RecordDataset, register_dataset
from neurst_tpu.data.datasets.parallel_text_dataset import AbstractParallelDataset

__all__ = ["ParallelRecordDataset"]


@register_dataset("parallel_tfrecord", "ParallelTFRecordDataset",
                  "parallel_tf_record_dataset")
class ParallelRecordDataset(RecordDataset, AbstractParallelDataset):

    @property
    def fields(self):
        return {"feature": "int64", "label": "int64"}

    def parse_record(self, parsed):
        out = {}
        for k in ("feature", "label"):
            if k in parsed:
                v = parsed[k]
                out[k] = v.tolist() if hasattr(v, "tolist") else v
        return out
