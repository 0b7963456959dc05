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
"""Translation task.

Parity: /root/reference/neurst/tasks/translation.py — the reference's
``gpu_efficient_level`` (0-5, padding bucket boundaries to multiples of
{8,...,64} to cap the number of compiled shapes) generalizes here to a
first-class ``static_shape_policy``: the boundary/length multiple is a
direct flag, and static shapes are always on (they are mandatory for
TPU/XLA, not an optimization level).
"""

from neurst_tpu.tasks.seq2seq import Seq2Seq
from neurst_tpu.tasks.task import register_task
from neurst_tpu.utils.flags_core import Flag

__all__ = ["Translation"]

# gpu_efficient_level -> pad multiple (parity: training_utils.py:38-45)
_LEVEL_TO_MULTIPLE = {0: 8, 1: 8, 2: 16, 3: 32, 4: 64, 5: 64}


@register_task("translation")
class Translation(Seq2Seq):

    def __init__(self, args=None):
        super().__init__(args)
        level = self._args.get("gpu_efficient_level")
        if self._args.get("pad_length_multiple") is None and level is not None:
            self._args["pad_length_multiple"] = _LEVEL_TO_MULTIPLE.get(
                int(level), 8)

    @staticmethod
    def class_or_method_args():
        args = Seq2Seq.class_or_method_args()
        args.extend([
            Flag("gpu_efficient_level", dtype=Flag.TYPE.INTEGER, default=None,
                 help="Legacy knob (0-5) mapping to pad_length_multiple "
                      "{8,8,16,32,64,64}; kept for recipe compatibility."),
            Flag("pad_length_multiple", dtype=Flag.TYPE.INTEGER, default=8,
                 help="Pad sequence dims to this multiple (bounds the set "
                      "of compiled XLA programs)."),
            Flag("auto_scaling_batch_size", dtype=Flag.TYPE.BOOLEAN,
                 default=None,
                 help="Kept for recipe compatibility (no-op: batch sizes "
                      "already scale with the mesh)."),
        ])
        return args
