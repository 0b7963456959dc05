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
"""Wait-k translation task
(parity: /root/reference/neurst/tasks/waitk_translation.py:21-50):
forwards the wait_k lagging to the model build and samples a lagging per
training batch when a list is configured."""

import random

import numpy as np

from neurst_tpu.tasks.task import register_task
from neurst_tpu.tasks.translation import Translation
from neurst_tpu.utils.compat import ModeKeys
from neurst_tpu.utils.flags_core import Flag

__all__ = ["WaitkTranslation"]


@register_task("waitk_translation")
class WaitkTranslation(Translation):

    def __init__(self, args=None):
        super().__init__(args)
        wait_k = self._args.get("wait_k", 3)
        if isinstance(wait_k, str):
            import yaml
            wait_k = yaml.safe_load(wait_k)
        self._wait_k = (list(wait_k) if isinstance(wait_k, (list, tuple))
                        else [int(wait_k)])

    @staticmethod
    def class_or_method_args():
        return Translation.class_or_method_args() + [
            Flag("wait_k", dtype=Flag.TYPE.STRING, default=3,
                 help="The wait-k lagging (int or list for training-time "
                      "sampling)."),
        ]

    def get_config(self):
        cfg = super().get_config()
        cfg["wait_k"] = self._wait_k
        return cfg

    def build_model(self, args, name=None, **kwargs):
        params = dict(args.get("model.params") or {})
        params.setdefault("wait_k", self._wait_k
                          if len(self._wait_k) > 1 else self._wait_k[0])
        return super().build_model(
            {"model.class": args.get("model.class") or "waitk_transformer",
             "model.params": params}, name=name, **kwargs)

    def example_to_input(self, batch_of_data, mode):
        input_dict = super().example_to_input(batch_of_data, mode)
        if mode == ModeKeys.TRAIN:
            # per-batch lagging sample (parity: waitk_transformer.py:86-117)
            input_dict["waitk_lagging"] = np.asarray(
                random.choice(self._wait_k), np.int32)
        return input_dict
