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
"""Experiment ("entry") base class.

Parity: /root/reference/neurst/exps/base_experiment.py:20-54.  An entry
holds (task, model, custom_dataset, model_dir) and implements ``run``.
The tf.distribute strategy slot is replaced by the device mesh, built
lazily by entries that need one.
"""

from typing import Optional

from neurst_tpu.utils.registry import setup_registry

__all__ = ["BaseExperiment", "build_exp", "register_exp"]


class BaseExperiment(object):

    # entries receive the full merged config namespace by design
    ALLOW_UNDECLARED_PARAMS = True

    def __init__(self, args=None, task=None, model=None,
                 custom_dataset=None, model_dir: Optional[str] = None):
        self._args = dict(args or {})
        self._task = task
        self._model = model
        self._custom_dataset = custom_dataset
        self._model_dir = model_dir

    @property
    def task(self):
        return self._task

    @property
    def model(self):
        return self._model

    @property
    def custom_dataset(self):
        return self._custom_dataset

    @property
    def model_dir(self):
        return self._model_dir

    @staticmethod
    def class_or_method_args():
        return []

    def run(self):
        raise NotImplementedError


def _create_exp(cls, args, **kwargs):
    return cls(args, **kwargs)


build_exp, register_exp = setup_registry(
    "entry", base_class=BaseExperiment, create_fn=_create_exp)
