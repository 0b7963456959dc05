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
"""Task abstraction (parity: /root/reference/neurst/tasks/task.py).

A Task binds the data layer to the model I/O contract:
  * ``get_data_preprocess_fn``: raw example -> projected features;
  * ``create_batch_iterator``: dataset -> static-shaped numpy batches;
  * ``example_to_input``: numpy batch -> model input dict;
  * ``build_model``: registry model bound to this task's vocab metas;
  * ``get_eval_metric``: default quality metric.
"""

from typing import Callable, Optional

from neurst_tpu.utils.compat import DataStatus, ModeKeys
from neurst_tpu.utils.registry import setup_registry

__all__ = ["Task", "build_task", "register_task"]


class Task(object):

    def __init__(self, args=None):
        self._args = dict(args or {})

    @property
    def args(self):
        return self._args

    @staticmethod
    def class_or_method_args():
        from neurst_tpu.utils.flags_core import COMMON_DATA_ARGS
        return list(COMMON_DATA_ARGS)

    def get_config(self) -> dict:
        """Serializable task configuration (for model_configs.yml)."""
        return {}

    def model_configs(self, model) -> dict:
        """Snapshot of everything needed to rebuild task+model —
        including the quantization state (parity: reference
        task.py:36-44), so inference rebuilds the QAT layer structure
        that matches the checkpoint."""
        cfg = {
            "task.class": type(self).__name__,
            "task.params": self.get_config(),
            "model.class": type(model).__name__,
            "model.params": model.args,
        }
        from neurst_tpu.layers.quantization.quant_layers import (
            get_global_config, quant_enabled)
        if quant_enabled():
            qcfg = get_global_config()
            qcfg.pop("enable_quant", None)
            cfg["enable_quant"] = True
            cfg["quant_params"] = qcfg
        return cfg

    def build_model(self, args, name=None, **kwargs):
        raise NotImplementedError

    def get_data_preprocess_fn(self, mode,
                               data_status=DataStatus.RAW,
                               args: Optional[dict] = None) -> Callable:
        raise NotImplementedError

    def get_data_postprocess_fn(self, data_status, **kwargs) -> Callable:
        return lambda x: x

    def example_to_input(self, batch_of_data: dict, mode) -> dict:
        raise NotImplementedError

    def create_batch_iterator(self, ds, mode, args: Optional[dict] = None,
                              num_replicas_in_sync: int = 1,
                              shard_id: int = 0, total_shards: int = 1):
        """Returns a zero-arg callable producing an iterator of numpy
        batches (model-ready via example_to_input)."""
        raise NotImplementedError

    def get_eval_metric(self, args, name="metric", ds=None):
        raise NotImplementedError

    def eval_targets(self, dataset):
        """Reference targets for generation eval — the dataset's
        targets by default; multi-target tasks override to select the
        side generation decodes."""
        return getattr(dataset, "raw_targets", None) \
            or getattr(dataset, "targets", None)


def _create_task(cls, args, **kwargs):
    return cls(args, **kwargs)


build_task, register_task = setup_registry(
    "task", base_class=Task, create_fn=_create_task)
