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
"""Criterion (loss/ppl) validator
(parity: neurst/training/criterion_validator.py)."""

import logging

import jax
import numpy as np

from neurst_tpu.criterions.criterion import build_criterion
from neurst_tpu.data.datasets.dataset import build_dataset
from neurst_tpu.parallel import make_eval_step
from neurst_tpu.training.validator import (TrainingStatusRecorder, Validator,
                                           register_validator)
from neurst_tpu.utils.compat import ModeKeys
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["CriterionValidator"]


@register_validator("criterion_validator")
class CriterionValidator(Validator):

    @staticmethod
    def class_or_method_args():
        return Validator.class_or_method_args() + [
            ModuleFlag("eval_criterion", "criterion",
                       default="label_smoothed_cross_entropy",
                       help="The criterion for validation."),
            ModuleFlag("eval_dataset", "dataset",
                       help="The development dataset."),
            Flag("eval_batch_size", dtype=Flag.TYPE.INTEGER, default=32,
                 help="The batch size for validation."),
        ]

    def build(self, task, model, model_dir=None):
        a = dict(self._args)
        a["criterion.class"] = a.get("eval_criterion.class") \
            or "label_smoothed_cross_entropy"
        a["criterion.params"] = a.get("eval_criterion.params") or {}
        self._criterion = build_criterion(a)
        self._task = task
        self._model = model
        self._dataset = build_dataset(
            {"dataset.class": a.get("eval_dataset.class"),
             "dataset.params": a.get("eval_dataset.params") or {}})
        self._eval_step = jax.jit(make_eval_step(model, self._criterion))
        self._batch_args = {"batch_size": a.get("eval_batch_size") or 32}
        self._recorder = TrainingStatusRecorder(
            self._criterion.as_metric(), model_dir=model_dir,
            keep_best=0, keep_best_avg=0,
            estop_patience=a.get("eval_estop_patience"))
        return self

    def validate(self, step, params):
        stats = []
        it = self._task.create_batch_iterator(
            self._dataset, ModeKeys.EVAL, self._batch_args)
        for batch in it():
            model_inp = {k: v for k, v in batch.items()
                         if isinstance(v, np.ndarray) and v.dtype != object}
            stats.append(jax.tree_util.tree_map(
                np.asarray, self._eval_step(params, model_inp)))
        metrics = self._criterion.reduce_metrics(stats)
        logging.info("criterion validation @%d: %s", step, metrics)
        flag = self._criterion.as_metric().flag
        return self._recorder.record(step, float(metrics[flag]), params)
