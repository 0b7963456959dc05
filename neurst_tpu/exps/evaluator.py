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
"""The loss/ppl evaluation entry.

Parity: /root/reference/neurst/exps/evaluator.py:31-101 — criterion
statistics over an EVAL dataset, reduced via
``criterion.reduce_metrics``.
"""

import logging

import jax
import numpy as np

from neurst_tpu.criterions.criterion import build_criterion
from neurst_tpu.exps.base_experiment import BaseExperiment, register_exp
from neurst_tpu.parallel import make_eval_step
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.compat import ModeKeys
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["Evaluator"]


@register_exp("eval", "evaluation")
class Evaluator(BaseExperiment):

    @staticmethod
    def class_or_method_args():
        return [
            ModuleFlag("criterion", "criterion",
                       default="label_smoothed_cross_entropy",
                       help="The evaluation criterion."),
            Flag("checkpoint_path", dtype=Flag.TYPE.STRING, default=None,
                 help="Explicit checkpoint path."),
        ]

    def run(self):
        from neurst_tpu.data.datasets.mixed_train_dataset import \
            MultipleDataset
        if isinstance(self._custom_dataset, MultipleDataset):
            # weighted-average metrics over named datasets
            # (parity: evaluator.py:31-101 mixed reduction)
            per_ds = {}
            weighted = {}
            for name, sub in sorted(
                    self._custom_dataset.datasets.items()):
                sub_exp = Evaluator(self._args, task=self._task,
                                    model=self._model, custom_dataset=sub,
                                    model_dir=self._model_dir)
                res = sub_exp.run()
                per_ds[name] = res
                w = self._custom_dataset.sample_weights.get(name, 0.0)
                for k, v in res.items():
                    weighted[k] = weighted.get(k, 0.0) + w * float(v)
            logging.info("Weighted mixture evaluation: %s", weighted)
            return {"datasets": per_ds, "weighted": weighted}
        args = self._args
        criterion = build_criterion(args)
        params = self._model.init_params(jax.random.PRNGKey(0))
        path = args.get("checkpoint_path") or \
            ckpt_lib.latest_checkpoint(self._model_dir)
        if path:
            flat = ckpt_lib.restore_checkpoint_params(path)
            from neurst_tpu.utils.param_policy import \
                restore_inference_params
            params, _ = restore_inference_params(self._model, params, flat)
            logging.info("Restored evaluation model from %s", path)
        eval_step = jax.jit(make_eval_step(self._model, criterion))
        batch_iter = self._task.create_batch_iterator(
            self._custom_dataset, ModeKeys.EVAL, args)
        stats = []
        for batch in batch_iter():
            model_inp = {k: v for k, v in batch.items()
                         if isinstance(v, np.ndarray) and v.dtype != object}
            stats.append(jax.tree_util.tree_map(
                np.asarray, eval_step(params, model_inp)))
        metrics = criterion.reduce_metrics(stats)
        logging.info("Evaluation results: %s", metrics)
        return metrics
