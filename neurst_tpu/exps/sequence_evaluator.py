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
"""Sample-level criterion scoring over a dataset
(parity: /root/reference/neurst/exps/sequence_evaluator.py)."""

import logging

import jax
import numpy as np

from neurst_tpu.criterions.criterion import build_criterion
from neurst_tpu.exps.base_experiment import BaseExperiment, register_exp
from neurst_tpu.parallel import make_eval_step
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.compat import ModeKeys
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["SequenceEvaluator"]


@register_exp("sequence_evaluator")
class SequenceEvaluator(BaseExperiment):

    @staticmethod
    def class_or_method_args():
        return [
            ModuleFlag("criterion", "criterion",
                       default="label_smoothed_cross_entropy",
                       help="The scoring criterion."),
            Flag("output_file", dtype=Flag.TYPE.STRING, default=None,
                 help="Where to write per-sample scores."),
            Flag("checkpoint_path", dtype=Flag.TYPE.STRING, default=None,
                 help="Explicit checkpoint path."),
        ]

    def run(self):
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
        eval_step = jax.jit(make_eval_step(self._model, criterion))
        batch_iter = self._task.create_batch_iterator(
            self._custom_dataset, ModeKeys.EVAL, args)
        sample_metrics = []
        for batch in batch_iter():
            model_inp = {k: v for k, v in batch.items()
                         if isinstance(v, np.ndarray) and v.dtype != object}
            res = jax.tree_util.tree_map(
                np.asarray, eval_step(params, model_inp))
            per_sample = criterion.reduce_sample_metrics(res)
            mask = batch.get("sample_mask")
            for i, m in enumerate(per_sample):
                if mask is not None and i < len(mask) and mask[i] == 0:
                    continue
                sample_metrics.append(m)
        logging.info("Scored %d samples", len(sample_metrics))
        if args.get("output_file"):
            import json
            with open(args["output_file"], "w") as f:
                for m in sample_metrics:
                    f.write(json.dumps(m) + "\n")
        return sample_metrics
