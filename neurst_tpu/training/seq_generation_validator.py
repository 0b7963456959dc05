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
"""Sequence-generation validator: beam-decode the dev set and score
BLEU/WER (parity: neurst/training/seq_generation_validator.py:29-233,
including keep-best + averaged checkpoint savers and sample hypothesis
logging)."""

import logging

import jax
import numpy as np

from neurst_tpu.data.datasets.dataset import build_dataset
from neurst_tpu.layers.search.sequence_search import build_search_layer
from neurst_tpu.training.validator import (TrainingStatusRecorder, Validator,
                                           recover_targets,
                                           register_validator)
from neurst_tpu.utils.compat import DataStatus, ModeKeys
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["SeqGenerationValidator"]


@register_validator("seq_generation_validator")
class SeqGenerationValidator(Validator):

    @staticmethod
    def class_or_method_args():
        return Validator.class_or_method_args() + [
            ModuleFlag("eval_search_method", "search_method",
                       default="beam_search",
                       help="The search layer for validation decode."),
            ModuleFlag("eval_metric", "metric",
                       help="The metric for validation."),
            ModuleFlag("eval_dataset", "dataset",
                       help="The development dataset."),
            Flag("eval_batch_size", dtype=Flag.TYPE.INTEGER, default=32,
                 help="The batch size for validation decode."),
            Flag("eval_top_hypothesis_display", dtype=Flag.TYPE.INTEGER,
                 default=3, help="Log this many sample hypotheses."),
            Flag("eval_keep_best_checkpoints", dtype=Flag.TYPE.INTEGER,
                 default=8, help="Keep top-k checkpoints by metric.",
                 alias="eval_top_checkpoints_to_keep"),
        ]

    def build(self, task, model, model_dir=None):
        a = dict(self._args)
        self._task = task
        self._model = model
        self._dataset = build_dataset(
            {"dataset.class": a.get("eval_dataset.class"),
             "dataset.params": a.get("eval_dataset.params") or {}})
        search_cfg = {
            "search_method.class": a.get("eval_search_method.class")
            or "beam_search",
            "search_method.params": a.get("eval_search_method.params") or {}}
        self._search = build_search_layer(search_cfg)
        # pipeline-parallel layouts (layers/pipeline.py) serve the
        # training step only: decode through a sequential twin, with the
        # stacked [stages, layers_per_stage, ...] params reshaped per
        # validation via the checkpoint layout bridge
        margs = dict(getattr(model, "args", None) or {})
        self._decode_template = None
        decode_model = model
        if any(int(margs.get(f"{s}.pipeline_stages") or 1) > 1
               for s in ("encoder", "decoder")):
            from neurst_tpu.utils.configurable import \
                strip_training_only_model_flags
            cfg = task.model_configs(model)
            cfg["model.params"] = strip_training_only_model_flags(
                cfg.get("model.params"))
            decode_model = task.build_model(cfg)
            self._decode_template = decode_model.init_params(
                jax.random.PRNGKey(0))
            logging.info("Validator decodes through a sequential twin of "
                         "the pipelined model (params bridged per "
                         "validation)")
        self._search.set_model(decode_model)
        self._jit_search = jax.jit(
            lambda p, inp: self._search(p, inp))
        metric_args = {"metric.class": a.get("eval_metric.class"),
                       "metric.params": a.get("eval_metric.params") or {}}
        self._metric = task.get_eval_metric(
            metric_args if metric_args["metric.class"] else {},
            ds=self._dataset)
        self._batch_args = {"batch_size": a.get("eval_batch_size") or 32}
        self._display = int(a.get("eval_top_hypothesis_display") or 3)
        keep_best = a.get("eval_keep_best_checkpoints")
        if keep_best is None:
            keep_best = a.get("eval_top_checkpoints_to_keep")
        if keep_best is None:
            keep_best = 8
        self._recorder = TrainingStatusRecorder(
            self._metric, model_dir=model_dir,
            keep_best=keep_best,
            keep_best_avg=(keep_best
                           if a.get("eval_auto_average_checkpoints", True)
                           else 0),
            estop_patience=a.get("eval_estop_patience"),
            best_dir=a.get("eval_best_checkpoint_path"),
            best_avg_dir=a.get("eval_best_avg_checkpoint_path"))
        return self

    def validate(self, step, params):
        # check targets BEFORE the (expensive) decode of the eval set
        targets = self._task.eval_targets(self._dataset)
        if not targets:
            logging.warning("Validation dataset has no targets; skipping "
                            "generation validation (parity: reference "
                            "seq_generation_validator.py:122-131).")
            return False
        hypo_decode = self._task.get_data_postprocess_fn(
            DataStatus.PROJECTED)
        decode_params = params
        if self._decode_template is not None:
            from neurst_tpu.utils.checkpoints import (flatten_params,
                                                      restore_into)
            flat = {k: np.asarray(v) for k, v in flatten_params(
                jax.device_get(params)).items()}
            decode_params, _, missing = restore_into(
                self._decode_template, flat)
            if missing:
                raise ValueError(
                    f"pipeline->sequential param bridge missed: {missing}")
        hypotheses = []
        it = self._task.create_batch_iterator(
            self._dataset, ModeKeys.INFER, self._batch_args)
        for batch in it():
            model_inp = {k: v for k, v in batch.items()
                         if isinstance(v, np.ndarray) and v.dtype != object}
            hyp, _ = self._jit_search(decode_params, model_inp)
            hyp = np.asarray(hyp)
            mask = batch.get("sample_mask")
            bsz = mask.shape[0] if mask is not None else hyp.shape[0]
            top_k = hyp.shape[0] // bsz
            for i in range(bsz):
                if mask is not None and mask[i] == 0:
                    continue
                hypotheses.append(hypo_decode(hyp[i * top_k].tolist()))
        targets = recover_targets(self._task, self._dataset,
                                  list(targets)[:len(hypotheses)])
        for i in range(min(self._display, len(hypotheses))):
            logging.info("  sample %d | hyp: %s | ref: %s", i,
                         hypotheses[i][:120], targets[i][:120])
        result = self._metric(hypotheses, targets)
        value = self._metric.get_value(result)
        logging.info("generation validation @%d: %s", step, result)
        return self._recorder.record(step, value, params)
