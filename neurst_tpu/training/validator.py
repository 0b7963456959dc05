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
"""Validators (parity: /root/reference/neurst/training/validator.py,
criterion_validator.py, seq_generation_validator.py).

A validator evaluates a parameter snapshot at some step, records the
best metric (keep-best + averaged checkpoint savers), and signals early
stop after `estop_patience` non-improving evaluations (the reference
kills the trainer with SIGUSR1, training_utils.py:358-370 — here the
validate() return value carries the stop signal, and the sidecar mode
exits its polling loop).
"""

import logging
from typing import Optional

import jax
import numpy as np

from neurst_tpu.utils.flags_core import Flag, ModuleFlag
from neurst_tpu.utils.registry import setup_registry

__all__ = ["Validator", "build_validator", "register_validator",
           "TrainingStatusRecorder", "recover_targets"]


def recover_targets(task, dataset, targets):
    """Recovers raw reference texts from a dataset's targets regardless
    of their DataStatus (PROCESSED strings need detokenization too)."""
    from neurst_tpu.utils.compat import DataStatus
    status = dataset.status
    if isinstance(status, dict):
        status = status.get("transcript", DataStatus.RAW)
    post = task.get_data_postprocess_fn(status)
    if status == DataStatus.PROCESSED:
        return [post(t) for t in targets]
    # PROJECTED: id lists need decode; raw strings pass through
    return [post(t) if not isinstance(t, str) else t for t in targets]


class TrainingStatusRecorder(object):
    """Tracks the best metric; drives keep-best/average savers and early
    stop (parity: training_utils.py:274-370)."""

    def __init__(self, metric, model_dir: Optional[str] = None,
                 keep_best: int = 0, keep_best_avg: int = 0,
                 estop_patience: Optional[int] = None,
                 best_dir: Optional[str] = None,
                 best_avg_dir: Optional[str] = None):
        import os
        self._metric = metric
        self._best = None
        self._best_step = None
        self._bad_count = 0
        self._estop_patience = estop_patience
        self._keep_best_saver = None
        self._avg_saver = None
        if (model_dir or best_dir) and keep_best:
            from neurst_tpu.utils.checkpoints import KeepBestCheckpointSaver
            base, sub = ((os.path.dirname(best_dir) or ".",
                          os.path.basename(best_dir))
                         if best_dir else (model_dir, "best"))
            self._keep_best_saver = KeepBestCheckpointSaver(
                base, metric, max_to_keep=keep_best, subdir=sub)
        if (model_dir or best_avg_dir) and keep_best_avg:
            from neurst_tpu.utils.checkpoints import AverageCheckpointSaver
            base, sub = ((os.path.dirname(best_avg_dir) or ".",
                          os.path.basename(best_avg_dir))
                         if best_avg_dir else (model_dir, "best_avg"))
            self._avg_saver = AverageCheckpointSaver(
                base, metric, max_to_keep=keep_best_avg, subdir=sub)

    @property
    def best(self):
        return self._best

    @property
    def best_step(self):
        return self._best_step

    def record(self, step: int, metric_value: float, params=None) -> bool:
        """Records an evaluation.  Returns True when training should stop
        early."""
        improved = (self._best is None
                    or self._metric.greater_or_eq(metric_value, self._best))
        if improved:
            self._best = metric_value
            self._best_step = step
            self._bad_count = 0
        else:
            self._bad_count += 1
        logging.info("validation @%d: %s=%.4f (best %.4f @%d, bad=%d)",
                     step, getattr(self._metric, "flag", "metric"),
                     metric_value, self._best, self._best_step,
                     self._bad_count)
        if params is not None:
            if self._keep_best_saver is not None:
                self._keep_best_saver.save(step, params, metric_value)
            if self._avg_saver is not None:
                self._avg_saver.save(step, params, metric_value)
        if self._estop_patience and self._bad_count >= self._estop_patience:
            logging.info("Early stop triggered after %d bad evals.",
                         self._bad_count)
            return True
        return False


class Validator(object):
    """Base validator: evaluate every eval_steps from eval_start_at
    (parity: validator.py:24-62)."""

    # built from the trainer's full args namespace by design
    ALLOW_UNDECLARED_PARAMS = True

    def __init__(self, args=None):
        self._args = dict(args or {})
        self._eval_steps = int(self._args.get("eval_steps") or 1000)
        self._eval_start_at = int(self._args.get("eval_start_at") or 0)

    @staticmethod
    def class_or_method_args():
        return [
            Flag("eval_steps", dtype=Flag.TYPE.INTEGER, default=1000,
                 help="Evaluate every this many steps."),
            Flag("eval_start_at", dtype=Flag.TYPE.INTEGER, default=0,
                 help="Start evaluating at this step."),
            Flag("eval_estop_patience", dtype=Flag.TYPE.INTEGER,
                 default=None,
                 help="Early-stop after this many non-improving evals."),
            Flag("eval_best_checkpoint_path", dtype=Flag.TYPE.STRING,
                 default=None, help="Where to keep best checkpoints "
                                    "(defaults to model_dir/best)."),
            Flag("eval_auto_average_checkpoints", dtype=Flag.TYPE.BOOLEAN,
                 default=True, help="Maintain an averaged-best checkpoint."),
            Flag("eval_best_avg_checkpoint_path", dtype=Flag.TYPE.STRING,
                 default=None, help="Where to keep the averaged checkpoint."),
        ]

    def should_eval(self, step: int) -> bool:
        return (step >= self._eval_start_at
                and step % self._eval_steps == 0)

    def build(self, task, model, model_dir: Optional[str]):
        raise NotImplementedError

    def validate(self, step: int, params) -> bool:
        """Runs validation; returns True to request early stop."""
        raise NotImplementedError


def _create_validator(cls, args, **kwargs):
    return cls(args, **kwargs)


build_validator, register_validator = setup_registry(
    "validator", base_class=Validator, create_fn=_create_validator)
