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
"""The Validation sidecar entry.

Parity: /root/reference/neurst/exps/validation.py:29-143 — a separate
process that polls ``model_dir`` for new checkpoints every
``waiting_interval`` seconds (giving up after ``maximum_waiting_time``),
restores each one and runs the configured validator.  The trainer and
this process communicate only via the checkpoint directory.
"""

import logging
import time

import jax

from neurst_tpu.exps.base_experiment import BaseExperiment, register_exp
from neurst_tpu.training.validator import build_validator
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["Validation"]


@register_exp("validation")
class Validation(BaseExperiment):

    @staticmethod
    def class_or_method_args():
        return [
            ModuleFlag("validator", "validator",
                       default="seq_generation_validator",
                       help="The validator to run on each checkpoint."),
            Flag("waiting_interval", dtype=Flag.TYPE.INTEGER, default=120,
                 help="Seconds between checkpoint-directory polls."),
            Flag("maximum_waiting_time", dtype=Flag.TYPE.INTEGER,
                 default=3600,
                 help="Give up after this many seconds with no new "
                      "checkpoint."),
        ]

    def run(self):
        args = self._args
        validator = build_validator(args).build(
            self._task, self._model, self._model_dir)
        params_template = self._model.init_params(jax.random.PRNGKey(0))
        waiting_interval = int(args.get("waiting_interval") or 120)
        max_wait = int(args.get("maximum_waiting_time") or 3600)
        seen = set()
        idle_since = time.time()
        while True:
            steps = [s for s in ckpt_lib.list_checkpoints(self._model_dir)
                     if s not in seen]
            if not steps:
                if time.time() - idle_since > max_wait:
                    logging.info("No new checkpoint for %ds; exiting.",
                                 max_wait)
                    return
                time.sleep(waiting_interval)
                continue
            idle_since = time.time()
            for step in sorted(steps):
                seen.add(step)
                import os
                path = os.path.join(self._model_dir, f"ckpt-{step}.npz")
                orbax_path = os.path.join(self._model_dir,
                                          f"ckpt-{step}.orbax")
                if not os.path.exists(path) and os.path.isdir(orbax_path):
                    # sharded (orbax) trainer checkpoints go through the
                    # same flat-restore + retry path below
                    path = orbax_path
                flat = None
                for attempt in range(5):  # retry slow writers (parity)
                    try:
                        flat = ckpt_lib.restore_checkpoint_params(path)
                        break
                    except FileNotFoundError:
                        # rotated away by the trainer's max_to_keep —
                        # waiting won't bring it back
                        logging.info("checkpoint %s already rotated away; "
                                     "skipping.", path)
                        break
                    except Exception as e:
                        logging.warning("retry %d reading %s: %s",
                                        attempt, path, e)
                        time.sleep(5)
                if flat is None:
                    continue
                params, _, _ = ckpt_lib.restore_into(params_template, flat)
                should_stop = validator.validate(step, params)
                if should_stop:
                    logging.info("Validator requested early stop.")
                    return
