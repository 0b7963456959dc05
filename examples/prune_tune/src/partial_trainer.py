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
"""Prune-Tune partial trainer — a user plug-in example.

Parity: /root/reference/examples/prune_tune/src/partial_trainer.py —
demonstrates the ``--include`` plug-in path: a custom entry registered
at runtime that fine-tunes ONLY the pruned (zero) slots of a sparse
general-domain model on in-domain data, keeping the dense subnetwork
frozen (no catastrophic forgetting).

Usage:
    python -m neurst_tpu.cli.run_exp --entry partial_tune \
        --include examples/prune_tune/src/partial_trainer.py \
        --mask_dir general_ckpt ... (normal trainer flags)
"""

import logging

import jax
import numpy as np
import optax

from neurst_tpu.exps.base_experiment import register_exp
from neurst_tpu.exps.trainer import Trainer
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.flags_core import Flag


def make_partial_mask_transform(mask_flat):
    """optax transform zeroing updates where mask == 0 (dense slots)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        from neurst_tpu.utils.checkpoints import (flatten_params,
                                                  unflatten_params)
        flat_updates = flatten_params(updates)
        out = {}
        for name, u in flat_updates.items():
            m = mask_flat.get(name)
            out[name] = u * m if m is not None else u
        return unflatten_params(out), state

    return optax.GradientTransformation(init, update)


@register_exp("partial_tune")
class PartialTrainer(Trainer):
    """Fine-tunes only the pruned (zero) parameter slots."""

    @staticmethod
    def class_or_method_args():
        return Trainer.class_or_method_args() + [
            Flag("mask_dir", dtype=Flag.TYPE.STRING, default=None,
                 help="Checkpoint dir of the pruned general-domain model "
                      "(zeros mark the tunable slots)."),
        ]

    def run(self):
        mask_dir = self._args.get("mask_dir")
        if not mask_dir:
            raise ValueError("--mask_dir is required for partial_tune")
        path = ckpt_lib.latest_checkpoint(mask_dir)
        flat = ckpt_lib.restore_checkpoint_params(path)
        # tunable slots = weights that the pruning run zeroed out
        mask_flat = {name: (np.asarray(w) == 0.0).astype(np.float32)
                     for name, w in flat.items()}
        tunable = sum(float(m.sum()) for m in mask_flat.values())
        total = sum(m.size for m in mask_flat.values())
        logging.info("partial_tune: %.1f%% of parameters are tunable",
                     100.0 * tunable / total)
        self._partial_mask = mask_flat
        # hook: Trainer picks this up via _wrap_tx
        return super().run()

    def _wrap_tx(self, tx):
        return optax.chain(tx,
                           make_partial_mask_transform(self._partial_mask))
