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
"""Weight-pruning schedules.

Parity: /root/reference/neurst/sparsity/pruning_schedule.py —
``PruningSchedule`` with begin/end/frequency gating (28-123),
``ConstantSparsity`` (125) and ``PolynomialDecay`` (136-175).
All methods are jit-safe (return traced scalars).
"""

import jax.numpy as jnp

from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.registry import setup_registry

__all__ = ["PruningSchedule", "ConstantSparsity", "PolynomialDecay",
           "build_pruning_schedule"]


class PruningSchedule(object):

    def __init__(self, args=None):
        self._args = dict(args or {})
        self._begin_step = int(self._args.get("begin_pruning_step") or 0)
        self._end_step = int(self._args.get("end_pruning_step") or -1)
        self._frequency = int(self._args.get("pruning_frequency") or 100)

    @staticmethod
    def class_or_method_args():
        return [
            Flag("begin_pruning_step", dtype=Flag.TYPE.INTEGER, default=0,
                 help="Step at which pruning begins."),
            Flag("end_pruning_step", dtype=Flag.TYPE.INTEGER, default=-1,
                 help="Step at which pruning ends (-1 = never)."),
            Flag("pruning_frequency", dtype=Flag.TYPE.INTEGER, default=100,
                 help="Re-prune every this many steps."),
        ]

    def should_prune(self, step):
        """Whether masks are recomputed at `step` (traced bool)."""
        step = jnp.asarray(step)
        in_window = step >= self._begin_step
        if self._end_step >= 0:
            in_window = jnp.logical_and(in_window, step <= self._end_step)
        on_tick = ((step - self._begin_step) % self._frequency) == 0
        return jnp.logical_and(in_window, on_tick)

    def target_sparsity(self, step):
        """Fraction of weights pruned at `step` (traced float)."""
        raise NotImplementedError


class ConstantSparsity(PruningSchedule):
    """Fixed sparsity throughout the pruning window
    (parity: pruning_schedule.py:125)."""

    def __init__(self, args=None):
        super().__init__(args)
        self._sparsity = float(self._args.get("target_sparsity") or 0.5)

    @staticmethod
    def class_or_method_args():
        return PruningSchedule.class_or_method_args() + [
            Flag("target_sparsity", dtype=Flag.TYPE.FLOAT, default=0.5,
                 help="The constant target sparsity."),
        ]

    def target_sparsity(self, step):
        return jnp.asarray(self._sparsity, jnp.float32)


class PolynomialDecay(PruningSchedule):
    """Sparsity ramps from initial to final with a cubic-by-default
    polynomial (parity: pruning_schedule.py:136-175)."""

    def __init__(self, args=None):
        super().__init__(args)
        self._initial = float(self._args.get("initial_sparsity") or 0.0)
        self._final = float(self._args.get("final_sparsity") or 0.5)
        self._power = float(self._args.get("power") or 3.0)

    @staticmethod
    def class_or_method_args():
        return PruningSchedule.class_or_method_args() + [
            Flag("initial_sparsity", dtype=Flag.TYPE.FLOAT, default=0.,
                 help="The starting sparsity."),
            Flag("final_sparsity", dtype=Flag.TYPE.FLOAT, default=0.5,
                 help="The final sparsity."),
            Flag("power", dtype=Flag.TYPE.FLOAT, default=3.,
                 help="The polynomial power."),
        ]

    def target_sparsity(self, step):
        step = jnp.asarray(step, jnp.float32)
        end = float(self._end_step if self._end_step >= 0
                    else self._begin_step + 1)
        span = max(end - self._begin_step, 1.0)
        frac = jnp.clip((step - self._begin_step) / span, 0.0, 1.0)
        return (self._final + (self._initial - self._final)
                * (1.0 - frac) ** self._power)


def _create_schedule(cls, args, **kwargs):
    return cls(args, **kwargs)


build_pruning_schedule, register_pruning_schedule = setup_registry(
    "pruning_schedule", base_class=PruningSchedule,
    create_fn=_create_schedule)

register_pruning_schedule(ConstantSparsity)
register_pruning_schedule(PolynomialDecay)
