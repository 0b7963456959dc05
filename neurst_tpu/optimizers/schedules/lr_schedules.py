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
"""Learning-rate schedules (parity: /root/reference/neurst/optimizers/schedules/).

Each schedule is a callable ``step -> lr`` usable directly by optax.
``noam`` reproduces the reference formula exactly, including resume
awareness via the registered initial step and the optional linear decay
of the scaling factor (noam_schedule.py:22-108).
"""

from typing import Optional

import jax.numpy as jnp

from neurst_tpu.utils import compat
from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.registry import setup_registry

__all__ = ["LRSchedule", "build_lr_schedule", "register_lr_schedule",
           "NoamSchedule"]


class LRSchedule(object):

    def __init__(self, args=None):
        self._args = dict(args or {})

    @staticmethod
    def class_or_method_args():
        return []

    def __call__(self, global_step):
        raise NotImplementedError


def _create_schedule(cls, args, **kwargs):
    return cls(args, **kwargs)


build_lr_schedule, register_lr_schedule = setup_registry(
    "lr_schedule", base_class=LRSchedule, create_fn=_create_schedule)


@register_lr_schedule("noam")
class NoamSchedule(LRSchedule):
    """lr = factor * dmodel^-0.5 * min(1, step/warmup) / sqrt(max(step, warmup))."""

    def __init__(self, args=None):
        super().__init__(args)
        a = self._args
        self._dmodel = a["dmodel"]
        self._warmup_steps = float(a.get("warmup_steps") or 4000)
        self._initial_step = float(compat.get_registered_initial_step())
        self._initial_factor = float(a.get("initial_factor") or 1.0)
        end_factor = a.get("end_factor")
        if (end_factor is not None and a.get("start_decay_at") is not None
                and a.get("decay_steps") is not None):
            self._end_factor = float(end_factor)
            self._start_decay_at = float(a["start_decay_at"])
            self._decay_steps = float(a["decay_steps"])
        else:
            self._end_factor = self._initial_factor
            self._start_decay_at = 0.0
            self._decay_steps = 1.0

    @staticmethod
    def class_or_method_args():
        return [
            Flag("dmodel", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The model dimension in the hidden layers."),
            Flag("warmup_steps", dtype=Flag.TYPE.INTEGER, default=4000,
                 help="The number of linear warmup steps."),
            Flag("initial_factor", dtype=Flag.TYPE.FLOAT, default=1.,
                 help="The initial learning rate scaling factor."),
            Flag("end_factor", dtype=Flag.TYPE.FLOAT, default=None,
                 help="The final decayed scaling factor."),
            Flag("start_decay_at", dtype=Flag.TYPE.INTEGER, default=0,
                 help="The step at which the factor starts decaying."),
            Flag("decay_steps", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The factor decays to end_factor over this many steps."),
        ]

    def __call__(self, global_step):
        step = jnp.asarray(global_step, jnp.float32) \
            + self._initial_step + 1.0
        step_factor = jnp.maximum(jnp.minimum(
            step - self._start_decay_at, self._decay_steps), 0.0)
        lr = self._end_factor + (self._initial_factor - self._end_factor) \
            * (1.0 - step_factor / self._decay_steps)
        lr = lr * (self._dmodel ** -0.5)
        lr = lr * jnp.minimum(1.0, step / self._warmup_steps)
        lr = lr / jnp.sqrt(jnp.maximum(step, self._warmup_steps))
        return lr


@register_lr_schedule("inverse_sqrt")
class InverseSqrtSchedule(LRSchedule):
    """fairseq-style inverse sqrt with linear warmup."""

    def __init__(self, args=None):
        super().__init__(args)
        a = self._args
        self._warmup_steps = float(a.get("warmup_steps") or 4000)
        self._peak_lr = float(a.get("peak_lr") if a.get("peak_lr")
                              is not None else 5e-4)
        self._init_lr = float(a.get("init_lr") or 0.0)
        self._initial_step = float(compat.get_registered_initial_step())

    @staticmethod
    def class_or_method_args():
        return [
            Flag("warmup_steps", dtype=Flag.TYPE.INTEGER, default=4000,
                 help="The number of linear warmup steps."),
            Flag("peak_lr", dtype=Flag.TYPE.FLOAT, default=5e-4,
                 help="The peak learning rate at the end of warmup."),
            Flag("init_lr", dtype=Flag.TYPE.FLOAT, default=0.,
                 help="The initial learning rate."),
        ]

    def __call__(self, global_step):
        step = jnp.asarray(global_step, jnp.float32) \
            + self._initial_step + 1.0
        warmup_lr = self._init_lr + (self._peak_lr - self._init_lr) \
            * (step / self._warmup_steps)
        decay_lr = self._peak_lr * jnp.sqrt(self._warmup_steps) \
            / jnp.sqrt(jnp.maximum(step, self._warmup_steps))
        return jnp.where(step < self._warmup_steps, warmup_lr, decay_lr)


@register_lr_schedule("piecewise")
class PiecewiseSchedule(LRSchedule):
    """Piecewise-constant learning rate by step boundaries."""

    def __init__(self, args=None):
        super().__init__(args)
        a = self._args
        self._boundaries = [float(b) for b in (a.get("boundaries") or [])]
        self._values = [float(v) for v in (a.get("values") or [1e-3])]
        assert len(self._values) == len(self._boundaries) + 1, \
            "need len(values) == len(boundaries) + 1"

    @staticmethod
    def class_or_method_args():
        return [
            Flag("boundaries", dtype=Flag.TYPE.FLOAT, default=None,
                 multiple=True, help="The step boundaries."),
            Flag("values", dtype=Flag.TYPE.FLOAT, default=None, multiple=True,
                 help="The learning rate in each interval."),
        ]

    def __call__(self, global_step):
        step = jnp.asarray(global_step, jnp.float32)
        lr = jnp.asarray(self._values[0], jnp.float32)
        for b, v in zip(self._boundaries, self._values[1:]):
            lr = jnp.where(step >= b, v, lr)
        return lr


@register_lr_schedule("constant")
class ConstantSchedule(LRSchedule):

    @staticmethod
    def class_or_method_args():
        return [Flag("learning_rate", dtype=Flag.TYPE.FLOAT, default=1e-3,
                     help="The constant learning rate.")]

    def __call__(self, global_step):
        return jnp.asarray(self._args.get("learning_rate") or 1e-3,
                           jnp.float32)
