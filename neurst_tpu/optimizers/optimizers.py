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
"""Optimizers on optax (parity: /root/reference/neurst/optimizers/__init__.py).

Flag names keep the Keras spelling (beta_1/beta_2/epsilon/rho) so
reference recipes parse unchanged.  ``create_optimizer`` assembles the
full optax chain: clip -> optimizer(lr schedule) (gradient accumulation
is a ``lax.scan`` in the trainer, not an optax wrapper).
"""

from typing import Callable, Optional, Union

import optax

from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.registry import setup_registry

__all__ = ["Optimizer", "build_optimizer", "register_optimizer",
           "create_optax_chain"]


class Optimizer(object):
    """A named optax factory: args -> GradientTransformation(lr)."""

    def __init__(self, args=None):
        self._args = dict(args or {})

    @staticmethod
    def class_or_method_args():
        return []

    def make(self, learning_rate: Union[float, Callable]
             ) -> optax.GradientTransformation:
        raise NotImplementedError


def _create_optimizer(cls, args, **kwargs):
    return cls(args, **kwargs)


build_optimizer, register_optimizer = setup_registry(
    "optimizer", base_class=Optimizer, create_fn=_create_optimizer)


@register_optimizer("adam")
class Adam(Optimizer):

    @staticmethod
    def class_or_method_args():
        return [
            Flag("learning_rate", dtype=Flag.TYPE.FLOAT, default=None,
                 help="A fixed learning rate (overridden by lr_schedule)."),
            Flag("beta_1", dtype=Flag.TYPE.FLOAT, default=0.9,
                 help="The exponential decay rate for the 1st moment."),
            Flag("beta_2", dtype=Flag.TYPE.FLOAT, default=0.999,
                 help="The exponential decay rate for the 2nd moment."),
            Flag("epsilon", dtype=Flag.TYPE.FLOAT, default=1e-7,
                 help="A small constant for numerical stability."),
            Flag("amsgrad", dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether to apply the AMSGrad variant."),
            Flag("weight_decay", dtype=Flag.TYPE.FLOAT, default=None,
                 help="Decoupled (AdamW) weight decay rate."),
        ]

    def make(self, learning_rate):
        a = self._args
        kwargs = dict(b1=a.get("beta_1", 0.9), b2=a.get("beta_2", 0.999),
                      eps=a.get("epsilon", 1e-7))
        wd = a.get("weight_decay")
        if wd:
            return optax.adamw(learning_rate, weight_decay=wd, **kwargs)
        if a.get("amsgrad"):
            return optax.amsgrad(learning_rate, **kwargs)
        return optax.adam(learning_rate, **kwargs)


@register_optimizer("adagrad")
class Adagrad(Optimizer):

    @staticmethod
    def class_or_method_args():
        return [
            Flag("initial_accumulator_value", dtype=Flag.TYPE.FLOAT,
                 default=0.1, help="Starting accumulator value."),
            Flag("epsilon", dtype=Flag.TYPE.FLOAT, default=1e-7,
                 help="A small constant for numerical stability."),
        ]

    def make(self, learning_rate):
        a = self._args
        return optax.adagrad(
            learning_rate,
            initial_accumulator_value=a.get(
                "initial_accumulator_value", 0.1),
            eps=a.get("epsilon", 1e-7))


@register_optimizer("adadelta")
class Adadelta(Optimizer):

    @staticmethod
    def class_or_method_args():
        return [
            Flag("rho", dtype=Flag.TYPE.FLOAT, default=0.95,
                 help="The decay rate."),
            Flag("epsilon", dtype=Flag.TYPE.FLOAT, default=1e-7,
                 help="A small constant for numerical stability."),
        ]

    def make(self, learning_rate):
        a = self._args
        return optax.adadelta(learning_rate, rho=a.get("rho", 0.95),
                              eps=a.get("epsilon", 1e-7))


@register_optimizer("sgd")
class SGD(Optimizer):

    @staticmethod
    def class_or_method_args():
        return [
            Flag("momentum", dtype=Flag.TYPE.FLOAT, default=0.,
                 help="The momentum factor."),
            Flag("nesterov", dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether to use Nesterov momentum."),
        ]

    def make(self, learning_rate):
        a = self._args
        return optax.sgd(learning_rate,
                         momentum=a.get("momentum") or None,
                         nesterov=bool(a.get("nesterov")))


def create_optax_chain(optimizer: Optimizer,
                       lr: Union[float, Callable],
                       clip_value: Optional[float] = None,
                       clip_norm: Optional[float] = None
                       ) -> optax.GradientTransformation:
    """clip (value/global-norm) -> optimizer(lr).

    Parity: GradAccumKerasModel's clip-then-apply
    (gradaccum_keras_model.py:230-246)."""
    parts = []
    if clip_value:
        parts.append(optax.clip(clip_value))
    if clip_norm:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optimizer.make(lr))
    return optax.chain(*parts) if len(parts) > 1 else parts[0]
