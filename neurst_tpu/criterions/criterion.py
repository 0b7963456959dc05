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
"""Criterion base (parity: /root/reference/neurst/criterions/criterion.py)."""

from neurst_tpu.utils.registry import setup_registry

__all__ = ["Criterion", "build_criterion", "register_criterion"]


class Criterion(object):
    """Maps (model_inp, model_out) -> per-sample loss statistics."""

    def __init__(self, args=None):
        self._args = dict(args or {})

    @staticmethod
    def class_or_method_args():
        return []

    def __call__(self, model_inp: dict, model_out):
        """Returns a tuple of per-sample statistics arrays."""
        raise NotImplementedError

    def reduce_loss(self, model_inp: dict, model_out):
        """Scalar training loss."""
        raise NotImplementedError

    def reduce_loss_terms(self, model_inp: dict, model_out):
        """Decomposed loss ``(loss_sum, denom)`` for exact gradient
        accumulation: the big-batch loss over several micro-batches is
        ``sum(loss_sums) / sum(denoms)``.  Criterions whose
        ``reduce_loss`` normalizes by a batch-dependent quantity (e.g.
        token count) must override this so ragged micro-batches match
        big-batch semantics (parity target:
        /root/reference/neurst/training/gradaccum_keras_model.py:162-260
        accumulates raw gradients of the *same* normalized loss across
        the update cycle — which equally weights micro-batches; we
        instead reproduce exact big-batch weighting).

        Default: ``(reduce_loss, 1)`` — equal micro-batch weighting.
        """
        import jax.numpy as jnp
        return (self.reduce_loss(model_inp, model_out),
                jnp.asarray(1.0, jnp.float32))

    def reduce_metrics(self, eval_res_list) -> dict:
        """Aggregates statistics from many batches into eval metrics."""
        raise NotImplementedError

    def reduce_sample_metrics(self, eval_res) -> list:
        """Per-sample metric dicts (for sequence_evaluator)."""
        raise NotImplementedError

    def as_metric(self):
        """A Metric wrapper for validators."""
        raise NotImplementedError


def _create_criterion(cls, args, **kwargs):
    return cls(args, **kwargs)


build_criterion, register_criterion = setup_registry(
    "criterion", base_class=Criterion, create_fn=_create_criterion)
