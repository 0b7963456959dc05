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
"""Label-smoothed CE + teacher-distillation term.

Parity: /root/reference/neurst/criterions/
label_smoothed_cross_entropy_with_kd.py — adds a KL(teacher || student)
term weighted by ``kd_weight`` (CTNMT asymmetric distillation).  The
teacher distribution comes from ``model_out["teacher_logits"]`` or
``model_inp["teacher_probs"]``.
"""

import jax
import jax.numpy as jnp

from neurst_tpu.criterions.criterion import register_criterion
from neurst_tpu.criterions.label_smoothed_cross_entropy import \
    LabelSmoothedCrossEntropy
from neurst_tpu.layers.layer_utils import input_length_to_nonpadding
from neurst_tpu.utils.flags_core import Flag

__all__ = ["LabelSmoothedCrossEntropyWithKd"]


@register_criterion("label_smoothed_cross_entropy_with_kd")
class LabelSmoothedCrossEntropyWithKd(LabelSmoothedCrossEntropy):

    def __init__(self, args=None):
        super().__init__(args)
        v = self._args.get("kd_weight")
        self._kd_weight = 0.1 if v is None else float(v)
        assert 0.0 <= self._kd_weight < 1.0, (
            f"kd_weight must be in [0, 1), got {self._kd_weight}")
        v = self._args.get("kd_temperature")
        self._kd_temperature = 1.0 if v is None else float(v)

    @staticmethod
    def class_or_method_args():
        return LabelSmoothedCrossEntropy.class_or_method_args() + [
            Flag("kd_weight", dtype=Flag.TYPE.FLOAT, default=0.1,
                 help="The weight of the distillation term."),
            Flag("kd_temperature", dtype=Flag.TYPE.FLOAT, default=1.0,
                 help="The distillation softmax temperature."),
        ]

    def reduce_loss_terms(self, model_inp, model_out):
        """Token-weighted terms.  Exact for the logit-KD branch (the KD
        KL shares the CE's trg-token normalizer); for the CTNMT
        state-MSE branch the KD normalizer is source positions, so
        token weighting is a close approximation rather than exact."""
        ce_sum, n = super().reduce_loss_terms(model_inp, model_out)
        kd = self._kd_term(model_inp, model_out)
        if kd is None:
            return ce_sum, n
        # loss_sum/denom must equal reduce_loss: fold the (already
        # mean-normalized) KD term in at weight w per token
        return ((1.0 - self._kd_weight) * ce_sum
                + self._kd_weight * kd * n), n

    def reduce_loss(self, model_inp, model_out):
        ce = super().reduce_loss(model_inp, model_out)
        kd = self._kd_term(model_inp, model_out)
        if kd is None:
            return ce
        return (1.0 - self._kd_weight) * ce + self._kd_weight * kd

    def _kd_term(self, model_inp, model_out):
        """The mean-normalized distillation term (temperature factor
        included), or None when no teacher signal is present.  Kept
        separate from the CE so reduce_loss_terms computes the [B,T,V]
        CE reductions exactly once."""
        logits = model_out["logits"] if isinstance(model_out, dict) \
            else model_out
        teacher_logits = None
        if isinstance(model_out, dict):
            teacher_logits = model_out.get("teacher_logits")
        if teacher_logits is None:
            teacher_logits = model_inp.get("teacher_logits")
        if teacher_logits is None:
            # CTNMT asymptotic distillation: state-level MSE between
            # the encoder states and the (stopped-gradient) BERT states
            # emitted by CtnmtSeq2SeqModule in bert_distillation mode
            if isinstance(model_out, dict) \
                    and "kd_teacher_states" in model_out:
                s = model_out["kd_student_states"].astype(jnp.float32)
                t = model_out["kd_teacher_states"].astype(jnp.float32)
                pad = model_out.get("kd_padding")
                w = (1.0 - pad).astype(jnp.float32) if pad is not None \
                    else jnp.ones(s.shape[:2], jnp.float32)
                # squared L2 norm over the hidden dim per position
                # (reference uses square(norm(s - t)), i.e. a SUM, not
                # a mean — a mean under-weights KD by ~hidden_size)
                sq = jnp.sum((s - t) ** 2, axis=-1)
                return jnp.sum(sq * w) / jnp.maximum(jnp.sum(w), 1.)
            return None
        t = self._kd_temperature
        student_lp = jax.nn.log_softmax(
            logits.astype(jnp.float32) / t, axis=-1)
        teacher_p = jax.nn.softmax(
            teacher_logits.astype(jnp.float32) / t, axis=-1)
        kl = jnp.sum(teacher_p * (jnp.log(jnp.maximum(teacher_p, 1e-20))
                                  - student_lp), axis=-1)
        labels = model_inp["trg"]
        padding = model_inp.get("trg_padding")
        if padding is not None:
            weights = (1.0 - padding).astype(jnp.float32)
        else:
            weights = input_length_to_nonpadding(
                model_inp["trg_length"], labels.shape[1])
        kd_loss = jnp.sum(kl * weights) / jnp.maximum(jnp.sum(weights), 1.)
        return (t ** 2) * kd_loss
