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
"""Label-smoothed cross entropy.

Parity: /root/reference/neurst/criterions/label_smoothed_cross_entropy.py
(soft targets with confidence 1-eps / eps/(V-1), normalizing-constant
subtraction, (nll_sum, n_samples, n_tokens) statistics, PPL = 2^(nll/tok),
token weights from trg_padding or trg_length, optional sample mask).

Computed in float32 on top of (possibly bf16) logits.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from neurst_tpu.criterions.criterion import Criterion, register_criterion
from neurst_tpu.layers.layer_utils import input_length_to_nonpadding
from neurst_tpu.metrics.metric import MetricWrapper
from neurst_tpu.utils.flags_core import Flag

__all__ = ["LabelSmoothedCrossEntropy"]


@register_criterion("label_smoothed_cross_entropy")
class LabelSmoothedCrossEntropy(Criterion):

    def __init__(self, args=None):
        super().__init__(args)
        self._label_smoothing = float(
            self._args.get("label_smoothing") or 0.0)

    @staticmethod
    def class_or_method_args():
        return [Flag("label_smoothing", dtype=Flag.TYPE.FLOAT, default=0.,
                     help="The label smoothing constant.")]

    # the train step checks this before requesting prelogits (the
    # profile tool's logits-mean ablation subclass sets it False)
    supports_prelogits = True

    def __call__(self, model_inp: dict, model_out):
        """Returns (nll_sum [B], n_samples [1], n_tokens [B]).

        ``model_out`` is the logits tensor, a dict with "logits", or —
        on the fused softmax+CE training path — a dict with
        "prelogits"/"softmax_w"(/"softmax_bias"): then the projection
        and the cross entropy run in one Pallas kernel and the
        [B, T, V] logits never reach HBM (ops/fused_ce, ~37 -> ~25 ms
        of the transformer_base step; see tools/PROFILE_train_step.json).
        """
        labels = model_inp["trg"].astype(jnp.int32)
        prelogits = model_out.get("prelogits") \
            if isinstance(model_out, dict) else None
        if prelogits is not None:
            logits = None
            vocab_size = model_out["softmax_w"].shape[0]
        else:
            logits = model_out["logits"] if isinstance(model_out, dict) \
                else model_out
            vocab_size = logits.shape[-1]

        confidence = 1.0 - self._label_smoothing
        low_confidence = self._label_smoothing / (vocab_size - 1)
        if prelogits is not None:
            # fused projection + CE (falls back to the identical jnp
            # formula off-TPU inside fused_linear_xent)
            from neurst_tpu.ops.fused_ce import fused_linear_xent
            xent = fused_linear_xent(
                prelogits, model_out["softmax_w"], labels, confidence,
                low_confidence, bias=model_out.get("softmax_bias"))
        else:
            # Fused soft-target cross entropy: with logp_v = z_v - lse,
            #   -sum_v soft_v * logp_v
            #     = -(conf-low) * (z_label - lse) - low * (sum z - V*lse)
            # Only [B,T] reductions are kept; the f32 casts fuse into
            # the reductions and the softmax needed for the gradient is
            # recomputed inside the backward fusion.
            z32 = logits.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(z32, axis=-1)
            label_z = jnp.take_along_axis(z32, labels[..., None],
                                          axis=-1)[..., 0]
            sum_z = jnp.sum(z32, axis=-1)
            xent = -(confidence - low_confidence) * (label_z - lse) \
                - low_confidence * (sum_z - vocab_size * lse)
        if self._label_smoothing:
            normalizing = -(
                confidence * math.log(confidence)
                + (vocab_size - 1) * low_confidence
                * math.log(low_confidence + 1e-20))
            xent = xent - normalizing

        padding = model_inp.get("trg_padding")
        length = model_inp.get("trg_length", model_inp.get("length"))
        if padding is not None:
            weights = (1.0 - padding).astype(jnp.float32)
        else:
            weights = input_length_to_nonpadding(length, labels.shape[1])
        if model_inp.get("sample_mask") is not None:
            weights = weights * model_inp["sample_mask"][:, None]

        nll_sum = jnp.sum(xent * weights, axis=1)
        n_samples = (jnp.sum(model_inp["sample_mask"])[None]
                     if model_inp.get("sample_mask") is not None
                     else jnp.asarray([labels.shape[0]], jnp.float32))
        n_tokens = jnp.sum(weights, axis=1)
        return nll_sum, n_samples, n_tokens

    def reduce_loss(self, model_inp, model_out):
        nll_sum, _, n_tokens = self(model_inp, model_out)
        return jnp.sum(nll_sum) / jnp.maximum(jnp.sum(n_tokens), 1.0)

    def reduce_loss_terms(self, model_inp, model_out):
        """(sum of token nlls, token count): grad accumulation over
        ragged micro-batches then matches one big batch exactly."""
        nll_sum, _, n_tokens = self(model_inp, model_out)
        return jnp.sum(nll_sum), jnp.sum(n_tokens)

    def reduce_metrics(self, eval_res_list) -> dict:
        nll, samples, tokens = 0.0, 0.0, 0.0
        for _nll, _s, _t in eval_res_list:
            nll += float(np.sum(_nll))
            samples += float(np.sum(_s))
            tokens += float(np.sum(_t))
        return {"NLL": nll / max(samples, 1.0),
                "PPL": 2.0 ** (nll / max(tokens, 1.0))}

    def reduce_sample_metrics(self, eval_res) -> list:
        nll_sum, _, n_tokens = eval_res
        nll_sum = np.asarray(nll_sum)
        n_tokens = np.asarray(n_tokens)
        return [{"nll": float(n), "ppl": 2.0 ** (float(n) / max(float(t), 1.)),
                 "nll_per_token": float(n) / max(float(t), 1.)}
                for n, t in zip(nll_sum, n_tokens)]

    def as_metric(self):
        return MetricWrapper(flag="NLL", greater_is_better=False)
