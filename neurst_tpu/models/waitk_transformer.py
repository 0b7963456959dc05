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
"""Wait-k Transformer for simultaneous translation.

Parity: /root/reference/neurst/models/waitk_transformer.py — training
samples a lagging from a list per batch (86-117); decoding masks
cross-attention so target position i sees source positions < i + k; a
(usually) unidirectional encoder (``encoder.attention_monotonic``) keeps
streamed source prefixes consistent, enabling ``incremental_encode``/
``incremental_decode`` for the SimulEval agent (119-139).
"""

import random
from typing import Any, Optional, Union

import jax.numpy as jnp

from neurst_tpu.models.encoder_decoder_model import Seq2SeqModule
from neurst_tpu.models.model import register_model
from neurst_tpu.models.transformer import Transformer
from neurst_tpu.utils.flags_core import Flag

__all__ = ["WaitkTransformer"]


class WaitkSeq2SeqModule(Seq2SeqModule):
    waitk_lagging: int = 1

    def __call__(self, inputs, is_training=False):
        enc, src_padding = self.encode(inputs, is_training=is_training)
        trg_emb = self.trg_modality(inputs["trg_input"])
        lagging = inputs.get("waitk_lagging")
        if lagging is None:
            lagging = self.waitk_lagging
        dec_out, _ = self.decoder(
            trg_emb, memory=enc, memory_padding=src_padding,
            decode_lagging=lagging, is_training=is_training)
        return self.output_logits(dec_out)

    def decode_step(self, ids, cache, step, decode_lagging=None):
        if decode_lagging is None:
            decode_lagging = self.waitk_lagging
        return super().decode_step(ids, cache, step,
                                   decode_lagging=decode_lagging)


@register_model("waitk_transformer")
class WaitkTransformer(Transformer):

    module_cls = WaitkSeq2SeqModule

    @staticmethod
    def class_or_method_args():
        return Transformer.class_or_method_args() + [
            Flag("wait_k", dtype=Flag.TYPE.STRING, default=3,
                 help="The lagging k (int), or a list to sample from "
                      "during training (test-time wait-k)."),
        ]

    def __init__(self, args, src_meta, trg_meta, name=None):
        wait_k = args.get("wait_k", 3)
        if isinstance(wait_k, str):
            import yaml
            wait_k = yaml.safe_load(wait_k)
        self._wait_k_choices = (list(wait_k)
                                if isinstance(wait_k, (list, tuple))
                                else [int(wait_k)])
        super().__init__(args, src_meta, trg_meta, name=name)

    @property
    def wait_k(self) -> int:
        """The inference-time lagging (smallest configured k)."""
        return min(self._wait_k_choices)

    def sample_lagging(self) -> int:
        """Training-time lagging sample (parity: waitk 86-117)."""
        return random.choice(self._wait_k_choices)

    def module_kwargs(self):
        kw = super().module_kwargs()
        kw["waitk_lagging"] = self.wait_k
        return kw

    # ---------------- streaming interface (SimulEval) -------------- #

    def incremental_encode(self, params, src_prefix, src_padding=None):
        """Re-encodes a (growing) source prefix.  With a monotonic
        encoder, prefix states equal their values under the full source
        (parity: transformer_encoder.py:138-175)."""
        inputs = {"src": src_prefix, "src_padding": src_padding}
        if src_padding is None:
            inputs["src_padding"] = jnp.zeros(src_prefix.shape,
                                              jnp.float32)
        return self._module.apply(
            {"params": params}, inputs=inputs, is_training=False,
            method=self._module.encode)

    def incremental_decode(self, params, ids, cache, step):
        """One decode step against the current encoded prefix."""
        return self._module.apply(
            {"params": params}, ids, cache, step,
            method=self._module.decode_step)
