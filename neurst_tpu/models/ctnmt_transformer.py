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
"""CTNMT: BERT-fused NMT (Yang et al., AAAI'20).

Parity: /root/reference/neurst/models/ctnmt_transformer.py — wraps a
BERT encoder; ``bert_mode`` in {bert_as_encoder, dynamic_switch,
bert_distillation}:
  * dynamic_switch: gated fusion g = sigmoid(W*bert + U*enc);
    fused = g * bert + (1 - g) * enc  (172-197);
  * bert_as_encoder: the BERT trunk replaces the source encoder;
  * bert_distillation: standard encoder; BERT states returned for the
    KD criterion.
Use with the rate-scheduled optimizer (freeze/thaw BERT) and the KD
criterion for asymmetric distillation.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.models.bert import BertModule
from neurst_tpu.models.encoder_decoder_model import (EncoderDecoderModel,
                                                     Seq2SeqModule)
from neurst_tpu.models.model import register_model
from neurst_tpu.models.transformer import Transformer, _encdec_flags
from neurst_tpu.utils.flags_core import Flag

__all__ = ["CtnmtTransformer"]


class CtnmtSeq2SeqModule(Seq2SeqModule):
    bert_mode: str = "dynamic_switch"
    bert_cfg: Optional[dict] = None

    def setup(self):
        super().setup()
        cfg = dict(self.bert_cfg or {})
        cfg.setdefault("vocab_size", self.src_vocab_size)
        cfg.setdefault("hidden_size", self.src_dim)
        self.bert = BertModule(dtype=self.dtype, name="bert", **cfg)
        if self.bert_mode == "dynamic_switch":
            self.ds_gate_w = nn.Dense(self.src_dim, use_bias=True,
                                      dtype=self.dtype, name="ds_gate_w")
            self.ds_gate_u = nn.Dense(self.src_dim, use_bias=False,
                                      dtype=self.dtype, name="ds_gate_u")

    def build_encoder(self):
        # bert_as_encoder: the BERT trunk IS the encoder; configs need
        # no encoder.* dims and no MT encoder params are allocated
        if self.bert_mode == "bert_as_encoder":
            return None
        return super().build_encoder()

    def _encode_states(self, inputs, is_training):
        """(fused encoder states, src padding, raw BERT states).

        In bert_distillation mode the BERT states are only consumed by
        the training criterion, so inference/beam decode skips the
        whole BERT forward (returns None for the third element).
        """
        src_padding = self.src_padding_of(inputs)
        need_bert = (self.bert_mode != "bert_distillation") \
            or is_training or self.is_initializing()
        bert_out = None
        if need_bert:
            bert_out = self.bert({"src": inputs["src"],
                                  "src_padding": src_padding},
                                 is_training=is_training)["encoder_outputs"]
        if self.bert_mode == "bert_as_encoder":
            return bert_out, src_padding, bert_out
        emb = self.embed_source(inputs["src"], is_training=is_training)
        enc = self.encoder(emb, src_padding, is_training=is_training)
        if self.bert_mode == "dynamic_switch":
            gate = nn.sigmoid(self.ds_gate_w(bert_out)
                              + self.ds_gate_u(enc))
            enc = gate * bert_out + (1.0 - gate) * enc
        return enc, src_padding, bert_out

    def encode(self, inputs, is_training=False):
        enc, src_padding, _ = self._encode_states(inputs, is_training)
        return enc, src_padding

    def __call__(self, inputs, is_training=False):
        enc, src_padding, bert_out = self._encode_states(
            inputs, is_training)
        trg_emb = self.trg_modality(inputs["trg_input"])
        dec_out, _ = self.decoder(
            trg_emb, memory=enc, memory_padding=src_padding,
            is_training=is_training)
        logits = self.output_logits(dec_out)
        if self.bert_mode == "bert_distillation" and is_training:
            # asymptotic distillation (CTNMT): pull the MT encoder
            # states toward the frozen BERT states; the criterion adds
            # the state-level term when these keys are present
            import jax
            return {"logits": logits,
                    "kd_student_states": enc,
                    "kd_teacher_states": jax.lax.stop_gradient(bert_out),
                    "kd_padding": src_padding}
        return logits


@register_model("ctnmt")
class CtnmtTransformer(Transformer):

    module_cls = CtnmtSeq2SeqModule

    @staticmethod
    def class_or_method_args():
        return Transformer.class_or_method_args() + [
            Flag("bert_mode", dtype=Flag.TYPE.STRING,
                 default="dynamic_switch",
                 choices=["bert_as_encoder", "dynamic_switch",
                          "bert_distillation"],
                 help="How the BERT trunk integrates with the NMT "
                      "encoder."),
            Flag("bert.num_layers", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of BERT layers."),
            Flag("bert.hidden_size", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The BERT hidden size (defaults to modality.dim)."),
            Flag("bert.num_attention_heads", dtype=Flag.TYPE.INTEGER,
                 default=12, help="The number of BERT attention heads."),
            Flag("bert.filter_size", dtype=Flag.TYPE.INTEGER, default=3072,
                 help="The BERT ffn filter size."),
            Flag("bert.max_positions", dtype=Flag.TYPE.INTEGER, default=512,
                 help="The BERT maximum positions."),
        ]

    def module_kwargs(self):
        kw = super().module_kwargs()
        a = self._args
        kw["bert_mode"] = a.get("bert_mode") or "dynamic_switch"
        kw["bert_cfg"] = {
            "num_layers": a.get("bert.num_layers") or 12,
            "hidden_size": a.get("bert.hidden_size")
            or kw.get("src_dim") or a.get("modality.dim"),
            "num_attention_heads": a.get("bert.num_attention_heads") or 12,
            "filter_size": a.get("bert.filter_size") or 3072,
            "max_positions": a.get("bert.max_positions") or 512,
        }
        return kw

    @classmethod
    def build_model_args_by_name(cls, name):
        """Named hparams families (parity: reference
        ctnmt_transformer.py:245-328; the reference's bert_config names
        map to bert.* dims here: base=12L/768/12h, large=24L/1024/16h).
        """
        # (dmodel, heads, enc, dec, filter, dropout, bert dims)
        families = {
            "ctnmt_toy": (8, 2, 2, 2, 10, 0.1, (2, 8, 2, 32)),
            "ctnmt_base": (768, 12, 12, 12, 3072, 0.2,
                           (12, 768, 12, 3072)),
            "ctnmt_big": (1024, 16, 12, 12, 4096, 0.3,
                          (24, 1024, 16, 4096)),
            "ctnmt_big_dp01": (1024, 16, 12, 12, 4096, 0.1,
                               (24, 1024, 16, 4096)),
        }
        if name not in families:
            return None
        (dmodel, heads, enc, dec, filt, dp,
         (b_l, b_d, b_h, b_f)) = families[name]
        params = {
            "bert_mode": "dynamic_switch",
            "modality.share_source_target_embedding": False,
            "modality.share_embedding_and_softmax_weights": True,
            "modality.dim": dmodel,
            "modality.timing": "sinusoids",
            "bert.num_layers": b_l,
            "bert.hidden_size": b_d,
            "bert.num_attention_heads": b_h,
            "bert.filter_size": b_f,
        }
        for side, n in (("encoder", enc), ("decoder", dec)):
            params.update({
                f"{side}.num_layers": n,
                f"{side}.hidden_size": dmodel,
                f"{side}.num_attention_heads": heads,
                f"{side}.filter_size": filt,
                f"{side}.attention_dropout_rate": dp,
                f"{side}.ffn_activation": "relu",
                f"{side}.ffn_dropout_rate": dp,
                f"{side}.layer_postprocess_dropout_rate": dp,
            })
        return {
            "model.class": cls.__name__,
            "model.params": params,
            "optimizer.class": "adam",
            "optimizer.params": {
                "epsilon": 1.e-9, "beta_1": 0.9, "beta_2": 0.98},
            "lr_schedule.class": "noam",
            "lr_schedule.params": {
                "initial_factor": 1.0, "dmodel": dmodel,
                "warmup_steps": 4000},
        }


from neurst_tpu.utils.hparams_sets import register_hparams_set  # noqa: E402

for _name in ("ctnmt_toy", "ctnmt_base", "ctnmt_big", "ctnmt_big_dp01"):
    register_hparams_set(_name)(
        lambda _n=_name: CtnmtTransformer.build_model_args_by_name(_n))
