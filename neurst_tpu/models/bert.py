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
"""BERT encoder trunk.

Parity: /root/reference/neurst/models/bert.py — word + learned position
+ token-type embeddings with post-embedding LayerNorm, post-norm
transformer encoder with gelu FFN, and a tanh pooler over [CLS].  Used
by CTNMT (BERT-fused NMT) and for restoring public BERT checkpoints.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import LayerNorm
from neurst_tpu.layers.encoders.transformer_encoder import TransformerEncoder
from neurst_tpu.models.model import BaseModel, dtype_by_name, register_model
from neurst_tpu.utils.flags_core import Flag

__all__ = ["Bert"]


class BertModule(nn.Module):
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_attention_heads: int = 12
    filter_size: int = 3072
    max_positions: int = 512
    num_token_types: int = 2
    dropout_rate: float = 0.1
    epsilon: float = 1e-12
    dtype: Any = jnp.float32

    def setup(self):
        init = nn.initializers.normal(0.02)
        self.word_embedding = self.param(
            "word_embedding", nn.with_partitioning(init, ("vocab", "embed")),
            (self.vocab_size, self.hidden_size), jnp.float32)
        self.position_embedding = self.param(
            "position_embedding", init,
            (self.max_positions, self.hidden_size), jnp.float32)
        self.token_type_embedding = self.param(
            "token_type_embedding", init,
            (self.num_token_types, self.hidden_size), jnp.float32)
        self.emb_ln = LayerNorm(epsilon=self.epsilon, dtype=self.dtype,
                                name="emb_ln")
        self.encoder = TransformerEncoder(
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            num_attention_heads=self.num_attention_heads,
            filter_size=self.filter_size, ffn_activation="gelu",
            attention_dropout_rate=self.dropout_rate,
            ffn_dropout_rate=self.dropout_rate,
            layer_postprocess_dropout_rate=self.dropout_rate,
            post_normalize=True,
            layer_postprocess_epsilon=self.epsilon,
            dtype=self.dtype, name="encoder")
        self.pooler = nn.Dense(self.hidden_size, dtype=self.dtype,
                               name="pooler")

    def __call__(self, inputs, is_training=False):
        """inputs: src [B, T], src_padding [B, T] (+ segment_ids).

        Returns {"encoder_outputs", "pooled_output"}."""
        ids = inputs["src"]
        padding = inputs.get("src_padding")
        if padding is None:
            padding = jnp.zeros(ids.shape, jnp.float32)
        segment = inputs.get("segment_ids")
        emb = jnp.take(jnp.asarray(self.word_embedding).astype(self.dtype),
                       ids, axis=0)
        pos = jnp.asarray(self.position_embedding).astype(self.dtype)
        emb = emb + pos[None, :ids.shape[1], :]
        if segment is None:
            segment = jnp.zeros(ids.shape, jnp.int32)
        emb = emb + jnp.take(
            jnp.asarray(self.token_type_embedding).astype(self.dtype),
            segment, axis=0)
        emb = self.emb_ln(emb)
        enc = self.encoder(emb, padding, is_training=is_training)
        pooled = jnp.tanh(self.pooler(enc[:, 0, :]))
        return {"encoder_outputs": enc, "pooled_output": pooled}


@register_model("bert")
class Bert(BaseModel):

    def __init__(self, args, meta, name=None):
        super().__init__(args, name=name)
        self._meta = dict(meta or {})
        a = self._args
        self._module = BertModule(
            vocab_size=self._meta["vocab_size"],
            hidden_size=a.get("hidden_size") or 768,
            num_layers=a.get("num_layers") or 12,
            num_attention_heads=a.get("num_attention_heads") or 12,
            filter_size=a.get("filter_size") or 3072,
            max_positions=a.get("max_positions") or 512,
            num_token_types=a.get("num_token_types") or 2,
            dropout_rate=a.get("dropout_rate") or 0.1,
            dtype=dtype_by_name(a.get("dtype")))

    @staticmethod
    def class_or_method_args():
        return [
            Flag("num_layers", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of encoder blocks."),
            Flag("hidden_size", dtype=Flag.TYPE.INTEGER, default=768,
                 help="The model dimension."),
            Flag("num_attention_heads", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of attention heads."),
            Flag("filter_size", dtype=Flag.TYPE.INTEGER, default=3072,
                 help="The FFN filter size."),
            Flag("max_positions", dtype=Flag.TYPE.INTEGER, default=512,
                 help="The maximum sequence positions."),
            Flag("num_token_types", dtype=Flag.TYPE.INTEGER, default=2,
                 help="The number of token (segment) types."),
            Flag("dropout_rate", dtype=Flag.TYPE.FLOAT, default=0.1,
                 help="The dropout rate."),
            Flag("dtype", dtype=Flag.TYPE.STRING, default="bfloat16",
                 help="The computation dtype."),
        ]

    @classmethod
    def new(cls, args, src_meta=None, trg_meta=None, name=None):
        return cls(args, src_meta or trg_meta, name=name)

    def example_inputs(self):
        return {"inputs": {"src": jnp.ones([1, 4], jnp.int32),
                           "src_padding": jnp.zeros([1, 4], jnp.float32)}}

    def call(self, params, inputs, is_training=False, rngs=None):
        return self._module.apply({"params": params}, inputs=inputs,
                                  is_training=is_training, rngs=rngs or {})
