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
"""Transformer encoder/decoder blocks.

Parity: /root/reference/neurst/layers/transformer_layers.py (pre/post
norm via PrePostProcessingWrapper, decoder-layer-owned decode cache,
``memorize_memory`` cross-attention precompute).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.attentions.multi_head_attention import (
    MultiHeadAttention, MultiHeadSelfAttention)
from neurst_tpu.layers.common_layers import (LayerNorm, TransformerFFN,
                                             apply_dropout)

__all__ = ["TransformerEncoderLayer", "TransformerDecoderLayer"]

Dtype = Any


class _LayerCommon(nn.Module):
    """Shared hyperparameters + the pre/post-norm residual pattern."""
    hidden_size: int = 0
    num_attention_heads: int = 0
    filter_size: int = 0
    ffn_activation: str = "relu"
    attention_dropout_rate: float = 0.0
    ffn_dropout_rate: float = 0.0
    layer_postprocess_dropout_rate: float = 0.0
    post_normalize: bool = False
    layer_postprocess_epsilon: float = 1e-6
    # mixture-of-experts FFN (layers/moe.py); 0/1 = dense FFN
    moe_num_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_aux_loss_coef: float = 0.01
    moe_router_jitter: float = 0.01
    dtype: Dtype = jnp.float32

    def _make_ffn(self):
        if int(self.moe_num_experts) > 1:
            from neurst_tpu.layers.moe import MoeFFN
            return MoeFFN(
                num_experts=int(self.moe_num_experts),
                filter_size=self.filter_size,
                output_size=self.hidden_size,
                top_k=int(self.moe_top_k),
                capacity_factor=float(self.moe_capacity_factor),
                aux_loss_coef=float(self.moe_aux_loss_coef),
                router_jitter=float(self.moe_router_jitter),
                activation=self.ffn_activation,
                dropout_rate=self.ffn_dropout_rate,
                dtype=self.dtype, name="ffn")
        return TransformerFFN(
            filter_size=self.filter_size, output_size=self.hidden_size,
            activation=self.ffn_activation,
            dropout_rate=self.ffn_dropout_rate,
            dtype=self.dtype, name="ffn")

    def _prepost(self, ln, x, sublayer, is_training):
        """LN -> sublayer -> dropout -> residual (pre-norm) or
        sublayer -> dropout -> residual -> LN (post-norm).
        `sublayer` returns (y, aux)."""
        y = x if self.post_normalize else ln(x)
        y, aux = sublayer(y)
        y = apply_dropout(self, y, self.layer_postprocess_dropout_rate,
                          is_training)
        y = x + y
        if self.post_normalize:
            y = ln(y)
        return y, aux

    def _make_ln(self, name):
        return LayerNorm(epsilon=self.layer_postprocess_epsilon,
                         dtype=self.dtype, name=name)


class TransformerEncoderLayer(_LayerCommon):

    def setup(self):
        self.self_attention = MultiHeadSelfAttention(
            num_heads=self.num_attention_heads, num_units=self.hidden_size,
            attention_dropout_rate=self.attention_dropout_rate,
            dtype=self.dtype, name="self_attention")
        self.self_attention_ln = self._make_ln("self_attention_ln")
        self.ffn = self._make_ffn()
        self.ffn_ln = self._make_ln("ffn_ln")

    def __call__(self, x, attention_bias, is_training=False,
                 flash_lengths=None, flash_causal=False,
                 ring_axis=None, ring_lengths=None):
        x, _ = self._prepost(
            self.self_attention_ln, x,
            lambda y: self.self_attention(y, bias=attention_bias,
                                          is_training=is_training,
                                          flash_lengths=flash_lengths,
                                          flash_causal=flash_causal,
                                          ring_axis=ring_axis,
                                          ring_lengths=ring_lengths),
            is_training)
        x, _ = self._prepost(
            self.ffn_ln, x,
            lambda y: (self.ffn(y, is_training=is_training), None),
            is_training)
        return x


class TransformerDecoderLayer(_LayerCommon):
    with_cross_attention: bool = True

    def setup(self):
        self.self_attention = MultiHeadSelfAttention(
            num_heads=self.num_attention_heads, num_units=self.hidden_size,
            attention_dropout_rate=self.attention_dropout_rate,
            dtype=self.dtype, name="self_attention")
        self.self_attention_ln = self._make_ln("self_attention_ln")
        if self.with_cross_attention:
            self.cross_attention = MultiHeadAttention(
                num_heads=self.num_attention_heads,
                num_units=self.hidden_size,
                attention_dropout_rate=self.attention_dropout_rate,
                dtype=self.dtype, name="cross_attention")
            self.cross_attention_ln = self._make_ln("cross_attention_ln")
        self.ffn = self._make_ffn()
        self.ffn_ln = self._make_ln("ffn_ln")

    def memorize_memory(self, memory):
        """Precomputes cross-attention k/v for decoding
        (parity: transformer_layers.py:156-170)."""
        k, v = self.cross_attention.compute_kv(memory)
        return {"memory": {"keys": k, "values": v}}

    def __call__(self, x, self_attention_bias=None, memory=None,
                 memory_bias=None, cache: Optional[dict] = None,
                 decode_step=None, is_training=False,
                 self_flash_causal=False, cross_flash_lengths=None,
                 beam_anc=None):
        """Returns (output, new_cache).

        ``self_flash_causal=True`` (teacher-forcing path only) runs the
        causal self-attention through the flash kernel instead of the
        bias; ``cross_flash_lengths`` does the same for cross-attention
        with per-row valid source lengths.  ``beam_anc`` (stepwise beam
        decode only): ancestor-index matrix for indirect kv-cache reads
        — see MultiHeadSelfAttention._attend_indirect.
        """
        new_cache = {} if cache is not None else None

        def self_fn(y):
            return self.self_attention(
                y, bias=self_attention_bias,
                cache=None if cache is None else cache.get("self"),
                decode_step=decode_step, is_training=is_training,
                flash_lengths=(jnp.full((y.shape[0],), y.shape[1],
                                        jnp.int32)
                               if self_flash_causal and cache is None
                               else None),
                flash_causal=self_flash_causal,
                beam_anc=beam_anc)

        x, self_upd = self._prepost(self.self_attention_ln, x, self_fn,
                                    is_training)
        if new_cache is not None and self_upd is not None:
            new_cache["self"] = self_upd

        if self.with_cross_attention:
            def cross_fn(y):
                out, _ = self.cross_attention(
                    y, memory=memory, bias=memory_bias,
                    cache=None if cache is None else cache.get("memory"),
                    is_training=is_training,
                    flash_lengths=cross_flash_lengths)
                return out, None

            x, _ = self._prepost(self.cross_attention_ln, x, cross_fn,
                                 is_training)
            if new_cache is not None and cache is not None \
                    and "memory" in cache:
                new_cache["memory"] = cache["memory"]

        x, _ = self._prepost(
            self.ffn_ln, x,
            lambda y: (self.ffn(y, is_training=is_training), None),
            is_training)
        return x, new_cache
