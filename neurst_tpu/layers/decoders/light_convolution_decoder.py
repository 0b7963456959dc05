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
"""Light-convolution decoder stack
(parity: /root/reference/neurst/layers/decoders/light_convolution_decoder.py):
causal conv block + cross-attention + ffn per layer; the decode cache
holds each layer's conv ring buffer and the precomputed memory k/v."""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers import layer_utils
from neurst_tpu.layers.attentions.light_convolution_layer import \
    LightConvolutionLayer
from neurst_tpu.layers.attentions.multi_head_attention import \
    MultiHeadAttention
from neurst_tpu.layers.common_layers import (LayerNorm, TransformerFFN,
                                             apply_dropout)

__all__ = ["LightConvolutionDecoder"]


class LightConvolutionDecoder(nn.Module):
    num_layers: int
    hidden_size: int
    num_heads: int
    filter_size: int
    kernel_sizes: Sequence[int] = (3, 7, 15, 31, 31, 31)
    conv_type: str = "lightweight"
    use_glu: bool = True
    ffn_activation: str = "relu"
    weight_dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    ffn_dropout_rate: float = 0.0
    layer_postprocess_dropout_rate: float = 0.0
    post_normalize: bool = False
    layer_postprocess_epsilon: float = 1e-6
    with_cross_attention: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        kernels = list(self.kernel_sizes)
        while len(kernels) < self.num_layers:
            kernels.append(kernels[-1])
        n = self.num_layers
        self.conv_layers = [
            LightConvolutionLayer(
                kernel_size=kernels[i], num_heads=self.num_heads,
                conv_dim=self.hidden_size, output_dim=self.hidden_size,
                conv_type=self.conv_type, use_glu=self.use_glu,
                weight_dropout_rate=self.weight_dropout_rate,
                dtype=self.dtype, name=f"layer_{i}_conv")
            for i in range(n)]
        self.conv_lns = [LayerNorm(epsilon=self.layer_postprocess_epsilon,
                                   dtype=self.dtype,
                                   name=f"layer_{i}_conv_ln")
                         for i in range(n)]
        if self.with_cross_attention:
            self.cross_attentions = [
                MultiHeadAttention(
                    num_heads=self.num_heads, num_units=self.hidden_size,
                    attention_dropout_rate=self.attention_dropout_rate,
                    dtype=self.dtype, name=f"layer_{i}_cross_attention")
                for i in range(n)]
            self.cross_lns = [
                LayerNorm(epsilon=self.layer_postprocess_epsilon,
                          dtype=self.dtype, name=f"layer_{i}_cross_ln")
                for i in range(n)]
        self.ffns = [TransformerFFN(
            filter_size=self.filter_size, output_size=self.hidden_size,
            activation=self.ffn_activation,
            dropout_rate=self.ffn_dropout_rate, dtype=self.dtype,
            name=f"layer_{i}_ffn") for i in range(n)]
        self.ffn_lns = [LayerNorm(epsilon=self.layer_postprocess_epsilon,
                                  dtype=self.dtype,
                                  name=f"layer_{i}_ffn_ln")
                        for i in range(n)]
        if not self.post_normalize:
            self.output_ln = LayerNorm(
                epsilon=self.layer_postprocess_epsilon, dtype=self.dtype,
                name="output_ln")

    def _block(self, ln, x, fn, is_training):
        y = x if self.post_normalize else ln(x)
        y, aux = fn(y)
        y = apply_dropout(self, y, self.layer_postprocess_dropout_rate,
                          is_training)
        y = x + y
        return (ln(y) if self.post_normalize else y), aux

    def create_decoding_internal_cache(self, encoder_outputs,
                                       decode_padded_length: int,
                                       batch_size: Optional[int] = None):
        if batch_size is None:
            batch_size = encoder_outputs.shape[0]
        cache = {}
        for i in range(self.num_layers):
            layer_cache = {"conv": self.conv_layers[i].make_cache(
                batch_size)["conv"]}
            if self.with_cross_attention:
                k, v = self.cross_attentions[i].compute_kv(encoder_outputs)
                layer_cache["memory"] = {"keys": k, "values": v}
            cache[f"layer_{i}"] = layer_cache
        return cache

    def __call__(self, inputs, memory=None, memory_padding=None,
                 cache: Optional[dict] = None, decode_step=None,
                 decode_lagging=None, is_training=False):
        memory_bias = None
        if self.with_cross_attention and memory_padding is not None:
            memory_bias = layer_utils.input_padding_to_bias(memory_padding)
        x = inputs
        new_cache = {} if cache is not None else None
        for i in range(self.num_layers):
            layer_cache = None if cache is None else cache.get(f"layer_{i}")

            def conv_fn(y, i=i, layer_cache=layer_cache):
                out, upd = self.conv_layers[i](
                    y, causal=True,
                    cache=None if layer_cache is None
                    else {"conv": layer_cache["conv"]},
                    decode_step=decode_step, is_training=is_training)
                return out, upd

            x, conv_upd = self._block(self.conv_lns[i], x, conv_fn,
                                      is_training)
            if new_cache is not None:
                new_cache[f"layer_{i}"] = {
                    "conv": (conv_upd or layer_cache)["conv"]}
                if layer_cache is not None and "memory" in layer_cache:
                    new_cache[f"layer_{i}"]["memory"] = \
                        layer_cache["memory"]
            if self.with_cross_attention:
                def cross_fn(y, i=i, layer_cache=layer_cache):
                    out, _ = self.cross_attentions[i](
                        y, memory=memory, bias=memory_bias,
                        cache=None if layer_cache is None
                        else layer_cache.get("memory"),
                        is_training=is_training)
                    return out, None
                x, _ = self._block(self.cross_lns[i], x, cross_fn,
                                   is_training)
            x, _ = self._block(
                self.ffn_lns[i], x,
                lambda y, i=i: (self.ffns[i](y, is_training=is_training),
                                None),
                is_training)
        if not self.post_normalize:
            x = self.output_ln(x)
        return x, new_cache
