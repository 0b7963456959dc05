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
"""Light-convolution encoder stack
(parity: /root/reference/neurst/layers/encoders/light_convolution_encoder.py).
Per-layer kernel sizes follow the Pay-Less-Attention configs."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.attentions.light_convolution_layer import \
    LightConvolutionLayer
from neurst_tpu.layers.common_layers import LayerNorm, TransformerFFN, \
    apply_dropout

__all__ = ["LightConvolutionEncoder"]


class LightConvolutionEncoder(nn.Module):
    num_layers: int
    hidden_size: int
    num_heads: int
    filter_size: int
    kernel_sizes: Sequence[int] = (3, 7, 15, 31, 31, 31, 31)
    conv_type: str = "lightweight"
    use_glu: bool = True
    ffn_activation: str = "relu"
    weight_dropout_rate: float = 0.0
    ffn_dropout_rate: float = 0.0
    layer_postprocess_dropout_rate: float = 0.0
    post_normalize: bool = False
    layer_postprocess_epsilon: float = 1e-6
    dtype: Any = jnp.float32

    def setup(self):
        kernels = list(self.kernel_sizes)
        while len(kernels) < self.num_layers:
            kernels.append(kernels[-1])
        self.conv_layers = [
            LightConvolutionLayer(
                kernel_size=kernels[i], num_heads=self.num_heads,
                conv_dim=self.hidden_size, output_dim=self.hidden_size,
                conv_type=self.conv_type, use_glu=self.use_glu,
                weight_dropout_rate=self.weight_dropout_rate,
                dtype=self.dtype, name=f"layer_{i}_conv")
            for i in range(self.num_layers)]
        self.conv_lns = [LayerNorm(epsilon=self.layer_postprocess_epsilon,
                                   dtype=self.dtype, name=f"layer_{i}_conv_ln")
                         for i in range(self.num_layers)]
        self.ffns = [TransformerFFN(
            filter_size=self.filter_size, output_size=self.hidden_size,
            activation=self.ffn_activation,
            dropout_rate=self.ffn_dropout_rate, dtype=self.dtype,
            name=f"layer_{i}_ffn") for i in range(self.num_layers)]
        self.ffn_lns = [LayerNorm(epsilon=self.layer_postprocess_epsilon,
                                  dtype=self.dtype, name=f"layer_{i}_ffn_ln")
                        for i in range(self.num_layers)]
        if not self.post_normalize:
            self.output_ln = LayerNorm(
                epsilon=self.layer_postprocess_epsilon, dtype=self.dtype,
                name="output_ln")

    def _block(self, ln, x, fn, is_training):
        y = x if self.post_normalize else ln(x)
        y = fn(y)
        y = apply_dropout(self, y, self.layer_postprocess_dropout_rate,
                          is_training)
        y = x + y
        return ln(y) if self.post_normalize else y

    def __call__(self, inputs, inputs_padding, is_training=False):
        # zero out padded positions so conv windows do not leak them
        x = inputs * (1.0 - inputs_padding)[:, :, None].astype(inputs.dtype)
        for i in range(self.num_layers):
            x = self._block(
                self.conv_lns[i], x,
                lambda y, i=i: self.conv_layers[i](
                    y, causal=False, is_training=is_training)[0],
                is_training)
            x = x * (1.0 - inputs_padding)[:, :, None].astype(x.dtype)
            x = self._block(
                self.ffn_lns[i], x,
                lambda y, i=i: self.ffns[i](y, is_training=is_training),
                is_training)
        if not self.post_normalize:
            x = self.output_ln(x)
        return x
