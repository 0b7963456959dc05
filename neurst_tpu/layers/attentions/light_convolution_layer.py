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
"""Lightweight / dynamic convolutions (Pay Less Attention, Wu et al. 2019).

Parity: /root/reference/neurst/layers/attentions/light_convolution_layer.py
— GLU input projection, depthwise softmax-normalized convolution with
``num_heads`` shared weight groups (lightweight) or per-position
predicted weights (dynamic), output projection.  Decoding keeps a
static ``[B, kernel, conv_dim]`` ring buffer in the cache.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import apply_dropout

__all__ = ["LightConvolutionLayer"]


def _unfold(x, kernel_size: int, causal: bool):
    """x [B, T, C] -> sliding windows [B, T, K, C]."""
    if causal:
        pad_left, pad_right = kernel_size - 1, 0
    else:
        pad_left = (kernel_size - 1) // 2
        pad_right = kernel_size - 1 - pad_left
    x = jnp.pad(x, [[0, 0], [pad_left, pad_right], [0, 0]])
    t = x.shape[1] - kernel_size + 1
    return jnp.stack([x[:, k:k + t] for k in range(kernel_size)], axis=2)


class LightConvolutionLayer(nn.Module):
    kernel_size: int
    num_heads: int
    conv_dim: int
    output_dim: int
    conv_type: str = "lightweight"   # or "dynamic"
    use_glu: bool = True
    weight_dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        assert self.conv_type in ("lightweight", "dynamic")
        assert self.conv_dim % self.num_heads == 0
        self.in_proj = nn.Dense(
            self.conv_dim * (2 if self.use_glu else 1),
            dtype=self.dtype, name="in_proj")
        self.out_proj = nn.Dense(self.output_dim, dtype=self.dtype,
                                 name="out_proj")
        if self.conv_type == "lightweight":
            self.conv_shared_weight = self.param(
                "conv_shared_weight", nn.initializers.lecun_normal(),
                (self.num_heads, self.kernel_size), jnp.float32)
        else:
            self.conv_weight_linear = nn.Dense(
                self.num_heads * self.kernel_size, use_bias=False,
                dtype=self.dtype, name="conv_weight_linear")

    def _conv_weights(self, h, batch, length):
        """softmax-normalized weights [B, T, H, K]."""
        if self.conv_type == "lightweight":
            w = jax.nn.softmax(
                jnp.asarray(self.conv_shared_weight).astype(jnp.float32),
                axis=-1).astype(self.dtype)
            return jnp.broadcast_to(
                w[None, None],
                (batch, length, self.num_heads, self.kernel_size))
        w = self.conv_weight_linear(h).reshape(
            batch, length, self.num_heads, self.kernel_size)
        return jax.nn.softmax(w.astype(jnp.float32),
                              axis=-1).astype(self.dtype)

    def __call__(self, x, causal=False, cache=None, decode_step=None,
                 is_training=False):
        """x [B, T, D] -> ([B, T, output_dim], new_cache)."""
        batch = x.shape[0]
        h = self.in_proj(x)
        if self.use_glu:
            a, b = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(b)

        if cache is not None and decode_step is not None:
            # ring buffer [B, K, conv_dim]: shift left + append current
            buf = jnp.roll(cache["conv"], -1, axis=1)
            buf = buf.at[:, -1].set(h[:, 0].astype(buf.dtype))
            new_cache = {"conv": buf}
            windows = buf[:, None, :, :]   # [B, 1, K, conv_dim]
            length = 1
        else:
            new_cache = cache
            windows = _unfold(h, self.kernel_size, causal)
            length = h.shape[1]

        w = self._conv_weights(h, batch, length)
        w = apply_dropout(self, w, self.weight_dropout_rate, is_training)
        head_dim = self.conv_dim // self.num_heads
        windows = windows.reshape(batch, length, self.kernel_size,
                                  self.num_heads, head_dim)
        out = jnp.einsum("BTKHD,BTHK->BTHD", windows, w)
        out = out.reshape(batch, length, self.conv_dim)
        return self.out_proj(out), new_cache

    def make_cache(self, batch_size):
        return {"conv": jnp.zeros(
            (batch_size, self.kernel_size, self.conv_dim), self.dtype)}
