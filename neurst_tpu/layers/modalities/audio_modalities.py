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
"""Audio input modalities.

Parity: /root/reference/neurst/layers/modalities/audio_modalities.py:22-110
(AudioConv2dSubsamplingLayer): N x (pad k//2 -> Conv2D stride-s VALID ->
optional fp32 LayerNorm -> ReLU), flatten channel x freq, dense
projection to the model dim.  With kernel 3 / stride 2 / 2 layers the
time axis shrinks by ceil(ceil(T/2)/2) (4x), and the feature axis
likewise — the subsampled length formula lives in
``subsampled_length``.

Convolutions map to XLA's conv ops which tile well onto the MXU; the
channel dim (256) keeps the contraction dense.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import sinusoidal_position_signal

__all__ = ["AudioConv2dSubsampling", "subsampled_length"]


def subsampled_length(length, num_layers: int = 2, strides: int = 2):
    """ceil-division of `length` by strides, num_layers times.

    Works on python ints and jnp arrays (parity:
    speech_transformer.py:179-190).
    """
    for _ in range(num_layers):
        length = -(-length // strides) if isinstance(length, int) \
            else -((-length) // strides)
    return length


class AudioConv2dSubsampling(nn.Module):
    embedding_dim: int
    channels: int = 256
    kernel_size: int = 3
    strides: int = 2
    layer_norm: bool = True
    num_layers: int = 2
    timing: str = "sinusoids"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, is_training=False):
        """inputs [B, T, feat_dim, channels] -> [B, T', embedding_dim]."""
        assert inputs.ndim == 4
        x = inputs.astype(self.dtype)
        pad = self.kernel_size // 2
        for i in range(1, self.num_layers + 1):
            x = jnp.pad(x, [[0, 0], [pad, pad], [pad, pad], [0, 0]])
            x = nn.Conv(features=self.channels,
                        kernel_size=(self.kernel_size, self.kernel_size),
                        strides=(self.strides, self.strides),
                        padding="VALID", dtype=self.dtype,
                        kernel_init=nn.with_partitioning(
                            nn.initializers.lecun_normal(),
                            (None, None, "conv_io", "embed")),
                        name=f"conv{i}")(x)
            if self.layer_norm:
                x32 = x.astype(jnp.float32)
                x32 = nn.LayerNorm(epsilon=1e-6, name=f"ln{i}")(x32)
                x = x32.astype(self.dtype)
            x = jax.nn.relu(x)
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)
        x = nn.Dense(self.embedding_dim, dtype=self.dtype,
                     kernel_init=nn.with_partitioning(
                         nn.initializers.lecun_normal(),
                         ("conv_io", "embed")),
                     name="output_dense")(x)
        if self.timing == "sinusoids":
            x = x * (self.embedding_dim ** 0.5)
            x = x + sinusoidal_position_signal(
                t, self.embedding_dim, dtype=x.dtype)[None, :, :]
        elif self.timing:
            raise ValueError(
                f"AudioConv2dSubsampling supports timing='sinusoids' or "
                f"None, got '{self.timing}' (a position-blind encoder "
                f"would silently degrade)")
        return x
