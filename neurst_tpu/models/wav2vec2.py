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
"""wav2vec 2.0 trunk (feature use / pretrained restore).

Parity: /root/reference/neurst/models/wav2vec2.py and the conv blocks in
``neurst/layers/modalities/audio_modalities.py:112-351`` — a 1-D conv
feature encoder over raw waveforms (kernels 10/3/3/3/3/2/2, strides
5/2/2/2/2/2/2, group-norm on the first block), feature projection, a
weight-shared positional convolution, and a transformer context
network.  Exposes contextual representations for downstream ST/ASR.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import LayerNorm
from neurst_tpu.layers.encoders.transformer_encoder import TransformerEncoder
from neurst_tpu.models.model import BaseModel, dtype_by_name, register_model
from neurst_tpu.utils.flags_core import Flag

__all__ = ["Wav2Vec2"]

_CONV_SPEC: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 2, 2), (512, 2, 2))


def wav2vec2_output_length(n_samples: int) -> int:
    length = n_samples
    for _, k, s in _CONV_SPEC:
        length = (length - k) // s + 1
    return length


class Wav2Vec2Module(nn.Module):
    hidden_size: int = 768
    num_layers: int = 12
    num_attention_heads: int = 12
    filter_size: int = 3072
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_convs = [
            nn.Conv(features=ch, kernel_size=(k,), strides=(s,),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name=f"feature_conv_{i}")
            for i, (ch, k, s) in enumerate(_CONV_SPEC)]
        self.feature_gn = nn.GroupNorm(num_groups=512, epsilon=1e-5,
                                       dtype=jnp.float32, name="feature_gn")
        self.feature_proj_ln = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name="feature_proj_ln")
        self.feature_proj = nn.Dense(self.hidden_size, dtype=self.dtype,
                                     name="feature_proj")
        # fairseq/HF pad k//2 on both sides then drop the trailing
        # sample for even kernels (pos conv is weight-normed there; the
        # converter folds g*v/||v|| into a plain kernel)
        self.pos_conv = nn.Conv(
            features=self.hidden_size, kernel_size=(self.conv_pos_kernel,),
            feature_group_count=self.conv_pos_groups, padding="VALID",
            dtype=self.dtype, name="pos_conv")
        self.post_extract_ln = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name="post_extract_ln")
        self.encoder = TransformerEncoder(
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            num_attention_heads=self.num_attention_heads,
            filter_size=self.filter_size, ffn_activation="gelu",
            attention_dropout_rate=self.dropout_rate,
            ffn_dropout_rate=self.dropout_rate,
            layer_postprocess_dropout_rate=self.dropout_rate,
            post_normalize=True, layer_postprocess_epsilon=1e-5,
            dtype=self.dtype, name="encoder")

    def extract_features(self, waveform, is_training=False):
        """waveform [B, n_samples] -> conv features [B, T', 512]."""
        x = waveform[:, :, None].astype(self.dtype)
        for i, conv in enumerate(self.feature_convs):
            x = conv(x)
            if i == 0:
                x = self.feature_gn(x.astype(jnp.float32)).astype(self.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x

    def __call__(self, inputs, is_training=False):
        """inputs: src [B, n_samples] raw waveform (+ src_length).

        Returns {"encoder_outputs", "features", "padding"}."""
        waveform = inputs["src"]
        feats = self.extract_features(waveform, is_training=is_training)
        x = self.feature_proj(self.feature_proj_ln(feats))
        # relative positional conv + residual (HF/fairseq padding rules)
        pad = self.conv_pos_kernel // 2
        xp = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)])
        pos = self.pos_conv(xp)
        if self.conv_pos_kernel % 2 == 0:
            pos = pos[:, :-1]
        x = x + jax.nn.gelu(pos, approximate=False)
        x = self.post_extract_ln(x)
        t = x.shape[1]
        if inputs.get("src_length") is not None:
            out_len = inputs["src_length"]
            for _, k, s in _CONV_SPEC:
                out_len = (out_len - k) // s + 1
            padding = (jnp.arange(t)[None, :]
                       >= out_len[:, None]).astype(jnp.float32)
        else:
            padding = jnp.zeros((x.shape[0], t), jnp.float32)
        enc = self.encoder(x, padding, is_training=is_training)
        return {"encoder_outputs": enc, "features": feats,
                "padding": padding}


@register_model("wav2vec2")
class Wav2Vec2(BaseModel):

    def __init__(self, args, meta=None, name=None):
        super().__init__(args, name=name)
        a = self._args
        self._meta = dict(meta or {})
        self._module = Wav2Vec2Module(
            hidden_size=a.get("hidden_size") or 768,
            num_layers=a.get("num_layers") or 12,
            num_attention_heads=a.get("num_attention_heads") or 12,
            filter_size=a.get("filter_size") or 3072,
            dropout_rate=a.get("dropout_rate") or 0.0,
            dtype=dtype_by_name(a.get("dtype")))

    @staticmethod
    def class_or_method_args():
        return [
            Flag("num_layers", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of transformer layers."),
            Flag("hidden_size", dtype=Flag.TYPE.INTEGER, default=768,
                 help="The model dimension."),
            Flag("num_attention_heads", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of attention heads."),
            Flag("filter_size", dtype=Flag.TYPE.INTEGER, default=3072,
                 help="The ffn filter size."),
            Flag("dropout_rate", dtype=Flag.TYPE.FLOAT, default=0.,
                 help="The dropout rate."),
            Flag("dtype", dtype=Flag.TYPE.STRING, default="bfloat16",
                 help="The computation dtype."),
        ]

    @classmethod
    def new(cls, args, src_meta=None, trg_meta=None, name=None):
        return cls(args, src_meta or trg_meta, name=name)

    def example_inputs(self):
        return {"inputs": {"src": jnp.zeros([1, 1600], jnp.float32)}}

    def call(self, params, inputs, is_training=False, rngs=None):
        return self._module.apply({"params": params}, inputs=inputs,
                                  is_training=is_training, rngs=rngs or {})
