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
"""The SpeechTransformer model.

Parity: /root/reference/neurst/models/speech_transformer.py — audio
Conv2d subsampling source modality (kernel 3, stride 2, 2 layers => 4x
time reduction, args at 55-61), the subsampled source-length recompute
for the cross-attention mask (179-190), and the
``speech_transformer_s/m`` hparams families (192-280).

Inputs:
    src        float [B, T, feat_dim, channels]
    src_length int    [B]        (frames before subsampling)
    trg_input  int    [B, U]
"""

from typing import Any, Optional

import jax.numpy as jnp

from neurst_tpu.layers.layer_utils import input_length_to_padding
from neurst_tpu.layers.modalities.audio_modalities import (
    AudioConv2dSubsampling, subsampled_length)
from neurst_tpu.models.encoder_decoder_model import (EncoderDecoderModel,
                                                     Seq2SeqModule)
from neurst_tpu.models.model import register_model
from neurst_tpu.models.transformer import _encdec_flags
from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.hparams_sets import register_hparams_set

__all__ = ["SpeechTransformer"]


class SpeechSeq2SeqModule(Seq2SeqModule):
    """Seq2SeqModule with an audio-subsampling source modality."""

    audio_feature_dim: int = 80
    audio_feature_channels: int = 1
    conv_kernel_size: int = 3
    conv_strides: int = 2
    conv_channels: int = 256
    conv_layer_norm: bool = False

    def setup(self):
        # target-side text modality + encoder/decoder from the parent;
        # source modality replaced by conv subsampling.
        from neurst_tpu.layers.common_layers import WordEmbedding
        self.trg_modality = WordEmbedding(
            vocab_size=self.trg_vocab_size, embedding_dim=self.trg_dim,
            share_softmax_weights=self.share_embedding_and_softmax_weights,
            timing=self.trg_timing, max_positions=self.max_positions,
            dtype=self.dtype, name="target_symbol_modality")
        self.src_modality = AudioConv2dSubsampling(
            embedding_dim=self.src_dim,
            channels=self.conv_channels,
            kernel_size=self.conv_kernel_size,
            strides=self.conv_strides,
            layer_norm=self.conv_layer_norm,
            timing=self.src_timing or "sinusoids",
            dtype=self.dtype, name="input_audio_modality")
        self.encoder = self.build_encoder()
        self.decoder = self.build_decoder()
        if not self.share_embedding_and_softmax_weights:
            from flax import linen as nn
            self.output_linear = nn.Dense(
                self.trg_vocab_size, use_bias=False, dtype=self.dtype,
                name="output_linear",
                kernel_init=nn.with_partitioning(
                    nn.initializers.lecun_normal(), ("embed", "vocab")))

    def encode(self, inputs, is_training=False):
        src = inputs["src"]
        if src.ndim == 3:  # [B, T, feat] -> single channel
            src = src[:, :, :, None]
        emb = self.src_modality(src, is_training=is_training)
        sub_len = subsampled_length(
            inputs["src_length"], num_layers=self.src_modality.num_layers,
            strides=self.conv_strides)
        src_padding = input_length_to_padding(sub_len, emb.shape[1])
        enc = self.encoder(emb, src_padding, is_training=is_training)
        return enc, src_padding


@register_model
class SpeechTransformer(EncoderDecoderModel):

    module_cls = SpeechSeq2SeqModule

    @staticmethod
    def class_or_method_args():
        return [
            Flag("modality.share_embedding_and_softmax_weights",
                 dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether to share the target embedding and softmax."),
            Flag("modality.dim", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The default embedding dimension."),
            Flag("modality.source.dim", dtype=Flag.TYPE.INTEGER,
                 default=None, help="The source-side embedding dimension."),
            Flag("modality.target.dim", dtype=Flag.TYPE.INTEGER,
                 default=None, help="The target-side embedding dimension."),
            Flag("modality.timing", dtype=Flag.TYPE.STRING, default=None,
                 help="The position embedding type."),
            Flag("modality.source.timing", dtype=Flag.TYPE.STRING,
                 default=None, help="The source position embedding type."),
            Flag("modality.target.timing", dtype=Flag.TYPE.STRING,
                 default=None, help="The target position embedding type."),
            Flag("modality.source.kernel_size", dtype=Flag.TYPE.INTEGER,
                 default=3, help="The conv kernel size."),
            Flag("modality.source.strides", dtype=Flag.TYPE.INTEGER,
                 default=2, help="The conv stride."),
            Flag("modality.source.channels", dtype=Flag.TYPE.INTEGER,
                 default=256, help="The conv channels."),
            Flag("modality.source.layer_norm", dtype=Flag.TYPE.BOOLEAN,
                 default=False, help="LayerNorm inside conv blocks."),
            Flag("modality.max_positions", dtype=Flag.TYPE.INTEGER,
                 default=1024, help="Max positions for learned pos emb."),
            Flag("dtype", dtype=Flag.TYPE.STRING, default="bfloat16",
                 help="The computation dtype."),
        ] + _encdec_flags("encoder") + _encdec_flags("decoder")

    def module_kwargs(self):
        kw = super().module_kwargs()
        kw.pop("share_source_target_embedding", None)
        args = self._args
        kw["src_vocab_size"] = 1  # unused for audio
        kw.update(
            audio_feature_dim=self._src_meta.get("audio_feature_dim", 80),
            audio_feature_channels=self._src_meta.get(
                "audio_feature_channels", 1),
            conv_kernel_size=args.get("modality.source.kernel_size") or 3,
            conv_strides=args.get("modality.source.strides") or 2,
            conv_channels=args.get("modality.source.channels") or 256,
            conv_layer_norm=bool(args.get("modality.source.layer_norm")),
        )
        return kw

    def module_cls_kwargs_filter(self, kw):
        return kw

    def example_inputs(self):
        feat = self._src_meta.get("audio_feature_dim", 80)
        ch = self._src_meta.get("audio_feature_channels", 1)
        return {"inputs": {
            "src": jnp.zeros([1, 8, feat, ch], jnp.float32),
            "src_length": jnp.asarray([8], jnp.int32),
            "trg_input": jnp.ones([1, 3], jnp.int32)}}

    @classmethod
    def build_model_args_by_name(cls, name):
        if name not in ("speech_transformer_toy", "speech_transformer_s",
                        "speech_transformer_m"):
            return None
        # parity: reference speech_transformer.py:192-280 (channels 256
        # for s and m; noam factors 3.5/5.0 with decay; warmup 25000)
        if name == "speech_transformer_toy":
            dmodel, num_heads, dropout = 16, 2, 0.1
            enc_layers, dec_layers, filter_size, channels = 2, 2, 32, 8
        elif name == "speech_transformer_s":
            dmodel, num_heads, dropout = 256, 4, 0.1
            enc_layers, dec_layers, filter_size, channels = 12, 6, 2048, 256
        else:  # speech_transformer_m
            dmodel, num_heads, dropout = 512, 8, 0.1
            enc_layers, dec_layers, filter_size, channels = 12, 6, 2048, 256
        return {
            "model.class": cls.__name__,
            "model.params": {
                "modality.share_embedding_and_softmax_weights": True,
                "modality.dim": dmodel,
                "modality.timing": "sinusoids",
                "modality.source.channels": channels,
                "modality.source.kernel_size": 3,
                "modality.source.strides": 2,
                "modality.source.layer_norm": True,
                "encoder.num_layers": enc_layers,
                "encoder.hidden_size": dmodel,
                "encoder.num_attention_heads": num_heads,
                "encoder.filter_size": filter_size,
                "encoder.attention_dropout_rate": dropout,
                "encoder.ffn_activation": "relu",
                "encoder.ffn_dropout_rate": dropout,
                "encoder.layer_postprocess_dropout_rate": dropout,
                "decoder.num_layers": dec_layers,
                "decoder.hidden_size": dmodel,
                "decoder.num_attention_heads": num_heads,
                "decoder.filter_size": filter_size,
                "decoder.attention_dropout_rate": dropout,
                "decoder.ffn_activation": "relu",
                "decoder.ffn_dropout_rate": dropout,
                "decoder.layer_postprocess_dropout_rate": dropout,
            },
            "optimizer.class": "adam",
            "optimizer.params": {
                "epsilon": 1.e-9, "beta_1": 0.9, "beta_2": 0.98},
            "lr_schedule.class": "noam",
            "lr_schedule.params": {
                "initial_factor": 5.0 if dmodel > 256 else 3.5,
                "end_factor": 2.0 if dmodel > 256 else 1.5,
                "dmodel": dmodel,
                "warmup_steps": 25000,
                "start_decay_at": 50000,
                "decay_steps": 50000,
            },
        }


for _name in ("speech_transformer_toy", "speech_transformer_s",
              "speech_transformer_m"):
    register_hparams_set(_name)(
        lambda _n=_name: SpeechTransformer.build_model_args_by_name(_n))
