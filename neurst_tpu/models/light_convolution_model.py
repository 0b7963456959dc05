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
"""LightConvolutionModel (Pay Less Attention, ICLR'19).

Parity: /root/reference/neurst/models/light_convolution_model.py —
lightweight/dynamic convolution encoder + decoder with cross-attention;
``lightconv_base``-style hparams family.
"""

import jax.numpy as jnp
import yaml

from neurst_tpu.layers.decoders.light_convolution_decoder import \
    LightConvolutionDecoder
from neurst_tpu.layers.encoders.light_convolution_encoder import \
    LightConvolutionEncoder
from neurst_tpu.models.encoder_decoder_model import (EncoderDecoderModel,
                                                     Seq2SeqModule)
from neurst_tpu.models.model import register_model
from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.hparams_sets import register_hparams_set

__all__ = ["LightConvolutionModel"]


def _side_flags(prefix):
    return [
        Flag(f"{prefix}.num_layers", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The number of {prefix} layers."),
        Flag(f"{prefix}.hidden_size", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The {prefix} hidden size."),
        Flag(f"{prefix}.num_heads", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The number of conv weight groups."),
        Flag(f"{prefix}.filter_size", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The {prefix} ffn filter size."),
        Flag(f"{prefix}.kernel_sizes", dtype=Flag.TYPE.STRING, default=None,
             help=f"Per-layer conv kernel sizes (YAML list)."),
        Flag(f"{prefix}.conv_type", dtype=Flag.TYPE.STRING,
             default="lightweight",
             help="The conv type: lightweight or dynamic."),
        Flag(f"{prefix}.use_glu", dtype=Flag.TYPE.BOOLEAN, default=True,
             help="Whether to use a GLU input projection."),
        Flag(f"{prefix}.ffn_activation", dtype=Flag.TYPE.STRING,
             default="relu", help="The ffn activation."),
        Flag(f"{prefix}.weight_dropout_rate", dtype=Flag.TYPE.FLOAT,
             default=0., help="The conv weight dropout rate."),
        Flag(f"{prefix}.attention_dropout_rate", dtype=Flag.TYPE.FLOAT,
             default=0., help="The cross-attention dropout rate."),
        Flag(f"{prefix}.ffn_dropout_rate", dtype=Flag.TYPE.FLOAT,
             default=0., help="The ffn dropout rate."),
        Flag(f"{prefix}.layer_postprocess_dropout_rate",
             dtype=Flag.TYPE.FLOAT, default=0.,
             help="The residual dropout rate."),
        Flag(f"{prefix}.post_normalize", dtype=Flag.TYPE.BOOLEAN,
             default=False, help="Post-norm instead of pre-norm."),
        Flag(f"{prefix}.layer_postprocess_epsilon", dtype=Flag.TYPE.FLOAT,
             default=1e-6, help="The layer-norm epsilon."),
    ]


class LightConvSeq2SeqModule(Seq2SeqModule):

    def build_encoder(self):
        cfg = dict(self.encoder_cfg or {})
        ks = cfg.pop("kernel_sizes", None)
        if isinstance(ks, str):
            ks = yaml.safe_load(ks)
        if ks:
            cfg["kernel_sizes"] = tuple(ks)
        cfg = self.filter_fields(LightConvolutionEncoder, cfg)
        return LightConvolutionEncoder(dtype=self.dtype, name="encoder",
                                       **cfg)

    def build_decoder(self):
        cfg = dict(self.decoder_cfg or {})
        ks = cfg.pop("kernel_sizes", None)
        if isinstance(ks, str):
            ks = yaml.safe_load(ks)
        if ks:
            cfg["kernel_sizes"] = tuple(ks)
        cfg = self.filter_fields(LightConvolutionDecoder, cfg)
        return LightConvolutionDecoder(dtype=self.dtype, name="decoder",
                                       **cfg)

    def init_cache(self, encoder_outputs, memory_padding,
                   decode_padded_length):
        cache = self.decoder.create_decoding_internal_cache(
            encoder_outputs, decode_padded_length)
        return {"layers": cache, "memory_padding": memory_padding}


@register_model("light_convolution_model", "lightconv")
class LightConvolutionModel(EncoderDecoderModel):

    module_cls = LightConvSeq2SeqModule

    @staticmethod
    def class_or_method_args():
        return (EncoderDecoderModel.class_or_method_args()
                + _side_flags("encoder") + _side_flags("decoder"))

    def sub_cfg(self, prefix):
        out = {}
        for k, v in self._args.items():
            if k.startswith(prefix) and v is not None:
                out[k[len(prefix):]] = v
        return out

    @classmethod
    def build_model_args_by_name(cls, name):
        if name not in ("lightconv_base", "lightconv_toy",
                        "dynamicconv_base"):
            return None
        toy = name == "lightconv_toy"
        dmodel = 8 if toy else 512
        heads = 2 if toy else 8
        filter_size = 16 if toy else 2048
        layers = 2 if toy else 7
        dec_layers = 2 if toy else 6
        conv_type = "dynamic" if name.startswith("dynamic") \
            else "lightweight"
        kernels = [3, 7] if toy else [3, 7, 15, 31, 31, 31, 31]
        return {
            "model.class": cls.__name__,
            "model.params": {
                "modality.share_source_target_embedding": False,
                "modality.share_embedding_and_softmax_weights": True,
                "modality.dim": dmodel,
                "modality.timing": "sinusoids",
                "encoder.num_layers": layers,
                "encoder.hidden_size": dmodel,
                "encoder.num_heads": heads,
                "encoder.filter_size": filter_size,
                "encoder.kernel_sizes": kernels,
                "encoder.conv_type": conv_type,
                "decoder.num_layers": dec_layers,
                "decoder.hidden_size": dmodel,
                "decoder.num_heads": heads,
                "decoder.filter_size": filter_size,
                "decoder.kernel_sizes": kernels[:dec_layers],
                "decoder.conv_type": conv_type,
            },
            "optimizer.class": "adam",
            "optimizer.params": {
                "epsilon": 1.e-9, "beta_1": 0.9, "beta_2": 0.98},
            "lr_schedule.class": "noam",
            "lr_schedule.params": {
                "initial_factor": 1.0, "dmodel": dmodel,
                "warmup_steps": 4000},
        }


register_hparams_set("lightconv_base")(
    lambda: LightConvolutionModel.build_model_args_by_name(
        "lightconv_base"))
register_hparams_set("lightconv_toy")(
    lambda: LightConvolutionModel.build_model_args_by_name("lightconv_toy"))
