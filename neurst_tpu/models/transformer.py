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
"""The Transformer model (parity: /root/reference/neurst/models/transformer.py).

Flag-flattened encoder/decoder params (transformer.py:46-98), hparams
families including parametric ``transformer_<d>_<e>e_<d>d[_<h>h][_dp<p>]``
names (136-240), pre-norm default with post-norm option.
"""

import re

from neurst_tpu.models.encoder_decoder_model import EncoderDecoderModel
from neurst_tpu.models.model import register_model
from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.hparams_sets import register_hparams_set

__all__ = ["Transformer"]


def _encdec_flags(prefix):
    """Per-side transformer hyperparameter flags."""
    f = [
        Flag(f"{prefix}.num_layers", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The number of stacking layers of the {prefix}."),
        Flag(f"{prefix}.hidden_size", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The number of hidden units of the {prefix}."),
        Flag(f"{prefix}.num_attention_heads", dtype=Flag.TYPE.INTEGER,
             default=None, help=f"The number of {prefix} attention heads."),
        Flag(f"{prefix}.filter_size", dtype=Flag.TYPE.INTEGER, default=None,
             help=f"The filter size of {prefix} ffn."),
        Flag(f"{prefix}.ffn_activation", dtype=Flag.TYPE.STRING,
             default="relu", help=f"The {prefix} ffn activation function."),
        Flag(f"{prefix}.attention_dropout_rate", dtype=Flag.TYPE.FLOAT,
             default=0., help=f"The {prefix} attention dropout rate."),
        Flag(f"{prefix}.attention_type", dtype=Flag.TYPE.STRING,
             default="dot_product", help=f"The {prefix} attention type."),
        Flag(f"{prefix}.ffn_dropout_rate", dtype=Flag.TYPE.FLOAT, default=0.,
             help=f"The {prefix} ffn dropout rate."),
        Flag(f"{prefix}.layer_postprocess_dropout_rate", dtype=Flag.TYPE.FLOAT,
             default=0., help=f"The {prefix} layer postprocess dropout rate."),
        Flag(f"{prefix}.post_normalize", dtype=Flag.TYPE.BOOLEAN,
             default=False,
             help=f"Whether to apply layer norm after each {prefix} block."),
        Flag(f"{prefix}.layer_postprocess_epsilon", dtype=Flag.TYPE.FLOAT,
             default=1e-6, help=f"The {prefix} layer norm epsilon."),
    ]
    if prefix == "encoder":
        f.append(Flag("encoder.attention_monotonic",
                      dtype=Flag.TYPE.BOOLEAN, default=None,
                      help="Whether to apply a causal mask to encoder "
                           "self-attention (for simultaneous MT)."))
        f.append(Flag("encoder.enable_flash_attention",
                      dtype=Flag.TYPE.BOOLEAN, default=None,
                      help="Use the Pallas flash-attention kernel for "
                           "encoder self-attention (memory-light for "
                           "long audio)."))
        f.append(Flag("encoder.enable_ring_attention",
                      dtype=Flag.TYPE.BOOLEAN, default=None,
                      help="Sequence-parallel encoder self-attention: "
                           "the time axis is sharded over a mesh axis "
                           "and kv shards rotate over ICI (for audio "
                           "longer than one chip's HBM). Requires "
                           "running under `with mesh:`."))
        f.append(Flag("encoder.ring_attention_axis",
                      dtype=Flag.TYPE.STRING, default="data",
                      help="The mesh axis the sequence is sharded over "
                           "when encoder.enable_ring_attention is on."))
        f.append(Flag("encoder.scan_layers",
                      dtype=Flag.TYPE.BOOLEAN, default=None,
                      help="Compile the encoder stack as one "
                           "lax.scan-ned layer over stacked parameters: "
                           "compile time is O(1) in depth (deep speech "
                           "encoders recompile per bucket shape). "
                           "Numerics are identical; per-layer "
                           "checkpoints load transparently."))
    f.append(Flag(f"{prefix}.pipeline_stages",
                  dtype=Flag.TYPE.INTEGER, default=None,
                  help=f"Pipeline the {prefix} stack over this many "
                       "mesh 'stage' groups (GPipe schedule; training "
                       "path).  Requires num_layers divisible by it and "
                       "a mesh with a matching 'stage' axis "
                       "(--pipeline_parallel)."))
    f.append(Flag(f"{prefix}.pipeline_microbatches",
                  dtype=Flag.TYPE.INTEGER, default=None,
                  help=f"Microbatches per {prefix} pipeline step "
                       "(default = pipeline_stages; more microbatches "
                       "= smaller bubble, smaller per-tick matmuls)."))
    f.append(Flag(f"{prefix}.moe_num_experts",
                  dtype=Flag.TYPE.INTEGER, default=None,
                  help=f"Mixture-of-experts {prefix} FFN: the number of "
                       "experts (0/1 = dense FFN).  Expert weights shard "
                       "over the mesh 'data' devices (expert "
                       "parallelism); the Switch load-balancing loss is "
                       "added to the training objective."))
    f.append(Flag(f"{prefix}.moe_layer_frequency",
                  dtype=Flag.TYPE.INTEGER, default=None,
                  help=f"Every this-many-th {prefix} layer uses the MoE "
                       "FFN (Switch-style default 2: layers 1,3,5,...)."))
    f.append(Flag(f"{prefix}.moe_top_k",
                  dtype=Flag.TYPE.INTEGER, default=None,
                  help="Experts per token: 1 = Switch router, 2 = "
                       "GShard top-2 (renormalized gates)."))
    f.append(Flag(f"{prefix}.moe_capacity_factor",
                  dtype=Flag.TYPE.FLOAT, default=None,
                  help="Per-expert token capacity = ceil(T * top_k * "
                       "this / num_experts); overflow tokens fall "
                       "through the residual (default 1.25)."))
    f.append(Flag(f"{prefix}.moe_aux_loss_coef",
                  dtype=Flag.TYPE.FLOAT, default=None,
                  help="Coefficient of the Switch load-balancing "
                       "auxiliary loss (default 0.01)."))
    f.append(Flag(f"{prefix}.moe_router_jitter",
                  dtype=Flag.TYPE.FLOAT, default=None,
                  help="Multiplicative router-logit jitter during "
                       "training (Switch default 0.01; 0 disables)."))
    if prefix == "decoder":
        f.append(Flag("decoder.scan_layers",
                      dtype=Flag.TYPE.BOOLEAN, default=None,
                      help="Compile the decoder stack as one "
                           "lax.scan-ned layer over stacked parameters "
                           "(covers teacher forcing AND the stepwise "
                           "decode-cache path): compile time is O(1) "
                           "in depth.  Numerics are identical; "
                           "per-layer checkpoints load transparently."))
        f.append(Flag("decoder.enable_flash_attention",
                      dtype=Flag.TYPE.BOOLEAN, default=None,
                      help="Use the Pallas flash-attention kernel for "
                           "decoder self- and cross-attention during "
                           "teacher forcing (training/eval); stepwise "
                           "decode keeps the kv-cache path.  Skips "
                           "attention-probability dropout."))
    return f


@register_model
class Transformer(EncoderDecoderModel):
    """The standard Transformer."""

    @staticmethod
    def class_or_method_args():
        return (EncoderDecoderModel.class_or_method_args()
                + _encdec_flags("encoder") + _encdec_flags("decoder"))

    @classmethod
    def build_model_args_by_name(cls, name):
        if name == "transformer_toy":
            dmodel, num_heads, dropout_rate = 8, 2, 0.1
            num_encoder_layers = num_decoder_layers = 2
            num_encoder_filter_size = num_decoder_filter_size = 10
        elif name == "transformer_base":
            dmodel, num_heads, dropout_rate = 512, 8, 0.1
            num_encoder_layers = num_decoder_layers = 6
            num_encoder_filter_size = num_decoder_filter_size = 2048
        elif name == "transformer_s":
            dmodel, num_heads, dropout_rate = 256, 4, 0.1
            num_encoder_layers = num_decoder_layers = 6
            num_encoder_filter_size = num_decoder_filter_size = 2048
        elif name == "transformer_big":
            dmodel, num_heads, dropout_rate = 1024, 16, 0.3
            num_encoder_layers = num_decoder_layers = 6
            num_encoder_filter_size = num_decoder_filter_size = 4096
        elif name == "transformer_big_dp01":
            dmodel, num_heads, dropout_rate = 1024, 16, 0.1
            num_encoder_layers = num_decoder_layers = 6
            num_encoder_filter_size = num_decoder_filter_size = 4096
        elif re.match(r"^transformer_\d+_\d+e_\d+d(_\d+h)?(_dp0\.\d+)?$", name):
            eles = name.split("_")
            dmodel = int(eles[1])
            num_encoder_layers = int(eles[2][:-1])
            num_decoder_layers = int(eles[3][:-1])
            num_heads = 8
            idx = 4
            if len(eles) > idx and eles[idx].endswith("h"):
                num_heads = int(eles[idx][:-1])
                idx += 1
            assert dmodel % num_heads == 0, (
                f"dimension({dmodel}) must be divisible by head({num_heads})")
            dropout_rate = 0.1
            if len(eles) > idx and eles[idx].startswith("dp"):
                dropout_rate = float(eles[idx][2:])
            num_encoder_filter_size = dmodel * 4
            num_decoder_filter_size = dmodel * 4
        else:
            return None
        return {
            "model.class": cls.__name__,
            "model.params": {
                "modality.share_source_target_embedding": False,
                "modality.share_embedding_and_softmax_weights": True,
                "modality.dim": dmodel,
                "modality.timing": "sinusoids",
                "encoder.num_layers": num_encoder_layers,
                "encoder.hidden_size": dmodel,
                "encoder.num_attention_heads": num_heads,
                "encoder.filter_size": num_encoder_filter_size,
                "encoder.attention_dropout_rate": dropout_rate,
                "encoder.attention_type": "dot_product",
                "encoder.ffn_activation": "relu",
                "encoder.ffn_dropout_rate": dropout_rate,
                "encoder.post_normalize": False,
                "encoder.layer_postprocess_dropout_rate": dropout_rate,
                "decoder.num_layers": num_decoder_layers,
                "decoder.hidden_size": dmodel,
                "decoder.num_attention_heads": num_heads,
                "decoder.filter_size": num_decoder_filter_size,
                "decoder.attention_dropout_rate": dropout_rate,
                "decoder.attention_type": "dot_product",
                "decoder.ffn_activation": "relu",
                "decoder.ffn_dropout_rate": dropout_rate,
                "decoder.post_normalize": False,
                "decoder.layer_postprocess_dropout_rate": dropout_rate,
            },
            "optimizer.class": "adam",
            "optimizer.params": {
                "epsilon": 1.e-9, "beta_1": 0.9, "beta_2": 0.98},
            "lr_schedule.class": "noam",
            "lr_schedule.params": {
                "initial_factor": 1.0, "dmodel": dmodel,
                "warmup_steps": 4000},
        }


for _name in ("transformer_toy", "transformer_base", "transformer_s",
              "transformer_big", "transformer_big_dp01"):
    register_hparams_set(_name)(
        lambda _n=_name: Transformer.build_model_args_by_name(_n))
