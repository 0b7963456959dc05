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
"""Transformer encoder stack.

Parity: /root/reference/neurst/layers/encoders/transformer_encoder.py
(stacked layers, final LN under pre-norm, optional monotonic/causal
self-attention for simultaneous translation; ``incremental_encode``
re-encodes a growing prefix for wait-k).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers import layer_utils
from neurst_tpu.layers.common_layers import LayerNorm
from neurst_tpu.layers.transformer_layers import TransformerEncoderLayer

__all__ = ["TransformerEncoder"]


class TransformerEncoder(nn.Module):
    num_layers: int
    hidden_size: int
    num_attention_heads: int
    filter_size: int
    ffn_activation: str = "relu"
    attention_dropout_rate: float = 0.0
    ffn_dropout_rate: float = 0.0
    layer_postprocess_dropout_rate: float = 0.0
    post_normalize: bool = False
    layer_postprocess_epsilon: float = 1e-6
    attention_monotonic: bool = False
    enable_flash_attention: bool = False
    enable_ring_attention: bool = False
    ring_attention_axis: str = "data"
    scan_layers: bool = False
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0
    # mixture-of-experts FFN (layers/moe.py): every
    # `moe_layer_frequency`-th layer swaps its dense FFN for E experts
    moe_num_experts: int = 0
    moe_layer_frequency: int = 2
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_aux_loss_coef: float = 0.01
    moe_router_jitter: float = 0.01
    dtype: Any = jnp.float32

    def _layer_kwargs(self, moe: bool = False):
        kwargs = dict(
            hidden_size=self.hidden_size,
            num_attention_heads=self.num_attention_heads,
            filter_size=self.filter_size,
            ffn_activation=self.ffn_activation,
            attention_dropout_rate=self.attention_dropout_rate,
            ffn_dropout_rate=self.ffn_dropout_rate,
            layer_postprocess_dropout_rate=self.layer_postprocess_dropout_rate,
            post_normalize=self.post_normalize,
            layer_postprocess_epsilon=self.layer_postprocess_epsilon,
            dtype=self.dtype)
        if moe:
            kwargs.update(
                moe_num_experts=self.moe_num_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                moe_aux_loss_coef=self.moe_aux_loss_coef,
                moe_router_jitter=self.moe_router_jitter)
        return kwargs

    def _moe_layer(self, i: int) -> bool:
        """Layer i carries an MoE FFN (Switch-style: every
        `moe_layer_frequency`-th layer, counting from the frequency-1
        index so a frequency of 2 gives layers 1, 3, 5, ...)."""
        return (int(self.moe_num_experts) > 1
                and (i + 1) % max(1, int(self.moe_layer_frequency)) == 0)

    def setup(self):
        moe = int(self.moe_num_experts) > 1
        if moe and self.pipeline_stages > 1:
            # pipelined stacks require homogeneous layers; the GPipe
            # schedule has no home for the per-layer aux-loss collection
            raise ValueError(
                "moe_num_experts>1 requires scan_layers or the "
                "per-layer stack (pipeline_stages=1)")
        if moe and self.scan_layers:
            # scan over BLOCKS of `moe_layer_frequency` layers (dense
            # x(f-1) then MoE — exactly the per-layer pattern, since
            # layer i is MoE iff (i+1) % f == 0): blocks are
            # homogeneous, so one traced block lax.scans over a stacked
            # parameter axis.  The sown "losses" collection rides the
            # scan via variable_axes (one leading block axis per leaf;
            # call_train sums leaves).  Param layout:
            # <enc>/layers/block_layer_<j>/... with leading axis
            # num_layers//f; checkpoints._bridge_scan_layouts converts
            # to/from the per-layer and plain-scan layouts.
            f = max(1, int(self.moe_layer_frequency))
            if self.num_layers % f != 0:
                raise ValueError(
                    f"scan_layers with MoE requires num_layers "
                    f"({self.num_layers}) divisible by "
                    f"moe_layer_frequency ({f})")
            self.layers = nn.scan(
                _ScanEncoderBlockBody,
                variable_axes={"params": 0, "losses": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers // f,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )(layer_kwargs=tuple(sorted(self._layer_kwargs().items())),
              moe_kwargs=tuple(sorted(self._layer_kwargs(moe=True).items())),
              block_size=f, name="layers")
            if not self.post_normalize:
                self.output_ln = LayerNorm(
                    epsilon=self.layer_postprocess_epsilon,
                    dtype=self.dtype, name="output_ln")
            return
        if self.pipeline_stages > 1:
            # layer pipelining over the mesh "stage" axis (GPipe
            # schedule, layers/pipeline.py); dense-bias attention only
            if self.enable_flash_attention or self.enable_ring_attention:
                raise ValueError(
                    "pipeline_stages>1 composes with the dense attention "
                    "path only (flash/ring attention operate within a "
                    "single stage's devices)")
            from neurst_tpu.layers.pipeline import PipelinedEncoderLayers
            self.layers = PipelinedEncoderLayers(
                layer_kwargs=tuple(sorted(self._layer_kwargs().items())),
                num_layers=self.num_layers,
                num_stages=self.pipeline_stages,
                num_microbatches=(self.pipeline_microbatches
                                  or self.pipeline_stages),
                dtype=self.dtype, name="layers")
        elif self.scan_layers:
            # one traced layer, lax.scan over a stacked-parameter axis:
            # compile time is O(1) in depth instead of O(num_layers)
            # (deep speech encoders recompile per bucket shape).  Param
            # layout: <enc>/layers/layer/... with leading axis
            # num_layers; checkpoints.restore_into converts to/from the
            # per-layer layout transparently.
            self.layers = nn.scan(
                _ScanEncoderBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )(layer_kwargs=tuple(sorted(self._layer_kwargs().items())),
              name="layers")
        else:
            self.layers = [
                TransformerEncoderLayer(
                    **self._layer_kwargs(moe=self._moe_layer(i)),
                    name=f"layer_{i}")
                for i in range(self.num_layers)]
        if not self.post_normalize:
            self.output_ln = LayerNorm(
                epsilon=self.layer_postprocess_epsilon, dtype=self.dtype,
                name="output_ln")

    def __call__(self, inputs, inputs_padding, is_training=False):
        """inputs [B, T, D]; inputs_padding [B, T] float (1=pad)."""
        flash_lengths = None
        ring_axis = None
        ring_lengths = None
        bias = None
        if self.enable_ring_attention:
            # sequence parallelism: the time axis is sharded over
            # `ring_attention_axis` of the ambient mesh; attention runs
            # as a kv ring over ICI (beyond-reference capability,
            # SURVEY.md §5).  Padding is contiguous-on-the-right, so
            # per-row valid lengths encode it globally.
            ring_axis = self.ring_attention_axis
            ring_lengths = jnp.sum(
                1.0 - inputs_padding, axis=1).astype(jnp.int32)
        elif self.enable_flash_attention:
            # padding is contiguous-on-the-right in this framework, so
            # a per-row valid length fully encodes it for the kernel
            flash_lengths = jnp.sum(
                1.0 - inputs_padding, axis=1).astype(jnp.int32)
        else:
            bias = layer_utils.input_padding_to_bias(inputs_padding)
            if self.attention_monotonic:
                bias = bias + layer_utils.causal_self_attention_bias(
                    inputs.shape[1])
        x = inputs
        if self.pipeline_stages > 1:
            x = self.layers(x, bias, is_training)
        elif self.scan_layers:
            x, _ = self.layers(x, bias, is_training, flash_lengths,
                               self.attention_monotonic, ring_axis,
                               ring_lengths)
        else:
            for layer in self.layers:
                x = layer(x, bias, is_training=is_training,
                          flash_lengths=flash_lengths,
                          flash_causal=self.attention_monotonic,
                          ring_axis=ring_axis, ring_lengths=ring_lengths)
        if not self.post_normalize:
            x = self.output_ln(x)
        return x


class _ScanEncoderBody(nn.Module):
    """nn.scan target: carries the hidden state through one encoder
    layer; all other inputs are broadcast."""
    layer_kwargs: tuple  # sorted (key, value) pairs (hashable for flax)

    @nn.compact
    def __call__(self, carry, bias, is_training, flash_lengths,
                 flash_causal, ring_axis, ring_lengths):
        y = TransformerEncoderLayer(
            **dict(self.layer_kwargs), name="layer")(
            carry, bias, is_training=is_training,
            flash_lengths=flash_lengths, flash_causal=flash_causal,
            ring_axis=ring_axis, ring_lengths=ring_lengths)
        return y, None


class _ScanEncoderBlockBody(nn.Module):
    """nn.scan target for MoE stacks: one block of ``block_size``
    layers — dense FFNs then an MoE FFN last (global layer i is MoE iff
    (i+1) % block_size == 0, so the block preserves the per-layer
    pattern exactly)."""
    layer_kwargs: tuple  # sorted (key, value) pairs (hashable for flax)
    moe_kwargs: tuple
    block_size: int

    @nn.compact
    def __call__(self, carry, bias, is_training, flash_lengths,
                 flash_causal, ring_axis, ring_lengths):
        x = carry
        for j in range(self.block_size):
            kwargs = (self.moe_kwargs if j == self.block_size - 1
                      else self.layer_kwargs)
            x = TransformerEncoderLayer(
                **dict(kwargs), name=f"block_layer_{j}")(
                x, bias, is_training=is_training,
                flash_lengths=flash_lengths, flash_causal=flash_causal,
                ring_axis=ring_axis, ring_lengths=ring_lengths)
        return x, None
