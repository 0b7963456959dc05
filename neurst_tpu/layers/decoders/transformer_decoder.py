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
"""Transformer decoder stack with explicit decoding cache.

Parity: /root/reference/neurst/layers/decoders/transformer_decoder.py
(per-layer decoding cache contract required by beam search,
``create_decoding_internal_cache``/``memorize_memory``,
``decode_lagging`` source masking for wait-k).

The cache is a plain pytree:
    {"layer_0": {"self": {keys, values}, "memory": {keys, values}}, ...}
self keys/values: [B, max_decode_len, heads, head_dim] (static shape);
memory keys/values: [B, src_len, heads, head_dim] (precomputed once).
Beam reorder = one ``jnp.take`` per leaf on axis 0.

``scan_layers=True`` compiles the stack as ONE lax.scan-ned layer over
stacked parameters (compile time O(1) in depth — deep GPT-2 stacks,
deep speech decoders).  The cache then lives under a ``"stacked"`` key
with a LEADING LAYER AXIS on every leaf
    {"stacked": {"self": {keys [L, B, T, N, H], ...},
                 "memory": {keys [L, B, S, N, H], ...}}}
and the beam-search helpers detect the marker key and tile/reorder the
batch on axis 1 (layer_utils.stack_beam_size_selective /
gather_beams_selective).  Per-layer checkpoints bridge to/from the
stacked layout transparently (checkpoints._bridge_scan_layouts).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers import layer_utils
from neurst_tpu.layers.common_layers import LayerNorm
from neurst_tpu.layers.transformer_layers import TransformerDecoderLayer

__all__ = ["TransformerDecoder"]


class TransformerDecoder(nn.Module):
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
    with_cross_attention: bool = True
    enable_flash_attention: bool = False
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
            with_cross_attention=self.with_cross_attention,
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
        return (int(self.moe_num_experts) > 1
                and (i + 1) % max(1, int(self.moe_layer_frequency)) == 0)

    def _moe_scan(self) -> bool:
        """True when the stack compiles as a scan over MoE blocks."""
        return int(self.moe_num_experts) > 1 and self.scan_layers

    def _block_size(self) -> int:
        return max(1, int(self.moe_layer_frequency))

    def setup(self):
        if int(self.moe_num_experts) > 1 and self.pipeline_stages > 1:
            raise ValueError(
                "moe_num_experts>1 requires scan_layers or the "
                "per-layer stack (pipeline_stages=1)")
        if self._moe_scan():
            # scan over BLOCKS of `moe_layer_frequency` layers (dense
            # x(f-1), MoE last — the per-layer pattern exactly); the
            # sown "losses" collection rides the scan via
            # variable_axes.  Cache layout: {"stacked":
            # {"block_layer_<j>": {...}}} with a leading BLOCK axis on
            # every leaf (the beam helpers key off "stacked" as usual).
            f = self._block_size()
            if self.num_layers % f != 0:
                raise ValueError(
                    f"scan_layers with MoE requires num_layers "
                    f"({self.num_layers}) divisible by "
                    f"moe_layer_frequency ({f})")
            self.layers = nn.scan(
                _ScanDecoderBlockBody,
                variable_axes={"params": 0, "losses": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0,) + (nn.broadcast,) * 9,
                out_axes=0,
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
            # training/teacher-forcing pipelining (layers/pipeline.py).
            # Stepwise decode uses the scan/per-layer layout instead:
            # predict entries force pipeline_stages=1 and the
            # checkpoint bridge reshapes the stacked params.
            if self.enable_flash_attention:
                raise ValueError(
                    "pipeline_stages>1 composes with the dense attention "
                    "path only")
            from neurst_tpu.layers.pipeline import PipelinedDecoderLayers
            self.layers = PipelinedDecoderLayers(
                layer_kwargs=tuple(sorted(self._layer_kwargs().items())),
                num_layers=self.num_layers,
                num_stages=self.pipeline_stages,
                num_microbatches=(self.pipeline_microbatches
                                  or self.pipeline_stages),
                dtype=self.dtype, name="layers")
        elif self.scan_layers:
            # one traced layer; the per-layer cache slice is the scanned
            # input/output (so the SAME scan serves teacher forcing,
            # stepwise decode, and the memory k/v precompute)
            self.layers = nn.scan(
                _ScanDecoderBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0,) + (nn.broadcast,) * 9,
                out_axes=0,
                length=self.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )(layer_kwargs=tuple(sorted(self._layer_kwargs().items())),
              name="layers")
        else:
            self.layers = [
                TransformerDecoderLayer(
                    **self._layer_kwargs(moe=self._moe_layer(i)),
                    name=f"layer_{i}")
                for i in range(self.num_layers)]
        if not self.post_normalize:
            self.output_ln = LayerNorm(
                epsilon=self.layer_postprocess_epsilon, dtype=self.dtype,
                name="output_ln")

    def create_decoding_internal_cache(self, encoder_outputs,
                                       decode_padded_length: int,
                                       batch_size: Optional[int] = None):
        """Builds the static-shape cache for stepwise decoding: zeroed
        self-attention buffers + precomputed cross-attention k/v."""
        if batch_size is None:
            batch_size = encoder_outputs.shape[0] \
                if encoder_outputs is not None else 1
        if self.pipeline_stages > 1:
            raise NotImplementedError(
                "Stepwise decode with pipeline_stages>1: restore the "
                "checkpoint into a scan_layers/per-layer model instead "
                "(the restore bridge reshapes the stacked params)")
        head_dim = self.hidden_size // self.num_attention_heads
        if self._moe_scan():
            f = self._block_size()
            zeros = jnp.zeros(
                (self.num_layers // f, batch_size, decode_padded_length,
                 self.num_attention_heads, head_dim), dtype=self.dtype)
            stacked = {f"block_layer_{j}": {
                "self": {"keys": zeros, "values": zeros}}
                for j in range(f)}
            if self.with_cross_attention:
                dummy = jnp.zeros(
                    (batch_size, 1, self.hidden_size), self.dtype)
                _, mem = self.layers(dummy, None, None, encoder_outputs,
                                     None, None, False, False, None,
                                     None, "memorize")
                for j in range(f):
                    stacked[f"block_layer_{j}"].update(
                        mem[f"block_layer_{j}"])
            return {"stacked": stacked}
        if self.scan_layers:
            zeros = jnp.zeros(
                (self.num_layers, batch_size, decode_padded_length,
                 self.num_attention_heads, head_dim), dtype=self.dtype)
            stacked = {"self": {"keys": zeros, "values": zeros}}
            if self.with_cross_attention:
                dummy = jnp.zeros(
                    (batch_size, 1, self.hidden_size), self.dtype)
                _, mem = self.layers(dummy, None, None, encoder_outputs,
                                     None, None, False, False, None,
                                     None, "memorize")
                stacked.update(mem)
            return {"stacked": stacked}
        cache = {}
        for i, layer in enumerate(self.layers):
            zeros = jnp.zeros(
                (batch_size, decode_padded_length,
                 self.num_attention_heads, head_dim), dtype=self.dtype)
            layer_cache = {"self": {"keys": zeros, "values": zeros}}
            if self.with_cross_attention:
                layer_cache.update(layer.memorize_memory(encoder_outputs))
            cache[f"layer_{i}"] = layer_cache
        return cache

    def __call__(self, inputs, memory=None, memory_padding=None,
                 cache: Optional[dict] = None, decode_step=None,
                 decode_lagging=None, is_training=False, beam_anc=None):
        """Decoder forward.

        Training / teacher forcing: ``inputs`` [B, T, D], causal bias.
        Stepwise decode: ``inputs`` [B, 1, D] with ``decode_step`` t and
        a cache from ``create_decoding_internal_cache``.

        ``decode_lagging``: wait-k lagging; masks cross-attention so
        position i attends source positions < i + lagging.

        ``beam_anc`` (stepwise beam decode): [B, beam, max_len]
        ancestor-index matrix — self-attention reads the kv-cache
        through it instead of beam search physically reordering the
        cache every step (the dominant decode-step HBM traffic; see
        MultiHeadSelfAttention._attend_indirect).

        Returns (outputs, new_cache).
        """
        # Flash path (teacher forcing only): causal self-attention
        # needs no key-length mask (right-padded targets are never
        # behind a valid query position), and cross-attention masking
        # is exactly per-row valid source lengths.  Wait-k lagging
        # masks are arbitrary, so they stay on the dense path.
        use_flash = (self.enable_flash_attention and decode_step is None
                     and cache is None and decode_lagging is None)
        self_bias = None
        if decode_step is None:
            length = inputs.shape[1]
            if not use_flash:
                self_bias = layer_utils.causal_self_attention_bias(length)
        else:
            length = inputs.shape[1]
            if self._moe_scan():
                max_len = \
                    cache["stacked"]["block_layer_0"]["self"]["keys"].shape[2]
            elif self.scan_layers:
                max_len = cache["stacked"]["self"]["keys"].shape[2]
            else:
                max_len = cache["layer_0"]["self"]["keys"].shape[1]
            positions = jnp.arange(max_len)
            if getattr(decode_step, "ndim", 0) == 1:
                # per-row times ([B], speculative decode): query slot j
                # of row b sits at decode_step[b] + j and may attend
                # cache positions <= that -> bias [B, 1, k, max_len]
                qpos = decode_step[:, None] + jnp.arange(length)
                self_bias = jnp.where(
                    positions[None, None, None, :]
                    <= qpos[:, None, :, None],
                    0.0, layer_utils.NEG_INF)
            else:
                self_bias = jnp.where(
                    positions <= decode_step, 0.0,
                    layer_utils.NEG_INF)[None, None, None, :]

        memory_bias = None
        cross_flash_lengths = None
        if self.with_cross_attention and memory_padding is not None \
                and use_flash:
            cross_flash_lengths = jnp.sum(
                1.0 - memory_padding, axis=1).astype(jnp.int32)
        elif self.with_cross_attention and memory_padding is not None:
            memory_bias = layer_utils.input_padding_to_bias(memory_padding)
            if decode_lagging is not None:
                src_len = memory_padding.shape[1]
                if decode_step is None:
                    memory_bias = memory_bias + \
                        layer_utils.waitk_cross_attention_bias(
                            length, src_len, decode_lagging)
                else:
                    if getattr(decode_step, "ndim", 0) == 1:
                        raise NotImplementedError(
                            "decode_lagging (wait-k) with per-row decode "
                            "times (speculative decode) is unsupported")
                    allowed = jnp.arange(src_len) < (decode_step
                                                     + decode_lagging)
                    memory_bias = memory_bias + jnp.where(
                        allowed, 0.0, layer_utils.NEG_INF
                    )[None, None, None, :]

        x = inputs
        if self.pipeline_stages > 1:
            if cache is not None or decode_step is not None:
                raise NotImplementedError(
                    "pipeline_stages>1 supports the teacher-forcing "
                    "path only; decode with a scan_layers/per-layer "
                    "model (checkpoint bridge reshapes the params)")
            x = self.layers(x, self_bias, memory, memory_bias,
                            is_training)
            new_cache = None
        elif self.scan_layers:
            stacked_in = None if cache is None else cache["stacked"]
            x, ys = self.layers(x, stacked_in, self_bias, memory,
                                memory_bias, decode_step, is_training,
                                use_flash, cross_flash_lengths, beam_anc,
                                "forward")
            new_cache = None if cache is None else {"stacked": ys}
        else:
            new_cache = {} if cache is not None else None
            for i, layer in enumerate(self.layers):
                layer_cache = None if cache is None \
                    else cache.get(f"layer_{i}")
                x, upd = layer(
                    x, self_attention_bias=self_bias, memory=memory,
                    memory_bias=memory_bias, cache=layer_cache,
                    decode_step=decode_step, is_training=is_training,
                    self_flash_causal=use_flash,
                    cross_flash_lengths=cross_flash_lengths,
                    beam_anc=beam_anc)
                if new_cache is not None:
                    new_cache[f"layer_{i}"] = upd
        if not self.post_normalize:
            x = self.output_ln(x)
        return x, new_cache


class _ScanDecoderBody(nn.Module):
    """nn.scan target: carries the hidden state through one decoder
    layer; the layer's cache slice is the scanned input/output, all
    other inputs are broadcast.  ``mode="memorize"`` runs only the
    cross-attention k/v precompute (the scanned output becomes the
    stacked memory cache)."""
    layer_kwargs: tuple  # sorted (key, value) pairs (hashable for flax)

    @nn.compact
    def __call__(self, carry, layer_cache, self_bias, memory, memory_bias,
                 decode_step, is_training, self_flash_causal,
                 cross_flash_lengths, beam_anc, mode):
        layer = TransformerDecoderLayer(
            **dict(self.layer_kwargs), name="layer")
        if mode == "memorize":
            return carry, layer.memorize_memory(memory)
        x, upd = layer(
            carry, self_attention_bias=self_bias, memory=memory,
            memory_bias=memory_bias, cache=layer_cache,
            decode_step=decode_step, is_training=is_training,
            self_flash_causal=self_flash_causal,
            cross_flash_lengths=cross_flash_lengths,
            beam_anc=beam_anc)
        return x, upd


class _ScanDecoderBlockBody(nn.Module):
    """nn.scan target for MoE stacks: one block of ``block_size``
    decoder layers (dense FFNs then an MoE FFN last — global layer i is
    MoE iff (i+1) % block_size == 0).  The block's cache slice is a
    dict keyed ``block_layer_<j>`` and is the scanned input/output."""
    layer_kwargs: tuple  # sorted (key, value) pairs (hashable for flax)
    moe_kwargs: tuple
    block_size: int

    @nn.compact
    def __call__(self, carry, block_cache, self_bias, memory, memory_bias,
                 decode_step, is_training, self_flash_causal,
                 cross_flash_lengths, beam_anc, mode):
        layers = [
            TransformerDecoderLayer(
                **dict(self.moe_kwargs if j == self.block_size - 1
                       else self.layer_kwargs),
                name=f"block_layer_{j}")
            for j in range(self.block_size)]
        if mode == "memorize":
            return carry, {f"block_layer_{j}": layer.memorize_memory(memory)
                           for j, layer in enumerate(layers)}
        x = carry
        upds = {}
        for j, layer in enumerate(layers):
            layer_cache = None if block_cache is None \
                else block_cache[f"block_layer_{j}"]
            x, upd = layer(
                x, self_attention_bias=self_bias, memory=memory,
                memory_bias=memory_bias, cache=layer_cache,
                decode_step=decode_step, is_training=is_training,
                self_flash_causal=self_flash_causal,
                cross_flash_lengths=cross_flash_lengths,
                beam_anc=beam_anc)
            upds[f"block_layer_{j}"] = upd
        return x, (None if block_cache is None else upds)
