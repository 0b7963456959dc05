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
"""Generic encoder-decoder sequence model.

Parity: /root/reference/neurst/models/encoder_decoder_model.py —
modality construction with shared src/trg embedding and tied softmax
(118-178), output logits layer (180-185), decoding-cache creation and
``symbols_to_logits_fn`` closure (211-261), teacher-forcing training
call (263-279).

Inputs convention (identical to the reference):
    src         int32 [B, S]
    src_padding float  [B, S]   (1.0 at PAD; derived from src_length if absent)
    trg_input   int32 [B, T]   (BOS-prefixed during training)
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import WordEmbedding
from neurst_tpu.layers.decoders.transformer_decoder import TransformerDecoder
from neurst_tpu.layers.encoders.transformer_encoder import TransformerEncoder
from neurst_tpu.layers.layer_utils import input_length_to_padding
from neurst_tpu.models.model import BaseModel, dtype_by_name, register_model
from neurst_tpu.utils.flags_core import Flag

__all__ = ["EncoderDecoderModel", "Seq2SeqModule"]


class Seq2SeqModule(nn.Module):
    """The pure flax module: modalities + encoder + decoder + logits."""

    src_vocab_size: int
    trg_vocab_size: int
    src_dim: int
    trg_dim: int
    src_timing: Optional[str] = "sinusoids"
    trg_timing: Optional[str] = "sinusoids"
    share_source_target_embedding: bool = False
    share_embedding_and_softmax_weights: bool = True
    max_positions: int = 1024
    encoder_cfg: Optional[dict] = None
    decoder_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.share_source_target_embedding:
            assert self.src_vocab_size == self.trg_vocab_size
            shared = WordEmbedding(
                vocab_size=self.trg_vocab_size, embedding_dim=self.trg_dim,
                share_softmax_weights=self.share_embedding_and_softmax_weights,
                timing=self.trg_timing, max_positions=self.max_positions,
                dtype=self.dtype, name="shared_symbol_modality")
            self.src_modality = shared
            self.trg_modality = shared
        else:
            self.src_modality = WordEmbedding(
                vocab_size=self.src_vocab_size, embedding_dim=self.src_dim,
                timing=self.src_timing, max_positions=self.max_positions,
                dtype=self.dtype, name="input_symbol_modality")
            self.trg_modality = WordEmbedding(
                vocab_size=self.trg_vocab_size, embedding_dim=self.trg_dim,
                share_softmax_weights=self.share_embedding_and_softmax_weights,
                timing=self.trg_timing, max_positions=self.max_positions,
                dtype=self.dtype, name="target_symbol_modality")
        self.encoder = self.build_encoder()
        self.decoder = self.build_decoder()
        if not self.share_embedding_and_softmax_weights:
            from neurst_tpu.layers.quantization.quant_layers import \
                dense_general
            self.output_linear = dense_general(
                self.trg_vocab_size, use_bias=False, dtype=self.dtype,
                name="output_linear",
                kernel_init=nn.with_partitioning(
                    nn.initializers.lecun_normal(), ("embed", "vocab")))

    @staticmethod
    def filter_fields(cls, cfg: Optional[dict]) -> dict:
        """Keeps only keys that are fields of the module class (drops
        leftovers when configs from another model class are mixed in)."""
        import dataclasses
        import logging
        names = {f.name for f in dataclasses.fields(cls)}
        out, dropped = {}, []
        for k, v in (cfg or {}).items():
            (out.__setitem__(k, v) if k in names else dropped.append(k))
        if dropped:
            logging.warning("%s ignoring config keys: %s", cls.__name__,
                            dropped)
        return out

    @staticmethod
    def _warn_flash_dropout(cfg, which):
        import logging

        import jax as _jax
        if cfg.get("enable_flash_attention") \
                and float(cfg.get("attention_dropout_rate") or 0.0) > 0 \
                and _jax.default_backend() != "tpu":
            logging.warning(
                "%s: flash attention applies attention-probability "
                "dropout in-kernel on the TPU hardware PRNG; TRAINING "
                "this config (rate=%s) on the %s backend raises a "
                "config error (inference is unaffected).  Set "
                "attention_dropout_rate: 0 or enable_flash_attention: "
                "false for off-TPU training.", which,
                cfg.get("attention_dropout_rate"),
                _jax.default_backend())

    # Overridable in subclasses (speech, waitk, lightconv ...)
    def build_encoder(self):
        cfg = self.filter_fields(TransformerEncoder, self.encoder_cfg)
        self._warn_flash_dropout(cfg, "encoder")
        return TransformerEncoder(dtype=self.dtype, name="encoder", **cfg)

    def build_decoder(self):
        cfg = self.filter_fields(TransformerDecoder, self.decoder_cfg)
        self._warn_flash_dropout(cfg, "decoder")
        return TransformerDecoder(dtype=self.dtype, name="decoder", **cfg)

    def embed_source(self, src, is_training=False):
        """Source tokens -> embeddings [B, S, D] (overridden for audio)."""
        return self.src_modality(src)

    def src_padding_of(self, inputs):
        if inputs.get("src_padding", None) is not None:
            return inputs["src_padding"].astype(jnp.float32)
        return input_length_to_padding(
            inputs["src_length"], inputs["src"].shape[1])

    def output_logits(self, decoder_out):
        if self.share_embedding_and_softmax_weights:
            return self.trg_modality.attend(decoder_out)
        return self.output_linear(decoder_out).astype(jnp.float32)

    def encode(self, inputs, is_training=False):
        """Returns (encoder_outputs, memory_padding)."""
        emb = self.embed_source(inputs["src"], is_training=is_training)
        src_padding = self.src_padding_of(inputs)
        enc = self.encoder(emb, src_padding, is_training=is_training)
        return enc, src_padding

    def __call__(self, inputs, is_training=False, return_prelogits=False):
        """Teacher-forcing forward -> logits [B, T, trg_vocab].

        With ``return_prelogits`` (fused softmax+CE training path,
        ops/fused_ce.fused_linear_xent): returns a dict holding the
        PRE-projection decoder output plus the softmax weights in
        [V, D] layout instead — the [B, T, V] logits tensor is then
        never materialized (it is the HBM bottleneck of the train
        step).  Only valid with shared embedding/softmax weights
        (supports_fused_softmax_ce gates on it)."""
        enc, src_padding = self.encode(inputs, is_training=is_training)
        trg_emb = self.trg_modality(inputs["trg_input"])
        dec_out, _ = self.decoder(
            trg_emb, memory=enc, memory_padding=src_padding,
            is_training=is_training)
        if return_prelogits:
            mod = self.trg_modality
            out = {"prelogits": dec_out,
                   "softmax_w": jnp.asarray(mod.weights)}
            if mod.use_bias:
                out["softmax_bias"] = jnp.asarray(mod.softmax_bias)
            return out
        return self.output_logits(dec_out)

    def beam_cache_indirection_ok(self) -> bool:
        """Whether the stepwise decode honors a ``beam_anc``
        ancestor-index matrix in the cache (beam search then skips the
        physical per-step cache reorder — its dominant HBM traffic).
        Requires the stock TransformerDecoder stack: its
        MultiHeadSelfAttention reads the indirection; other decoders
        (e.g. the LightConv ring buffers) do not, and silently ignoring
        the key would decode the wrong history.  Gated on
        ``build_decoder`` NOT being overridden (subclasses that swap
        the decoder class, like LightConv, are excluded; subclasses
        whose custom decoder does honor ``beam_anc`` override this to
        return True)."""
        return type(self).build_decoder is Seq2SeqModule.build_decoder

    def init_cache(self, encoder_outputs, memory_padding,
                   decode_padded_length: int):
        """Static-shape decoding cache; includes memory padding so the
        step function is self-contained (beam-reorderable pytree)."""
        cache = self.decoder.create_decoding_internal_cache(
            encoder_outputs, decode_padded_length)
        return {"layers": cache, "memory_padding": memory_padding}

    def decode_step(self, ids, cache, step, decode_lagging=None):
        """One decode step: ids [B] at position `step` -> logits [B, V].

        A ``beam_anc`` entry in the cache (beam search with cache
        indirection) rides at the top level and is passed through to
        the decoder's self-attention; ``dict(cache)`` preserves it in
        the returned cache.

        Returns (logits, new_cache)."""
        emb = self.trg_modality(ids, time=step)  # [B, D]
        anc = cache.get("beam_anc")
        # only the TransformerDecoder signature takes beam_anc (the
        # LightConv decoder does not; beam search never adds the key
        # for it — beam_cache_indirection_ok gates on the decoder type)
        anc_kw = {} if anc is None else {"beam_anc": anc}
        dec_out, new_layers = self.decoder(
            emb[:, None, :], memory=None,
            memory_padding=cache["memory_padding"],
            cache=cache["layers"], decode_step=step,
            decode_lagging=decode_lagging, is_training=False, **anc_kw)
        logits = self.output_logits(dec_out[:, 0, :])
        new_cache = dict(cache)
        new_cache["layers"] = new_layers
        return logits, new_cache

    def decode_steps(self, ids, cache, times):
        """Multi-token stepwise decode (speculative verification): row
        b's tokens ids[b] [k] occupy cache positions times[b] ..
        times[b]+k-1 -> logits [B, k, V].  Beyond-reference: enables
        draft-model speculative decoding (layers/search/speculative.py).

        Returns (logits, new_cache)."""
        if not isinstance(self.decoder, TransformerDecoder):
            raise NotImplementedError(
                "speculative decode_steps needs the transformer "
                f"decoder's multi-token per-row-time path; "
                f"{type(self.decoder).__name__} (e.g. the LightConv "
                "ring buffer) does not support it")
        emb = self.trg_modality(ids, time=times)  # [B, k, D]
        dec_out, new_layers = self.decoder(
            emb, memory=None,
            memory_padding=cache["memory_padding"],
            cache=cache["layers"], decode_step=times, is_training=False)
        logits = self.output_logits(dec_out)
        new_cache = dict(cache)
        new_cache["layers"] = new_layers
        return logits, new_cache


@register_model("seq2seq", "encoder_decoder_model")
class EncoderDecoderModel(BaseModel):
    """Spec wrapper exposing pure functions over the Seq2SeqModule."""

    module_cls = Seq2SeqModule

    def __init__(self, args, src_meta, trg_meta, name=None):
        super().__init__(args, name=name)
        self._src_meta = dict(src_meta or {})
        self._trg_meta = dict(trg_meta or {})
        self._module = self.build_module()

    @property
    def src_meta(self):
        return self._src_meta

    @property
    def trg_meta(self):
        return self._trg_meta

    @property
    def generation_meta(self):
        """eos/bos/unk meta for the generation target side (multi-
        decoder models override to select the decoded side)."""
        return self._trg_meta

    @staticmethod
    def class_or_method_args():
        return [
            Flag("modality.share_source_target_embedding",
                 dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether to share source and target embedding table."),
            Flag("modality.share_embedding_and_softmax_weights",
                 dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether to share the embedding table and softmax weights."),
            Flag("modality.dim", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The default embedding dimension."),
            Flag("modality.source.dim", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The source-side embedding dimension."),
            Flag("modality.target.dim", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The target-side embedding dimension."),
            Flag("modality.timing", dtype=Flag.TYPE.STRING, default=None,
                 help="The position embedding type (sinusoids/emb)."),
            Flag("modality.source.timing", dtype=Flag.TYPE.STRING, default=None,
                 help="The source-side position embedding type."),
            Flag("modality.target.timing", dtype=Flag.TYPE.STRING, default=None,
                 help="The target-side position embedding type."),
            Flag("modality.max_positions", dtype=Flag.TYPE.INTEGER,
                 default=1024,
                 help="The maximum positions for learned position embedding."),
            Flag("dtype", dtype=Flag.TYPE.STRING, default="bfloat16",
                 help="The computation dtype (params stay float32)."),
        ]

    # ------------------------------------------------------------ #

    def module_kwargs(self) -> Dict[str, Any]:
        args = self._args
        src_dim = args.get("modality.source.dim") or args["modality.dim"]
        trg_dim = args.get("modality.target.dim") or args["modality.dim"]
        timing = args.get("modality.timing")
        return dict(
            src_vocab_size=self._src_meta.get("vocab_size", 1),
            trg_vocab_size=self._trg_meta["vocab_size"],
            src_dim=src_dim, trg_dim=trg_dim,
            src_timing=args.get("modality.source.timing") or timing,
            trg_timing=args.get("modality.target.timing") or timing,
            share_source_target_embedding=bool(
                args.get("modality.share_source_target_embedding")),
            share_embedding_and_softmax_weights=bool(
                args.get("modality.share_embedding_and_softmax_weights")),
            max_positions=args.get("modality.max_positions") or 1024,
            encoder_cfg=self.sub_cfg("encoder."),
            decoder_cfg=self.sub_cfg("decoder."),
            dtype=dtype_by_name(args.get("dtype")),
        )

    def sub_cfg(self, prefix: str) -> dict:
        drop = ("attention_type", "attention_monotonic") \
            if prefix == "decoder." else ("attention_type",)
        out = {}
        for k, v in self._args.items():
            if k.startswith(prefix):
                sub = k[len(prefix):]
                if sub in drop:
                    if sub == "attention_type" and v not in (
                            None, "dot_product"):
                        raise NotImplementedError(
                            f"attention_type={v} is not supported")
                    continue
                if v is not None:
                    out[sub] = v
        return out

    def build_module(self) -> nn.Module:
        return self.module_cls(**self.module_kwargs())

    @classmethod
    def new(cls, args, src_meta=None, trg_meta=None, name=None):
        return cls(args, src_meta, trg_meta, name=name)

    # ------------------------------------------------------------ #

    def example_inputs(self):
        return {"inputs": {
            "src": jnp.ones([1, 4], jnp.int32),
            "src_padding": jnp.zeros([1, 4], jnp.float32),
            "trg_input": jnp.ones([1, 3], jnp.int32)}}

    def call(self, params, inputs, is_training=False, rngs=None):
        return self._module.apply(
            {"params": params}, inputs=inputs, is_training=is_training,
            rngs=rngs or {})

    def call_train(self, params, inputs, rngs=None, want_prelogits=False):
        """Training forward -> (model_out, aux_loss): collects losses
        sown by conditional-computation layers (MoE load balancing).

        ``want_prelogits`` (set by the train step when the fused
        softmax+CE path applies — see supports_fused_softmax_ce)
        returns the prelogits dict instead of logits; the criterion
        consumes either."""
        kwargs = {"return_prelogits": True} if want_prelogits else {}
        out, variables = self._module.apply(
            {"params": params}, inputs=inputs, is_training=True,
            rngs=rngs or {}, mutable=["losses"], **kwargs)
        aux = jnp.zeros([], jnp.float32)
        for leaf in jax.tree_util.tree_leaves(variables.get("losses", {})):
            aux = aux + jnp.sum(leaf).astype(jnp.float32)
        return out, aux

    def supports_fused_softmax_ce(self) -> bool:
        """Whether the train step may request prelogits and fuse the
        vocab projection into the CE kernel: needs the stock
        Seq2SeqModule forward (subclasses overriding __call__ don't
        plumb return_prelogits), tied embedding/softmax weights (the
        only [V, D]-layout softmax this module has), no QAT/int8 (the
        fused path would skip their fake-quant/dequant semantics), and
        lane-aligned dims with a VMEM-resident-W-sized vocab
        (ops/fused_ce.fused_linear_ce_available)."""
        from neurst_tpu.layers.quantization.quant_layers import (
            int8_serving_enabled, quant_enabled)
        m = self._module
        if type(m).__call__ is not Seq2SeqModule.__call__:
            return False
        if not m.share_embedding_and_softmax_weights:
            return False
        if quant_enabled() or int8_serving_enabled():
            return False
        v = self._trg_meta["vocab_size"]
        d = m.trg_dim
        # the backward holds a [V, D] f32 dW accumulator in VMEM
        return v % 128 == 0 and d % 128 == 0 and v * d * 4 <= 80 * 2**20

    # ----------------------- generation ------------------------- #

    def prepare_generation(self, params, inputs,
                           decode_padded_length: int):
        """Encodes the source and builds the decode closure.

        Returns (symbols_to_logits_fn, generation_initializer):
            symbols_to_logits_fn(ids [N], cache, t) -> (logits [N, V],
                new_cache)
        generation_initializer keys (parity encoder_decoder_model.py
        249-259): decoder_input, decoder_internal_cache,
        encoder_inputs_maxlen, eos_id, unk_id.
        """
        enc, src_padding = self._module.apply(
            {"params": params}, inputs=inputs, is_training=False,
            method=self._module.encode)
        cache = self._module.apply(
            {"params": params}, enc, src_padding, decode_padded_length,
            method=self._module.init_cache)

        def symbols_to_logits_fn(ids, cache, time):
            return self._module.apply(
                {"params": params}, ids, cache, time,
                method=self._module.decode_step)

        batch = inputs["src"].shape[0]
        bos = jnp.full([batch], self.bos_id, jnp.int32)
        src_len = jnp.sum(1.0 - src_padding, axis=1).astype(jnp.int32)
        generation_initializer = {
            "decoder_input": bos,
            "decoder_internal_cache": cache,
            "encoder_inputs_maxlen": jnp.max(src_len),
            "eos_id": self.generation_meta["eos_id"],
            "unk_id": self.generation_meta.get("unk_id"),
            "beam_cache_indirection_ok": bool(
                self._module.beam_cache_indirection_ok()),
        }
        return symbols_to_logits_fn, generation_initializer

    def prepare_speculative(self, params, inputs,
                            decode_padded_length: int):
        """Like ``prepare_generation`` but exposes the MULTI-token
        per-row-time step function for speculative decoding:
        steps_fn(ids [B, k], cache, times [B]) -> (logits [B, k, V],
        new_cache).  Beyond-reference."""
        enc, src_padding = self._module.apply(
            {"params": params}, inputs=inputs, is_training=False,
            method=self._module.encode)
        cache = self._module.apply(
            {"params": params}, enc, src_padding, decode_padded_length,
            method=self._module.init_cache)

        def steps_fn(ids, cache, times):
            return self._module.apply(
                {"params": params}, ids, cache, times,
                method=self._module.decode_steps)

        batch = inputs["src"].shape[0]
        bos = jnp.full([batch], self.bos_id, jnp.int32)
        src_len = jnp.sum(1.0 - src_padding, axis=1).astype(jnp.int32)
        generation_initializer = {
            "decoder_input": bos,
            "decoder_internal_cache": cache,
            "encoder_inputs_maxlen": jnp.max(src_len),
            "eos_id": self.generation_meta["eos_id"],
            "unk_id": self.generation_meta.get("unk_id"),
        }
        return steps_fn, generation_initializer

    @property
    def bos_id(self):
        # parity: sequence generation starts from bos (or eos-as-bos)
        meta = self.generation_meta
        return meta.get("bos_id", meta["eos_id"])
