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
"""GPT-2: decoder-only language model.

Parity: /root/reference/neurst/models/gpt2.py — learned position
embeddings, pre-norm blocks with gelu FFN, tied softmax, own
``get_symbols_to_logits_fn`` with prompt prefill for generation
(gpt2.py:159-201).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import WordEmbedding
from neurst_tpu.layers.decoders.transformer_decoder import TransformerDecoder
from neurst_tpu.models.model import BaseModel, dtype_by_name, register_model
from neurst_tpu.utils.flags_core import Flag
from neurst_tpu.utils.hparams_sets import register_hparams_set

__all__ = ["GPT2"]


class GPT2Module(nn.Module):
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_attention_heads: int = 12
    filter_size: int = 3072
    max_positions: int = 1024
    dropout_rate: float = 0.1
    timing: str = "emb"
    ffn_activation: str = "gelu_approx"  # GPT-2 uses gelu_new (tanh approx)
    epsilon: float = 1e-5
    scan_layers: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.trg_modality = WordEmbedding(
            vocab_size=self.vocab_size, embedding_dim=self.hidden_size,
            share_softmax_weights=True, use_bias=False,
            timing=self.timing, max_positions=self.max_positions,
            dtype=self.dtype, name="target_symbol_modality")
        self.decoder = TransformerDecoder(
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            num_attention_heads=self.num_attention_heads,
            filter_size=self.filter_size,
            ffn_activation=self.ffn_activation,
            attention_dropout_rate=self.dropout_rate,
            ffn_dropout_rate=self.dropout_rate,
            layer_postprocess_dropout_rate=self.dropout_rate,
            post_normalize=False,
            layer_postprocess_epsilon=self.epsilon,
            with_cross_attention=False,
            scan_layers=self.scan_layers,
            dtype=self.dtype, name="decoder")

    def __call__(self, inputs, is_training=False):
        """inputs["trg_input"] [B, T] -> logits [B, T, vocab]."""
        emb = self.trg_modality(inputs["trg_input"])
        out, _ = self.decoder(emb, is_training=is_training)
        return self.trg_modality.attend(out)

    def init_cache(self, batch_size: int, decode_padded_length: int):
        cache = self.decoder.create_decoding_internal_cache(
            None, decode_padded_length, batch_size=batch_size)
        return {"layers": cache}

    def decode_step(self, ids, cache, step):
        emb = self.trg_modality(ids, time=step)
        out, new_layers = self.decoder(
            emb[:, None, :], cache=cache["layers"], decode_step=step,
            is_training=False, beam_anc=cache.get("beam_anc"))
        logits = self.trg_modality.attend(out[:, 0, :])
        new_cache = dict(cache)  # beam_anc (if any) rides through
        new_cache["layers"] = new_layers
        return logits, new_cache

    def decode_steps(self, ids, cache, times):
        """Multi-token per-row-time decode (speculative verification):
        ids [B, k] at positions times[b]..times[b]+k-1 -> [B, k, V]."""
        emb = self.trg_modality(ids, time=times)
        out, new_layers = self.decoder(
            emb, cache=cache["layers"], decode_step=times,
            is_training=False)
        return self.trg_modality.attend(out), {"layers": new_layers}


@register_model("gpt2")
class GPT2(BaseModel):

    def __init__(self, args, trg_meta, name=None):
        super().__init__(args, name=name)
        self._trg_meta = dict(trg_meta or {})
        a = self._args
        self._module = GPT2Module(
            vocab_size=self._trg_meta["vocab_size"],
            hidden_size=a.get("hidden_size") or 768,
            num_layers=a.get("num_layers") or 12,
            num_attention_heads=a.get("num_attention_heads") or 12,
            filter_size=a.get("filter_size") or 3072,
            max_positions=a.get("max_positions") or 1024,
            dropout_rate=a.get("dropout_rate") or 0.1,
            timing=a.get("timing") or "emb",
            epsilon=a.get("epsilon") or 1e-5,
            scan_layers=bool(a.get("scan_layers")),
            dtype=dtype_by_name(a.get("dtype")))

    @property
    def trg_meta(self):
        return self._trg_meta

    @staticmethod
    def class_or_method_args():
        return [
            Flag("num_layers", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of decoder blocks."),
            Flag("hidden_size", dtype=Flag.TYPE.INTEGER, default=768,
                 help="The model dimension."),
            Flag("num_attention_heads", dtype=Flag.TYPE.INTEGER, default=12,
                 help="The number of attention heads."),
            Flag("filter_size", dtype=Flag.TYPE.INTEGER, default=3072,
                 help="The FFN filter size."),
            Flag("max_positions", dtype=Flag.TYPE.INTEGER, default=1024,
                 help="The maximum sequence positions."),
            Flag("dropout_rate", dtype=Flag.TYPE.FLOAT, default=0.1,
                 help="The dropout rate."),
            Flag("timing", dtype=Flag.TYPE.STRING, default="emb",
                 help="The position embedding type."),
            Flag("epsilon", dtype=Flag.TYPE.FLOAT, default=1e-5,
                 help="The layer-norm epsilon."),
            Flag("scan_layers", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Compile the block stack as one lax.scan-ned "
                      "layer over stacked parameters (O(1)-in-depth "
                      "compiles for deep stacks)."),
            Flag("dtype", dtype=Flag.TYPE.STRING, default="bfloat16",
                 help="The computation dtype."),
        ]

    @classmethod
    def new(cls, args, src_meta=None, trg_meta=None, name=None):
        meta = trg_meta or src_meta
        return cls(args, meta, name=name)

    @classmethod
    def build_model_args_by_name(cls, name):
        sizes = {"gpt2_117m": (12, 768, 12), "gpt2_small": (12, 768, 12),
                 "gpt2_medium": (24, 1024, 16), "gpt2_large": (36, 1280, 20),
                 "gpt2_toy": (2, 16, 2)}
        if name not in sizes:
            return None
        layers, dim, heads = sizes[name]
        return {
            "model.class": cls.__name__,
            "model.params": {
                "num_layers": layers, "hidden_size": dim,
                "num_attention_heads": heads, "filter_size": dim * 4,
                "max_positions": 1024, "dropout_rate": 0.1,
            },
        }

    def example_inputs(self):
        return {"inputs": {"trg_input": jnp.ones([1, 4], jnp.int32)}}

    def call(self, params, inputs, is_training=False, rngs=None):
        return self._module.apply({"params": params}, inputs=inputs,
                                  is_training=is_training, rngs=rngs or {})

    def _prefill(self, params, inputs, decode_padded_length):
        """Prefills the cache with the prompt (all but the last token).
        Returns (cache, prefill, generation_initializer)."""
        prompt = jnp.asarray(inputs["trg_input"])
        if prompt.ndim == 1:
            prompt = prompt[:, None]
        batch, prompt_len = prompt.shape
        prefill = prompt_len - 1
        # cache must hold the prompt AND the generated continuation
        cache = self._module.apply(
            {"params": params}, batch, decode_padded_length + prefill,
            method=self._module.init_cache)

        def step_fn(t, carry):
            cache = carry
            _, cache = self._module.apply(
                {"params": params}, prompt[:, t], cache, t,
                method=self._module.decode_step)
            return cache
        if prefill > 0:
            cache = jax.lax.fori_loop(0, prefill, step_fn, cache)

        generation_initializer = {
            "decoder_input": prompt[:, -1],
            "decoder_internal_cache": cache,
            # cache position = time + prefill: chunked prefix decode
            # (layer_utils.chunked_decode_while) sizes chunks off this
            "decode_time_offset": prefill,
            "encoder_inputs_maxlen": None,
            "eos_id": self._trg_meta["eos_id"],
            "unk_id": self._trg_meta.get("unk_id"),
            # the stack is always a TransformerDecoder: beam search may
            # read the kv-cache through an ancestor matrix (prompt
            # positions stay identity — beams share the prefill)
            "beam_cache_indirection_ok": True,
        }
        return cache, prefill, generation_initializer

    def prepare_generation(self, params, inputs, decode_padded_length):
        """Prompt-prefilled, time-shifted stepwise closure."""
        _, prefill, init = self._prefill(params, inputs,
                                         decode_padded_length)

        def symbols_to_logits_fn(ids, cache, time):
            return self._module.apply(
                {"params": params}, ids, cache, time + prefill,
                method=self._module.decode_step)

        return symbols_to_logits_fn, init

    def prepare_speculative(self, params, inputs, decode_padded_length):
        """Multi-token per-row-time step closure for speculative
        decoding of the LM (prompt prefill shifts cache positions)."""
        _, prefill, init = self._prefill(params, inputs,
                                         decode_padded_length)

        def steps_fn(ids, cache, times):
            return self._module.apply(
                {"params": params}, ids, cache, times + prefill,
                method=self._module.decode_steps)

        return steps_fn, init


register_hparams_set("gpt2_117m")(
    lambda: GPT2.build_model_args_by_name("gpt2_117m"))
register_hparams_set("gpt2_toy")(
    lambda: GPT2.build_model_args_by_name("gpt2_toy"))
