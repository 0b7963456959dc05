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
"""Joint ASR+ST speech transformer: one speech encoder, two decoders.

BEYOND-REFERENCE: the reference declares a ``MultiTaskSpeechTranslation``
task but never ships the model behind it
(/root/reference/neurst/tasks/speech2text.py:492-495 leaves
``build_model`` NotImplemented).  This is the full joint model: the
conv-subsampled speech encoder is SHARED, a transcript (ASR) decoder and
a translation (ST) decoder each cross-attend into it, and training
optimizes the weighted sum of both label-smoothed CEs via
``joint_criterion`` with ``output_key: st|asr`` / ``input_prefix: asr``
— the classical multi-task regularization that the reference's
augmented-librispeech recipe approximates with a separate ASR
pretraining stage (examples/speech_transformer/augmented_librispeech/
README.md "ASR pretrain").

Training inputs (built by tasks.MultiTaskSpeechTranslation):
    src            float [B, T, feat, channels]
    src_length     int   [B]
    trg_input/trg/trg_length/trg_padding          translation (ST side)
    asr_trg_input/asr_trg/asr_trg_length/asr_trg_padding  transcript

Training output: ``{"st": logits, "asr": logits}``.

Generation decodes the ST side by default; ``generation_output: asr``
switches the stepwise decode (cache, steps, logits) to the ASR decoder
— both reuse the single shared encoder pass.
"""

from typing import Optional

import jax.numpy as jnp

from neurst_tpu.layers.common_layers import WordEmbedding
from neurst_tpu.layers.decoders.transformer_decoder import TransformerDecoder
from neurst_tpu.models.model import register_model
from neurst_tpu.models.speech_transformer import (SpeechSeq2SeqModule,
                                                  SpeechTransformer)
from neurst_tpu.utils.flags_core import Flag

__all__ = ["MultiTaskSpeechTransformer"]


class MultiTaskSpeechModule(SpeechSeq2SeqModule):
    """Shared speech encoder + ST decoder (primary) + ASR decoder."""

    asr_vocab_size: int = 0
    asr_decoder_cfg: Optional[dict] = None
    generate_side: str = "st"  # which decoder the stepwise decode uses

    def setup(self):
        super().setup()
        self.asr_modality = WordEmbedding(
            vocab_size=self.asr_vocab_size, embedding_dim=self.trg_dim,
            share_softmax_weights=True, timing=self.trg_timing,
            max_positions=self.max_positions, dtype=self.dtype,
            name="asr_symbol_modality")
        cfg = self.filter_fields(
            TransformerDecoder, self.asr_decoder_cfg or self.decoder_cfg)
        self._warn_flash_dropout(cfg, "asr_decoder")
        self.asr_decoder = TransformerDecoder(
            dtype=self.dtype, name="asr_decoder", **cfg)

    # -------------------- training forward ----------------------- #

    def __call__(self, inputs, is_training=False, return_prelogits=False):
        assert not return_prelogits, (
            "the fused softmax+CE path is single-softmax; "
            "supports_fused_softmax_ce gates it off for multi-task")
        enc, src_padding = self.encode(inputs, is_training=is_training)
        trg_emb = self.trg_modality(inputs["trg_input"])
        dec_out, _ = self.decoder(
            trg_emb, memory=enc, memory_padding=src_padding,
            is_training=is_training)
        st_logits = self.output_logits(dec_out)
        if "asr_trg_input" not in inputs:
            return st_logits  # plain ST teacher forcing (eval/scoring)
        asr_emb = self.asr_modality(inputs["asr_trg_input"])
        asr_out, _ = self.asr_decoder(
            asr_emb, memory=enc, memory_padding=src_padding,
            is_training=is_training)
        asr_logits = self.asr_modality.attend(asr_out)
        return {"st": st_logits, "asr": asr_logits}

    # -------------------- stepwise generation -------------------- #

    def _gen_decoder(self):
        return self.asr_decoder if self.generate_side == "asr" \
            else self.decoder

    def _gen_logits(self, dec_out):
        if self.generate_side == "asr":
            return self.asr_modality.attend(dec_out)
        return self.output_logits(dec_out)

    def init_cache(self, encoder_outputs, memory_padding,
                   decode_padded_length: int):
        cache = self._gen_decoder().create_decoding_internal_cache(
            encoder_outputs, decode_padded_length)
        return {"layers": cache, "memory_padding": memory_padding}

    def decode_step(self, ids, cache, step, decode_lagging=None):
        mod = self.asr_modality if self.generate_side == "asr" \
            else self.trg_modality
        emb = mod(ids, time=step)
        dec_out, new_layers = self._gen_decoder()(
            emb[:, None, :], memory=None,
            memory_padding=cache["memory_padding"],
            cache=cache["layers"], decode_step=step,
            decode_lagging=decode_lagging, is_training=False,
            beam_anc=cache.get("beam_anc"))
        logits = self._gen_logits(dec_out[:, 0, :])
        new_cache = dict(cache)
        new_cache["layers"] = new_layers
        return logits, new_cache

    def decode_steps(self, ids, cache, times):
        mod = self.asr_modality if self.generate_side == "asr" \
            else self.trg_modality
        emb = mod(ids, time=times)
        dec_out, new_layers = self._gen_decoder()(
            emb, memory=None, memory_padding=cache["memory_padding"],
            cache=cache["layers"], decode_step=times, is_training=False)
        logits = self._gen_logits(dec_out)
        new_cache = dict(cache)
        new_cache["layers"] = new_layers
        return logits, new_cache


@register_model("multi_task_speech_transformer")
class MultiTaskSpeechTransformer(SpeechTransformer):

    module_cls = MultiTaskSpeechModule

    def __init__(self, args, src_meta, trg_meta, asr_meta=None, name=None):
        self._asr_meta = dict(asr_meta or trg_meta or {})
        super().__init__(args, src_meta, trg_meta, name=name)

    @classmethod
    def new(cls, args, src_meta=None, trg_meta=None, asr_meta=None,
            name=None):
        return cls(args, src_meta, trg_meta, asr_meta=asr_meta, name=name)

    @staticmethod
    def class_or_method_args():
        return SpeechTransformer.class_or_method_args() + [
            Flag("generation_output", dtype=Flag.TYPE.STRING, default="st",
                 choices=["st", "asr"],
                 help="Which decoder drives stepwise generation: the "
                      "translation (st) or the transcript (asr) side."),
        ]

    @property
    def generation_meta(self):
        """eos/bos/unk for the side generation decodes (the base
        prepare_generation/prepare_speculative consult this)."""
        if self._args.get("generation_output") == "asr":
            return self._asr_meta
        return self._trg_meta

    def module_kwargs(self):
        kw = super().module_kwargs()
        kw["asr_vocab_size"] = self._asr_meta.get(
            "vocab_size", kw["trg_vocab_size"])
        kw["asr_decoder_cfg"] = self.sub_cfg("asr_decoder.") or None
        kw["generate_side"] = self._args.get("generation_output") or "st"
        return kw

    def supports_fused_softmax_ce(self) -> bool:
        return False  # two softmaxes; the fused CE kernel serves one

    def example_inputs(self):
        ei = super().example_inputs()
        ei["inputs"]["asr_trg_input"] = jnp.ones([1, 3], jnp.int32)
        return ei
