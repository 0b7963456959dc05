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
"""Ancestral sampling with top-k / top-p (nucleus) filtering.

Parity: /root/reference/neurst/layers/search/sampling.py (TopSampling:
temperature, top-k and top-p filtering, EOS termination).  Static-shape
``lax.while_loop`` with a per-step folded PRNG key.
"""

import jax
import jax.numpy as jnp

from neurst_tpu.layers import layer_utils
from neurst_tpu.layers.layer_utils import NEG_INF
from neurst_tpu.layers.search.sequence_search import (SequenceSearch,
                                                      register_search_layer)
from neurst_tpu.utils.flags_core import Flag

__all__ = ["sequence_sampling", "TopSampling"]


def masked_step_log_probs(logits, emit_index, eos_id, unk_id,
                          temperature, minimum_decode_length):
    """Temperature + UNK + min-length masked log-probs — THE target
    distribution definition, shared by plain sampling and speculative
    decoding (speculative's distribution-preservation guarantee
    requires both to apply identical masking, so keep this the single
    source of truth).  ``emit_index``: scalar, [B] or [B, k] emission
    indices (0-based output position) for the min-length mask."""
    logits = logits.astype(jnp.float32)
    if temperature and temperature != 1.0:
        logits = logits / temperature
    lp = jax.nn.log_softmax(logits, axis=-1)
    vocab = lp.shape[-1]
    if unk_id is not None:
        lp = lp + jnp.where(jnp.arange(vocab) == unk_id, NEG_INF, 0.0)
    if minimum_decode_length > 0:
        eos_mask = jnp.where(jnp.arange(vocab) == eos_id, NEG_INF, 0.0)
        cond = jnp.asarray(emit_index < minimum_decode_length - 1)
        lp = lp + jnp.where(cond[..., None], eos_mask, 0.0)
    return lp


def _filter_top_k(log_probs, k):
    """Keeps the k largest entries; masks the rest with -inf."""
    vals, _ = jax.lax.top_k(log_probs, k)
    kth = vals[..., -1:]
    return jnp.where(log_probs < kth, NEG_INF, log_probs)


def _filter_top_p(log_probs, p):
    """Nucleus filtering: keeps the smallest prefix of the sorted vocab
    whose cumulative probability exceeds p."""
    sorted_lp = -jnp.sort(-log_probs, axis=-1)
    probs = jnp.exp(sorted_lp)
    cum = jnp.cumsum(probs, axis=-1)
    # keep entries where the cumulative prob *before* them is < p
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept log-prob
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_lp, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(log_probs < threshold, NEG_INF, log_probs)


def sequence_sampling(symbols_to_logits_fn, generation_initializer, rng,
                      top_k: int = 0, top_p: float = 1.0,
                      temperature: float = 1.0,
                      num_samples: int = 1,
                      extra_decode_length: int = 50,
                      maximum_decode_length: int = 256,
                      minimum_decode_length: int = 0,
                      enable_unk: bool = False,
                      prefix_decode_chunk: int = 0,
                      decode_unroll: int = 1):
    """Samples sequences stepwise.  Returns (ids [B*num_samples, L],
    scores [B*num_samples] cumulative log-prob)."""
    eos_id = int(generation_initializer["eos_id"])
    unk_id = generation_initializer.get("unk_id")
    if enable_unk:
        unk_id = None
    decoder_input = generation_initializer["decoder_input"]
    batch_size = decoder_input.shape[0]
    bb = batch_size * num_samples
    # top_k=1 with no nucleus filter IS deterministic argmax: skip the
    # per-step rng split, the top-k filter and the full-vocab threefry
    # categorical (the categorical over a single surviving logit always
    # returns it) — greedy decode pays zero RNG cost
    greedy = (top_k == 1 and (not top_p or top_p >= 1.0))

    # memory/memory_padding stay [B, ...] — samples of one sentence
    # share encoder state; cross-attention groups the sample rows
    # (same mechanism as beam search's shared-kv decode)
    cache = layer_utils.stack_beam_size_selective(
        generation_initializer["decoder_internal_cache"], num_samples)
    input_ids = layer_utils.stack_beam_size(
        decoder_input.astype(jnp.int32), num_samples)

    enc_maxlen = generation_initializer.get("encoder_inputs_maxlen")
    if enc_maxlen is None:
        max_steps = jnp.asarray(maximum_decode_length, jnp.int32)
    else:
        max_steps = jnp.minimum(
            jnp.asarray(enc_maxlen, jnp.int32) + extra_decode_length,
            maximum_decode_length)
    max_steps = jnp.maximum(max_steps, minimum_decode_length)

    init_state = dict(
        time=jnp.zeros([], jnp.int32),
        input_ids=input_ids,
        cache=cache,
        finished=jnp.zeros([bb], jnp.bool_),
        log_probs=jnp.zeros([bb], jnp.float32),
        predicted=jnp.zeros([bb, maximum_decode_length], jnp.int32),
        rng=rng,
    )

    def cond_fn(state):
        return jnp.logical_and(jnp.logical_not(jnp.all(state["finished"])),
                               state["time"] < max_steps)

    def body_fn(state):
        time = state["time"]
        logits, new_cache = symbols_to_logits_fn(
            state["input_ids"], state["cache"], time)
        log_probs = masked_step_log_probs(
            logits, time, eos_id, unk_id, temperature,
            minimum_decode_length)
        if greedy:
            sampled = jnp.argmax(log_probs, axis=-1)
            next_rng = state["rng"]
        else:
            filtered = log_probs
            if top_k and top_k > 0:
                filtered = _filter_top_k(filtered, top_k)
            if top_p and top_p < 1.0:
                filtered = _filter_top_p(filtered, top_p)

            step_rng, next_rng = jax.random.split(state["rng"])
            sampled = jax.random.categorical(step_rng, filtered, axis=-1)
        sampled = jnp.where(state["finished"],
                            jnp.full_like(sampled, eos_id), sampled)
        step_lp = jnp.take_along_axis(
            log_probs, sampled[:, None], axis=1)[:, 0]
        step_lp = jnp.where(state["finished"], 0.0, step_lp)

        predicted = jax.lax.dynamic_update_slice(
            state["predicted"], sampled[:, None].astype(jnp.int32), (0, time))
        return dict(
            time=time + 1,
            input_ids=sampled.astype(jnp.int32),
            cache=new_cache,
            finished=jnp.logical_or(state["finished"], sampled == eos_id),
            log_probs=state["log_probs"] + step_lp,
            predicted=predicted,
            rng=next_rng,
        )

    final = layer_utils.chunked_decode_while(
        cond_fn, body_fn, init_state, maximum_decode_length,
        prefix_decode_chunk,
        time_offset=int(generation_initializer.get("decode_time_offset", 0)),
        unroll=decode_unroll, max_steps=max_steps)
    return final["predicted"], final["log_probs"]


@register_search_layer("top_sampling", "sampling")
class TopSampling(SequenceSearch):

    @staticmethod
    def class_or_method_args():
        return [
            Flag("top_k", dtype=Flag.TYPE.INTEGER, default=0,
                 help="Sample from the top-k tokens (0 = whole vocab)."),
            Flag("top_p", dtype=Flag.TYPE.FLOAT, default=1.0,
                 help="Nucleus sampling probability mass (1.0 = off)."),
            Flag("temperature", dtype=Flag.TYPE.FLOAT, default=1.0,
                 help="Softmax temperature."),
            Flag("num_samples", dtype=Flag.TYPE.INTEGER, default=1,
                 help="The number of samples per input."),
            Flag("maximum_decode_length", dtype=Flag.TYPE.INTEGER,
                 default=256, help="The maximum decoding length."),
            Flag("minimum_decode_length", dtype=Flag.TYPE.INTEGER, default=0,
                 help="The minimum decoding length."),
            Flag("extra_decode_length", dtype=Flag.TYPE.INTEGER, default=50,
                 help="Decode up to source length + this many steps."),
            Flag("enable_unk", dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether UNK may be generated."),
            Flag("prefix_decode_chunk", dtype=Flag.TYPE.INTEGER, default=64,
                 help="Self-attention cache prefix chunk for stepwise "
                      "decode: the loop runs in geometrically growing "
                      "prefix chunks from this size, so each step reads "
                      "~the valid cache prefix instead of "
                      "maximum_decode_length (0 = off; exact either way)."),
            Flag("decode_unroll", dtype=Flag.TYPE.INTEGER, default=4,
                 help="Decode steps per while-loop iteration (exact; "
                      "amortizes per-iteration loop overhead)."),
            Flag("seed", dtype=Flag.TYPE.INTEGER, default=0,
                 help="The sampling random seed."),
        ]

    def __call__(self, params, parsed_inp: dict, rng=None):
        a = self._args
        s2l, init = self._model.prepare_generation(
            params, parsed_inp,
            decode_padded_length=a.get("maximum_decode_length") or 256)
        if rng is None:
            rng = jax.random.PRNGKey(a.get("seed") or 0)
        return sequence_sampling(
            s2l, init, rng,
            top_k=a.get("top_k") or 0,
            top_p=a.get("top_p") or 1.0,
            temperature=a.get("temperature") or 1.0,
            num_samples=a.get("num_samples") or 1,
            extra_decode_length=a.get("extra_decode_length") or 50,
            maximum_decode_length=a.get("maximum_decode_length") or 256,
            minimum_decode_length=a.get("minimum_decode_length") or 0,
            enable_unk=bool(a.get("enable_unk")),
            prefix_decode_chunk=(64 if a.get("prefix_decode_chunk") is None
                                 else a["prefix_decode_chunk"]),
            decode_unroll=(4 if a.get("decode_unroll") is None
                           else a["decode_unroll"]))
