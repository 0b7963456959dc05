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
"""Draft-model speculative decoding (greedy-exact).

Beyond-reference: the reference has no speculative decoding.  A small
DRAFT model proposes ``k`` tokens autoregressively; the TARGET model
verifies all of them in ONE multi-token step (``decode_steps``); the
longest agreeing prefix is accepted plus the target's own next token as
a correction.  Every emitted token is the target's greedy argmax, so
the output is EXACTLY the target model's greedy decode (pinned by
test) — the draft only changes how many target forward passes it takes.

Static-shape JAX design: one ``lax.while_loop`` whose state carries
PER-ROW decode times (rows accept different counts per iteration);
cache writes use per-row ``dynamic_update_slice`` offsets
(multi_head_attention.py), position signals come from explicit per-row
positions (common_layers.sinusoidal_position_signal_at), and rejected
draft positions hold stale cache states that are masked by the decode
bias and overwritten before they can ever be attended (the next write
window always starts at the first invalid position).
"""

import logging

import jax
import jax.numpy as jnp

from neurst_tpu.layers.layer_utils import NEG_INF
from neurst_tpu.layers.search.sequence_search import (SequenceSearch,
                                                      register_search_layer)
from neurst_tpu.utils.flags_core import Flag

__all__ = ["speculative_greedy_decode", "speculative_beam_search",
           "make_ngram_draft", "SpeculativeDecode"]


def make_ngram_draft(batch, buffer_len, vocab_size, ngram=3, prefix=None):
    """Self-drafting n-gram lookup "model" (prompt-lookup decoding,
    arXiv:2304.04487 LLMA / saxena'23): each draft step proposes the
    continuation of the most recent earlier occurrence of the current
    (ngram-1)-token suffix within the already-generated tokens,
    optionally preceded by a lookup ``prefix`` (the source sentence for
    copy-heavy MT with a shared vocabulary, or the LM prompt).

    No second model, no weights, no extra HBM traffic: a draft step is
    one [B, L, n-1] integer compare, so the speculative loop costs
    ~only the target's multi-token verification passes.  Greedy
    speculative decode stays EXACT regardless of proposal quality —
    the lookup hits only decide how many tokens commit per target pass
    (numbers, named entities, terminology repeats).  Once a span
    match starts, subsequent draft steps extend it (each drafted token
    is written into the buffer before the next lookup), so whole
    copied spans commit in one verification.

    The returned ``steps_fn(ids [B,1], cache, times [B])`` and ``init``
    satisfy the draft contract of ``speculative_greedy_decode``; the
    draft "cache" is the token buffer itself, and the same
    stale-beyond-time overwrite discipline as the attention caches
    applies (every call writes its own position before matching, and
    continuations beyond the call time are masked out).

    Args:
        batch: number of rows.
        buffer_len: generated-token capacity; must cover
            ``maximum_decode_length + speculative_k`` (the same
            no-clamp contract as the model caches).
        vocab_size: target vocabulary size (proposal one-hot width).
        ngram: total n-gram order; the suffix matched is the last
            ``ngram - 1`` tokens.
        prefix: optional int32 [B, P] lookup context prepended to the
            buffer (use -1 at padded positions: it never equals a real
            token, so pads can't match).
    """
    n = int(ngram)
    if n < 2:
        raise ValueError(f"ngram draft needs ngram >= 2, got {n}")
    gen = jnp.full([batch, buffer_len], -1, jnp.int32)
    if prefix is not None:
        prefix = jnp.asarray(prefix, jnp.int32)
        p_len = int(prefix.shape[1])
        init_buf = jnp.concatenate([prefix, gen], axis=1)
    else:
        p_len = 0
        init_buf = gen
    total = p_len + buffer_len
    n_windows = total - (n - 1)
    if n_windows < 1:
        raise ValueError(
            f"buffer ({total}) shorter than the ngram window ({n})")

    def steps_fn(ids, cache, times):
        buf = cache["buffer"]
        ids0 = ids[:, 0].astype(jnp.int32)
        pos = p_len + times  # [B]: this call's write position
        buf = jax.vmap(
            lambda row, v, t: jax.lax.dynamic_update_slice(
                row, v[None], (t,)))(buf, ids0, pos)
        # suffix = the last (n-1) known tokens ending at pos (clamped
        # early indices duplicate position 0; their windows are masked
        # out by the continuation bound below)
        offs = jnp.arange(n - 1) - (n - 2)
        sidx = jnp.maximum(pos[:, None] + offs[None, :], 0)
        suffix = jnp.take_along_axis(buf, sidx, axis=1)        # [B, n-1]
        windows = jnp.stack(
            [buf[:, i:n_windows + i] for i in range(n - 1)],
            axis=-1)                                           # [B, W, n-1]
        cont = buf[:, n - 1:]                                  # [B, W]
        starts = jnp.arange(n_windows)[None, :]
        ok = jnp.logical_and(
            jnp.all(windows == suffix[:, None, :], axis=-1),
            # the continuation token at starts + n - 1 must already be
            # known (this also excludes the trivial self-match, whose
            # continuation would be the unknown next token)
            starts + (n - 1) <= pos[:, None])
        best = jnp.max(jnp.where(ok, starts, -1), axis=1)      # [B]
        proposal = jnp.take_along_axis(
            cont, jnp.maximum(best, 0)[:, None], axis=1)[:, 0]
        # no match: repeat the last token (correctness is unaffected;
        # a miss just means this slot won't verify)
        proposal = jnp.where(best >= 0, proposal, ids0)
        proposal = jnp.clip(proposal, 0, vocab_size - 1)
        logits = jax.nn.one_hot(
            proposal, vocab_size, dtype=jnp.float32) * 1e4
        return logits[:, None, :], {"buffer": buf}

    return steps_fn, {"decoder_internal_cache": {"buffer": init_buf}}


def speculative_greedy_decode(target_steps_fn, target_init,
                              draft_steps_fn, draft_init,
                              speculative_k: int = 4,
                              extra_decode_length: int = 50,
                              maximum_decode_length: int = 256,
                              minimum_decode_length: int = 0,
                              enable_unk: bool = False,
                              sampling: bool = False,
                              rng=None,
                              temperature: float = 1.0,
                              top_k: int = 0,
                              top_p: float = 1.0,
                              return_stats: bool = False):
    """Greedy (or sampling) decode of the target model, accelerated by
    a draft model.

    Args:
        target_steps_fn / draft_steps_fn: fn(ids [B, k], cache,
            times [B]) -> (logits [B, k, V], new_cache) — the
            ``prepare_speculative`` closures of the two models.
        target_init / draft_init: generation initializers (the decode
            caches are independent; eos/bos/unk come from the target).
        speculative_k: draft tokens proposed (and verified) per
            iteration; up to k tokens commit per target forward pass.
        sampling: distribution-preserving speculative SAMPLING
            (Leviathan et al./Chen et al. acceptance-rejection): draft
            tokens are sampled from the draft's (filtered) distribution
            q, accepted with probability min(1, p/q) against the
            target's (filtered) distribution p, and the first rejected
            slot is resampled from the residual norm(max(p - q, 0)) —
            every emitted token is distributed EXACTLY as plain
            sampling from the target (statistically pinned by test).
            ``temperature``/``top_k``/``top_p`` define p the same way
            the plain sampling search does.

    Returns:
        (hypotheses int32 [B, maximum_decode_length], scores float32
         [B] — cumulative target log-prob of the emitted tokens, same
         semantics as the plain searches).  With ``return_stats`` a
        third dict is appended: ``target_passes`` (while-loop
        iterations == target forward passes, int32 scalar) and
        ``tokens_emitted`` (int32 [B]) — ``mean(tokens_emitted) /
        target_passes`` is the realized commit rate per pass, the
        quantity that decides whether speculation pays.
    """
    k = int(speculative_k)
    assert k >= 1
    if sampling and rng is None:
        rng = jax.random.PRNGKey(0)
    eos_id = int(target_init["eos_id"])
    unk_id = target_init.get("unk_id")
    if enable_unk:
        unk_id = None
    bos = target_init["decoder_input"].astype(jnp.int32)
    batch = bos.shape[0]

    enc_maxlen = target_init.get("encoder_inputs_maxlen")
    if enc_maxlen is None:
        max_steps = jnp.asarray(maximum_decode_length, jnp.int32)
    else:
        max_steps = jnp.minimum(
            jnp.asarray(enc_maxlen, jnp.int32) + extra_decode_length,
            maximum_decode_length)
    max_steps = jnp.maximum(max_steps, minimum_decode_length)

    def masked_log_probs(logits, emit_index):
        """Target/draft token distribution at an emission index —
        delegates to sampling.masked_step_log_probs so the masking
        stays bit-identical to the plain searches (the distribution-
        preservation guarantee depends on it)."""
        from neurst_tpu.layers.search.sampling import masked_step_log_probs
        return masked_step_log_probs(
            logits, emit_index, eos_id, unk_id,
            temperature if sampling else 1.0, minimum_decode_length)

    def filtered(lp):
        """The distribution plain sampling actually draws from."""
        from neurst_tpu.layers.search.sampling import (_filter_top_k,
                                                       _filter_top_p)
        if top_k and top_k > 0:
            lp = _filter_top_k(lp, top_k)
        if top_p and top_p < 1.0:
            lp = _filter_top_p(lp, top_p)
        return jax.nn.log_softmax(lp, axis=-1)

    # predicted buffer is k longer than the output: each iteration
    # writes a full k-window at the row's time offset and the tail junk
    # is either overwritten by the next window or cleaned up at the end
    init_state = dict(
        times=jnp.zeros([batch], jnp.int32),
        last=bos,
        finished=jnp.broadcast_to(max_steps <= 0, [batch]),
        log_probs=jnp.zeros([batch], jnp.float32),
        predicted=jnp.zeros([batch, maximum_decode_length + k], jnp.int32),
        target_cache=target_init["decoder_internal_cache"],
        draft_cache=draft_init["decoder_internal_cache"],
        iters=jnp.zeros([], jnp.int32),
    )
    if sampling:
        init_state["rng"] = rng

    def cond_fn(state):
        return jnp.logical_not(jnp.all(state["finished"]))

    def body_fn(state):
        times = state["times"]
        if sampling:
            iter_rng, next_rng = jax.random.split(state["rng"])
            draft_rngs = jax.random.split(
                jax.random.fold_in(iter_rng, 0), k)
            accept_rng = jax.random.fold_in(iter_rng, 1)
            correct_rng = jax.random.fold_in(iter_rng, 2)

        # ---- draft: propose k tokens autoregressively ---- #
        draft_cache = state["draft_cache"]
        d_tokens = []
        q_rows = []
        last_d = state["last"]
        for j in range(k):
            logits_d, draft_cache = draft_steps_fn(
                last_d[:, None], draft_cache, times + j)
            lp_d = masked_log_probs(logits_d[:, 0], times + j)
            if sampling:
                qlp = filtered(lp_d)
                last_d = jax.random.categorical(
                    draft_rngs[j], qlp, axis=-1).astype(jnp.int32)
                q_rows.append(qlp)
            else:
                last_d = jnp.argmax(lp_d, axis=-1).astype(jnp.int32)
            d_tokens.append(last_d)
        d = jnp.stack(d_tokens, axis=1)  # [B, k]

        # ---- target: verify all k in one multi-token step ---- #
        inp = jnp.concatenate([state["last"][:, None], d[:, :k - 1]],
                              axis=1)
        logits_t, target_cache = target_steps_fn(
            inp, state["target_cache"], times)
        emit_index = times[:, None] + jnp.arange(k)  # [B, k]
        lp_t = masked_log_probs(logits_t, emit_index)

        if sampling:
            # acceptance-rejection: accept d_j with prob min(1, p/q);
            # the first rejected slot resamples from the residual
            # norm(max(p - q, 0)) — together exactly the target
            # distribution
            plp = filtered(lp_t)                 # [B, k, V]
            qlp_all = jnp.stack(q_rows, axis=1)  # [B, k, V]
            p_at_d = jnp.take_along_axis(plp, d[..., None],
                                         axis=-1)[..., 0]
            q_at_d = jnp.take_along_axis(qlp_all, d[..., None],
                                         axis=-1)[..., 0]
            u = jax.random.uniform(accept_rng, p_at_d.shape,
                                   minval=1e-20)
            accept = jnp.log(u) < (p_at_d - q_at_d)
            n = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1),
                        axis=1)
            # residual at the first rejected slot (per-row gather);
            # rows with n == k never use the correction
            reject_slot = jnp.minimum(n, k - 1)
            plp_r = jnp.take_along_axis(
                plp, reject_slot[:, None, None], axis=1)[:, 0]
            qlp_r = jnp.take_along_axis(
                qlp_all, reject_slot[:, None, None], axis=1)[:, 0]
            residual = jnp.maximum(jnp.exp(plp_r) - jnp.exp(qlp_r), 0.0)
            total = jnp.sum(residual, axis=-1, keepdims=True)
            # numerical guard: p ~= q makes rejection measure ~0 (the
            # path is then (almost) never taken); fall back to p
            res_lp = jnp.where(total > 0.0,
                               jnp.log(jnp.maximum(residual, 1e-38)
                                       / jnp.maximum(total, 1e-38)),
                               plp_r)
            correction = jax.random.categorical(
                correct_rng, res_lp, axis=-1).astype(jnp.int32)
            slot_idx = jnp.arange(k)[None, :]
            g_commit = jnp.where(slot_idx == n[:, None],
                                 correction[:, None], d)
        else:
            g = jnp.argmax(lp_t, axis=-1).astype(jnp.int32)  # [B, k]
            # longest agreeing prefix n, then commit m = min(n+1, k)
            # tokens: n accepted drafts (== g) plus the target's own
            # next token as the correction when n < k
            agree = jnp.cumprod((d == g).astype(jnp.int32), axis=1)
            n = jnp.sum(agree, axis=1)
            g_commit = g
        m = jnp.minimum(n + 1, k)

        # EOS inside the committed window truncates it (inclusive)
        slot = jnp.arange(k)[None, :]
        is_eos = jnp.logical_and(g_commit == eos_id, slot < m[:, None])
        first_eos = jnp.min(jnp.where(is_eos, slot, k), axis=1)
        hit_eos = first_eos < k
        m = jnp.where(hit_eos, first_eos + 1, m)

        # max-length cap; finished rows commit nothing
        m = jnp.minimum(m, jnp.maximum(max_steps - times, 0))
        m = jnp.where(state["finished"], 0, m)
        new_finished = jnp.logical_or(
            state["finished"],
            jnp.logical_or(jnp.logical_and(hit_eos, m > 0),
                           times + m >= max_steps))

        # commit: write the k-window, advance per-row state
        def write(row, vals, t):
            return jax.lax.dynamic_update_slice(row, vals, (t,))
        predicted = jax.vmap(write)(state["predicted"], g_commit, times)
        committed = slot < m[:, None]
        step_lp = jnp.take_along_axis(lp_t, g_commit[..., None],
                                      axis=-1)[..., 0]
        log_probs = state["log_probs"] + jnp.sum(
            jnp.where(committed, step_lp, 0.0), axis=1)
        last = jnp.where(
            m > 0,
            jnp.take_along_axis(
                g_commit, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0],
            state["last"])

        out = dict(
            times=times + m,
            last=last.astype(jnp.int32),
            finished=new_finished,
            log_probs=log_probs,
            predicted=predicted,
            target_cache=target_cache,
            draft_cache=draft_cache,
            iters=state["iters"] + 1,
        )
        if sampling:
            out["rng"] = next_rng
        return out

    final = jax.lax.while_loop(cond_fn, body_fn, init_state)
    # clean the junk tail beyond each row's final length (EOS fill,
    # matching the plain searches' post-finish EOS forcing)
    positions = jnp.arange(maximum_decode_length + k)[None, :]
    predicted = jnp.where(positions < final["times"][:, None],
                          final["predicted"], eos_id)
    if return_stats:
        stats = {"target_passes": final["iters"],
                 "tokens_emitted": final["times"]}
        return (predicted[:, :maximum_decode_length],
                final["log_probs"], stats)
    return predicted[:, :maximum_decode_length], final["log_probs"]


def speculative_beam_search(target_steps_fn, target_init,
                            draft_steps_fn, draft_init,
                            beam_size: int = 4,
                            speculative_k: int = 4,
                            top_k: int = 1,
                            length_penalty: float = 0.6,
                            extra_decode_length: int = 50,
                            maximum_decode_length: int = 256,
                            minimum_decode_length: int = 0,
                            enable_unk: bool = False,
                            return_stats: bool = False):
    """BEAM search of the target model, accelerated by a draft —
    output EXACTLY ``sequence_beam_search`` (pinned by test).

    Each iteration: every one of the ``B*beam`` rows drafts ``k``
    tokens along its own hypothesis; ONE multi-token target pass
    verifies all rows; then the beam update (top-k over beam x vocab
    with GNMT length penalty, forced-EOS for finished beams, min-length
    and UNK masks — bit-identical math to beam_search.body_fn) is
    REPLAYED over the precomputed per-step logits.  A replayed step j
    is trustworthy iff every surviving beam's transitions at steps < j
    stayed "on draft" (the chosen word equals the chosen predecessor's
    drafted token, so the predecessor row's cache/logits along the
    drafted path are the true path); the first step with any deviation
    is still exact (its ENTRY logits are conditioned only on accepted
    prefixes) but ends the window — so with n leading all-on-draft
    steps, ``m = min(n+1, k)`` beam steps commit per target pass,
    the same economics as greedy speculative decoding.

    Cache discipline: the target pass writes each row's drafted-path
    K/V at positions time..time+k-1; after committing m steps the beam
    configuration's rows gather the cache by their composed ancestor
    map (rows of the original drafted set), whose slots
    time..time+m-1 are exactly the accepted path; slots beyond are
    stale-but-masked and overwritten before use (same discipline as
    the greedy loop / the attention caches generally).

    Args mirror ``sequence_beam_search`` + ``speculative_k``; the
    draft fns must be built with batch = B*beam rows (beam-major).

    Returns (hypotheses [B*top_k, max_len], scores [B*top_k]); with
    ``return_stats`` appends {"target_passes", "tokens_emitted"}.
    """
    k = int(speculative_k)
    beam_size = int(beam_size)
    assert k >= 1 and beam_size >= 1
    eos_id = int(target_init["eos_id"])
    unk_id = target_init.get("unk_id")
    if enable_unk:
        unk_id = None
    bos = target_init["decoder_input"].astype(jnp.int32)
    batch_size = bos.shape[0]
    bb = batch_size * beam_size

    from neurst_tpu.layers import layer_utils
    from neurst_tpu.layers.search.beam_search import _length_penalty

    cache = layer_utils.stack_beam_size_selective(
        target_init["decoder_internal_cache"], beam_size)
    input_ids = layer_utils.stack_beam_size(bos, beam_size)

    enc_maxlen = target_init.get("encoder_inputs_maxlen")
    if enc_maxlen is None:
        max_steps = jnp.asarray(maximum_decode_length, jnp.int32)
    else:
        max_steps = jnp.minimum(
            jnp.asarray(enc_maxlen, jnp.int32) + extra_decode_length,
            maximum_decode_length)
    max_steps = jnp.maximum(max_steps, minimum_decode_length)

    beam_base = (jnp.arange(bb) // beam_size) * beam_size
    not_first_beam = (jnp.arange(bb) % beam_size) > 0

    init_state = dict(
        time=jnp.zeros([], jnp.int32),
        input_ids=input_ids,
        cache=cache,
        draft_cache=draft_init["decoder_internal_cache"],
        finished=jnp.zeros([bb], jnp.bool_),
        log_probs=jnp.zeros([bb], jnp.float32),
        lengths=jnp.zeros([bb], jnp.int32),
        predicted=jnp.zeros([bb, maximum_decode_length + k], jnp.int32),
        iters=jnp.zeros([], jnp.int32),
    )

    def cond_fn(state):
        return jnp.logical_and(
            jnp.logical_not(jnp.all(state["finished"])),
            state["time"] < max_steps)

    def body_fn(state):
        time = state["time"]
        times_vec = jnp.full([bb], time, jnp.int32)

        # ---- draft: k tokens per row along its own hypothesis ---- #
        draft_cache = state["draft_cache"]
        last_d = state["input_ids"]
        d_tokens = []
        for j in range(k):
            logits_d, draft_cache = draft_steps_fn(
                last_d[:, None], draft_cache, times_vec + j)
            from neurst_tpu.layers.search.sampling import \
                masked_step_log_probs
            lp_d = masked_step_log_probs(
                logits_d[:, 0], times_vec + j, eos_id, unk_id, 1.0,
                minimum_decode_length)
            last_d = jnp.argmax(lp_d, axis=-1).astype(jnp.int32)
            d_tokens.append(last_d)
        d = jnp.stack(d_tokens, axis=1)  # [bb, k]

        # ---- target: verify all k slots in one pass ---- #
        inp = jnp.concatenate(
            [state["input_ids"][:, None], d[:, :k - 1]], axis=1)
        logits_t, target_cache = target_steps_fn(
            inp, state["cache"], times_vec)  # [bb, k, V]
        vocab_size = logits_t.shape[-1]
        eos_onehot = jnp.arange(vocab_size) == eos_id

        # ---- replay the exact beam updates on precomputed logits --- #
        def replay_step(carry, j):
            (log_probs_c, finished_c, lengths_c, anc, on_draft,
             predicted_c) = carry
            cur_time = time + j
            logits = jnp.take(logits_t[:, :, :], anc, axis=0)
            logits = jnp.take_along_axis(
                logits, j[None, None, None].astype(jnp.int32).repeat(
                    bb, axis=0), axis=1)[:, 0]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

            fin = finished_c[:, None]
            finished_bias = jnp.where(eos_onehot, 0.0, NEG_INF)[None, :]
            lp = jnp.where(fin, finished_bias, lp)
            if unk_id is not None:
                lp = lp + jnp.where(
                    jnp.arange(vocab_size) == unk_id, NEG_INF,
                    0.0)[None, :]
            if minimum_decode_length > 0:
                eos_mask = jnp.where(eos_onehot, NEG_INF, 0.0)[None, :]
                lp = jnp.where(cur_time < minimum_decode_length - 1,
                               lp + eos_mask, lp)

            cum = lp + log_probs_c[:, None]
            next_length = lengths_c + 1 - finished_c.astype(jnp.int32)
            penalty = _length_penalty(next_length, length_penalty)
            scores = cum * penalty[:, None]
            scores = jnp.where(
                jnp.logical_and(cur_time == 0, not_first_beam)[:, None],
                NEG_INF * 2.0, scores)

            flat = scores.reshape(batch_size, beam_size * vocab_size)
            _, top_idx = jax.lax.top_k(flat, k=beam_size)
            top_idx = top_idx.reshape(-1)
            word_ids = (top_idx % vocab_size).astype(jnp.int32)
            beam_ids = top_idx // vocab_size + beam_base

            next_lengths = jnp.take(next_length, beam_ids)
            next_log_probs = jnp.take(
                cum.reshape(-1), beam_ids * vocab_size + word_ids)
            predicted_n = jnp.take(predicted_c, beam_ids, axis=0)
            predicted_n = jax.vmap(
                lambda row, w, t: jax.lax.dynamic_update_slice(
                    row, w[None], (t,)))(
                predicted_n, word_ids,
                jnp.full([bb], cur_time, jnp.int32))
            next_finished = word_ids == eos_id

            anc_next = jnp.take(anc, beam_ids)
            drafted = jnp.take(d[:, :], anc_next, axis=0)
            drafted_j = jnp.take_along_axis(
                drafted, j[None, None].astype(jnp.int32).repeat(
                    bb, axis=0), axis=1)[:, 0]
            # a finished predecessor's forced EOS consults no logits,
            # so it cannot invalidate later steps
            tr_on_draft = jnp.logical_or(
                drafted_j == word_ids, jnp.take(finished_c, beam_ids))
            on_draft_next = jnp.logical_and(
                jnp.take(on_draft, beam_ids), tr_on_draft)

            new_carry = (next_log_probs, next_finished, next_lengths,
                         anc_next, on_draft_next, predicted_n)
            ys = dict(word_ids=word_ids, log_probs=next_log_probs,
                      finished=next_finished, lengths=next_lengths,
                      anc=anc_next, predicted=predicted_n,
                      all_on_draft=jnp.all(on_draft_next))
            return new_carry, ys

        carry0 = (state["log_probs"], state["finished"],
                  state["lengths"], jnp.arange(bb, dtype=jnp.int32),
                  jnp.ones([bb], jnp.bool_), state["predicted"])
        _, ys = jax.lax.scan(replay_step, carry0,
                             jnp.arange(k, dtype=jnp.int32))

        # m = min(n + 1, k): n = leading steps whose TRANSITIONS all
        # stayed on-draft (step n's entry logits are still exact)
        n = jnp.sum(jnp.cumprod(
            ys["all_on_draft"].astype(jnp.int32)), dtype=jnp.int32)
        m = jnp.minimum(n + 1, k)
        m = jnp.minimum(m, jnp.maximum(max_steps - time, 1))
        sel = m - 1

        def pick(x):
            return jax.lax.dynamic_index_in_dim(x, sel, axis=0,
                                                keepdims=False)

        anc_final = pick(ys["anc"])
        new_cache = layer_utils.gather_beams_selective(
            target_cache, anc_final)
        new_draft_cache = jax.tree_util.tree_map(
            lambda leaf: jnp.take(leaf, anc_final, axis=0), draft_cache)

        return dict(
            time=time + m,
            input_ids=pick(ys["word_ids"]),
            cache=new_cache,
            draft_cache=new_draft_cache,
            finished=pick(ys["finished"]),
            log_probs=pick(ys["log_probs"]),
            lengths=pick(ys["lengths"]),
            predicted=pick(ys["predicted"]),
            iters=state["iters"] + 1,
        )

    final = jax.lax.while_loop(cond_fn, body_fn, init_state)

    penalty = _length_penalty(final["lengths"], length_penalty)
    scores = (final["log_probs"] * penalty).reshape(batch_size, beam_size)
    top_scores, top_idx = jax.lax.top_k(scores, k=top_k)
    gather_idx = (top_idx + (jnp.arange(batch_size)
                             * beam_size)[:, None]).reshape(-1)
    hypotheses = jnp.take(final["predicted"], gather_idx,
                          axis=0)[:, :maximum_decode_length]
    if return_stats:
        stats = {"target_passes": final["iters"],
                 "tokens_emitted": jnp.take(final["lengths"], gather_idx)}
        return hypotheses, top_scores.reshape(-1), stats
    return hypotheses, top_scores.reshape(-1)


@register_search_layer("speculative_decode", "speculative")
class SpeculativeDecode(SequenceSearch):
    """Greedy decode of the bound model accelerated by a draft model
    loaded from ``--draft_model_dir`` (its own model_configs.yml +
    latest checkpoint; must share the target's vocabulary)."""

    @staticmethod
    def class_or_method_args():
        return [
            Flag("draft_model_dir", dtype=Flag.TYPE.STRING, default=None,
                 help="Model dir of the (small) draft model: "
                      "model_configs.yml + checkpoint; must share the "
                      "target's target-side vocabulary."),
            Flag("draft_method", dtype=Flag.TYPE.STRING, default="model",
                 choices=["model", "ngram"],
                 help="'model': a draft model from --draft_model_dir. "
                      "'ngram': SELF-drafting prompt-lookup — proposals "
                      "come from matching the current suffix against "
                      "the already-generated tokens (and optionally the "
                      "source/prompt); no second model needed."),
            Flag("draft_ngram", dtype=Flag.TYPE.INTEGER, default=3,
                 help="n-gram order for --draft_method ngram (the "
                      "matched suffix is n-1 tokens)."),
            Flag("draft_lookup_source", dtype=Flag.TYPE.BOOLEAN,
                 default=False,
                 help="With --draft_method ngram: also match against "
                      "the source token ids (requires a shared "
                      "source/target vocabulary, e.g. joint BPE)."),
            Flag("speculative_k", dtype=Flag.TYPE.INTEGER, default=4,
                 help="Draft tokens proposed (and verified in one "
                      "target pass) per iteration."),
            Flag("beam_size", dtype=Flag.TYPE.INTEGER, default=1,
                 help="With beam_size > 1: speculative BEAM search — "
                      "every beam row drafts its own continuation and "
                      "the exact beam update replays over one "
                      "multi-token verification pass (output pinned "
                      "to plain beam search).  Mutually exclusive "
                      "with --sampling."),
            Flag("length_penalty", dtype=Flag.TYPE.FLOAT, default=0.6,
                 help="GNMT length penalty alpha (beam mode; negative "
                      "means divide by length)."),
            Flag("top_hypotheses", dtype=Flag.TYPE.INTEGER, default=1,
                 help="Hypotheses returned per sentence (beam mode)."),
            Flag("sampling", dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Distribution-preserving speculative SAMPLING "
                      "(accept-with-min(1,p/q), residual resample) "
                      "instead of greedy verification."),
            Flag("temperature", dtype=Flag.TYPE.FLOAT, default=1.0,
                 help="Softmax temperature (sampling mode)."),
            Flag("top_k", dtype=Flag.TYPE.INTEGER, default=0,
                 help="Sample from the top-k tokens (sampling mode)."),
            Flag("top_p", dtype=Flag.TYPE.FLOAT, default=1.0,
                 help="Nucleus mass (sampling mode)."),
            Flag("seed", dtype=Flag.TYPE.INTEGER, default=0,
                 help="The sampling random seed."),
            Flag("maximum_decode_length", dtype=Flag.TYPE.INTEGER,
                 default=256, help="The maximum decoding length."),
            Flag("minimum_decode_length", dtype=Flag.TYPE.INTEGER, default=0,
                 help="The minimum decoding length."),
            Flag("extra_decode_length", dtype=Flag.TYPE.INTEGER, default=50,
                 help="Decode up to source length + this many steps."),
            Flag("enable_unk", dtype=Flag.TYPE.BOOLEAN, default=False,
                 help="Whether UNK may be generated."),
        ]

    def __init__(self, args=None, draft_model=None, draft_params=None):
        super().__init__(args)
        self._draft_model = draft_model
        self._draft_params = draft_params

    def prepare(self):
        # file IO + checkpoint restore must happen OUTSIDE the jit
        # trace (SequenceGenerator calls prepare() before jitting)
        self._ensure_draft()

    def _ensure_draft(self):
        if self._draft_model is not None:
            return
        if self._args.get("draft_method") == "ngram":
            return  # self-drafting: no model to load
        draft_dir = self._args.get("draft_model_dir")
        if not draft_dir:
            raise ValueError(
                "speculative_decode needs --draft_model_dir (or a "
                "draft model passed programmatically)")
        from neurst_tpu.tasks.task import build_task
        from neurst_tpu.utils import checkpoints as ckpt_lib
        from neurst_tpu.utils.configurable import (
            ModelConfigs, strip_training_only_model_flags)
        from neurst_tpu.utils.param_policy import restore_inference_params
        cfg = ModelConfigs.load(draft_dir)
        cfg["model.params"] = strip_training_only_model_flags(
            cfg.get("model.params"))
        task = build_task(cfg)
        self._draft_model = task.build_model(cfg)
        params = self._draft_model.init_params(jax.random.PRNGKey(0))
        path = ckpt_lib.latest_checkpoint(draft_dir)
        flat = {}
        if path:
            flat = ckpt_lib.restore_checkpoint_params(path)
            logging.info("Restored draft model from %s", path)
        else:
            logging.warning("No draft checkpoint in %s; random init.",
                            draft_dir)
        # shared path: int8ify under --int8_serving + bf16-at-rest
        from neurst_tpu.layers.quantization.quant_layers import \
            int8_static_act_enabled
        if int8_static_act_enabled():
            # the draft restores outside the generator's calibration
            # loop — an uncalibrated act_scale would silently serve
            # garbage proposals
            raise NotImplementedError(
                "--int8_static_activations is not supported with "
                "speculative decoding (the draft model is never "
                "calibrated); use dynamic --int8_activations")
        self._draft_params, _ = restore_inference_params(
            self._draft_model, params, flat)

    def _make_ngram_draft(self, t_init, parsed_inp, buffer_len):
        """Builds the self-drafting lookup draft: the lookup context is
        the LM prompt (2-D ``trg_input``) and, with
        ``--draft_lookup_source``, the source token ids (pads -> -1)."""
        batch = t_init["decoder_input"].shape[0]
        vocab = self._model.trg_meta.get("vocab_size")
        parts = []
        trg_input = parsed_inp.get("trg_input")
        if trg_input is not None and jnp.ndim(trg_input) == 2:
            parts.append(jnp.asarray(trg_input, jnp.int32))
        if self._args.get("draft_lookup_source"):
            src = parsed_inp.get("src")
            if src is None or jnp.ndim(src) != 2 or \
                    not jnp.issubdtype(jnp.asarray(src).dtype, jnp.integer):
                raise ValueError(
                    "--draft_lookup_source needs integer source token "
                    "ids (text tasks with a shared vocabulary)")
            src = jnp.asarray(src, jnp.int32)
            pad = parsed_inp.get("src_padding")
            if pad is not None:
                src = jnp.where(jnp.asarray(pad) > 0, -1, src)
            parts.append(src)
        prefix = jnp.concatenate(parts, axis=1) if parts else None
        return make_ngram_draft(
            batch, buffer_len, vocab,
            ngram=self._args.get("draft_ngram") or 3, prefix=prefix)

    def __call__(self, params, parsed_inp: dict, rng=None):
        a = self._args
        self._ensure_draft()
        max_len = a.get("maximum_decode_length") or 256
        k = a.get("speculative_k") or 4
        # caches are k longer than the output: a row's k-wide write
        # window near the end must not clamp (dynamic_update_slice
        # would shift it onto valid positions)
        t_fn, t_init = self._model.prepare_speculative(
            params, parsed_inp, decode_padded_length=max_len + k)
        if a.get("draft_method") == "ngram":
            d_fn, d_init = self._make_ngram_draft(t_init, parsed_inp,
                                                  max_len + k)
        else:
            d_fn, d_init = self._draft_model.prepare_speculative(
                self._draft_params, parsed_inp,
                decode_padded_length=max_len + k)
            if self._draft_model.trg_meta.get("vocab_size") != \
                    self._model.trg_meta.get("vocab_size"):
                raise ValueError("draft/target vocabulary sizes differ")
        if rng is None:
            rng = jax.random.PRNGKey(a.get("seed") or 0)
        return speculative_greedy_decode(
            t_fn, t_init, d_fn, d_init,
            speculative_k=a.get("speculative_k") or 4,
            extra_decode_length=a.get("extra_decode_length") or 50,
            maximum_decode_length=max_len,
            minimum_decode_length=a.get("minimum_decode_length") or 0,
            enable_unk=bool(a.get("enable_unk")),
            sampling=bool(a.get("sampling")),
            rng=rng,
            temperature=a.get("temperature") or 1.0,
            top_k=a.get("top_k") or 0,
            top_p=a.get("top_p") or 1.0)
