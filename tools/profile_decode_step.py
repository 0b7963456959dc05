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
"""Per-component profile of the headline ST beam decode.

Measures the bench decode config (SpeechTransformer-s, batch 16, 1024
frames, beam 4, 64 forced steps, chunked prefix 16, bf16-at-rest
params) under controlled ablations, attributing costs from DIFFERENCES
of END-TO-END decodes (XLA fuses across op boundaries; isolated op
timings mislead — round-4/5 lesson).  Some ablations change the math
and exist ONLY to attribute time:

  baseline     the headline config (exact): cache indirection ON
               (ancestor-index kv reads, no physical reorder),
               chunked prefix, decode_unroll=4
  reorder      cache_indirection=False (EXACT alternative): the
               physical per-step cache reorder the indirection
               replaces — the difference is the realized win
  plain        prefix_decode_chunk=0 (full-length cache every step)
  no_unroll    decode_unroll=1: isolates the while-loop iteration
               overhead the unrolling amortizes
  greedy       top_k=1 sampling, no beam: removes the beam*vocab
               top-k, the beam gathers and the 4x batch widening —
               upper bound on total beam machinery (also 4x less
               decoder compute: rows 16 vs 64)
  no_vocabproj output_logits patched to zero-pad the decoder output to
               vocab size (INEXACT): isolates the [d, V] projection +
               the [rows, V] softmax/top-k width
  encode_only  encoder + cache init only (the bench split)

Writes tools/PROFILE_decode_step.json — the step-loop evidence
artifact for the decode perf target (VERDICT r4 #6).  Reference for
what this loop stands for: the reference's entire generation hot path,
/root/reference/neurst/layers/search/beam_search.py:374-424.

Usage: python tools/profile_decode_step.py [out_json]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, FRAMES, MAX_DECODE, BEAM, CHUNK = 16, 1024, 64, 4, 16


def _median(fn, fetch, warmup=1, iters=5, chain=6):
    for _ in range(warmup):
        fetch(fn())
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn()
        fetch(out)
        times.append((time.perf_counter() - start) / chain)
    return sorted(times)[len(times) // 2]


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tools", "PROFILE_decode_step.json")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".xla_cache"))
    import jax
    import jax.numpy as jnp
    from functools import partial

    from __graft_entry__ import _build_model
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.utils.param_policy import cast_params_for_inference

    model, trg_meta = _build_model(tiny=False)
    params = cast_params_for_inference(
        model.init_params(jax.random.PRNGKey(0)), "bfloat16")
    rng = np.random.RandomState(0)
    inputs = {
        "src": jax.device_put(
            rng.randn(BATCH, FRAMES, 80, 1).astype(np.float32)),
        "src_length": jax.device_put(np.full([BATCH], FRAMES, np.int32)),
        "trg_input": jax.device_put(
            np.full([BATCH], trg_meta["bos_id"], np.int32)),
    }

    def beam_decode_fn(chunk, unroll=4, indirection=True):
        @partial(jax.jit, static_argnums=(2, 3, 4))
        def decode(params, inputs, c, u, ind):
            s2l, init = model.prepare_generation(
                params, inputs, decode_padded_length=MAX_DECODE)
            return sequence_beam_search(
                s2l, init, beam_size=BEAM, top_k=1,
                maximum_decode_length=MAX_DECODE,
                extra_decode_length=MAX_DECODE,
                minimum_decode_length=MAX_DECODE - 1,
                prefix_decode_chunk=c, decode_unroll=u,
                cache_indirection=ind)
        return lambda: decode(params, inputs, chunk, unroll, indirection)

    @jax.jit
    def greedy(params, inputs):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=MAX_DECODE)
        return sequence_sampling(
            s2l, init, jax.random.PRNGKey(0), top_k=1,
            maximum_decode_length=MAX_DECODE,
            extra_decode_length=MAX_DECODE,
            minimum_decode_length=MAX_DECODE - 1,
            prefix_decode_chunk=CHUNK)

    @jax.jit
    def encode_only(params, inputs):
        # reduce to ONE scalar on device: fetching a cache leaf over
        # the tunnel (~32 MB/s) would swamp the measurement — the
        # first run of this tool reported encode_ms 22.3 where the
        # scalarized truth is ~4.3
        _, init = model.prepare_generation(
            params, inputs, decode_padded_length=MAX_DECODE)
        leaves = jax.tree_util.tree_leaves(init["decoder_internal_cache"])
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    fetch0 = lambda o: np.asarray(o[0])  # noqa: E731
    fetch_scalar = lambda o: float(o)  # noqa: E731

    prof = {"config": {"batch": BATCH, "frames": FRAMES,
                       "max_decode": MAX_DECODE, "beam": BEAM,
                       "chunk": CHUNK},
            "device": str(jax.devices()[0])}

    base_s = _median(beam_decode_fn(CHUNK), fetch0)
    prof["baseline_ms"] = round(base_s * 1000, 2)
    prof["baseline_utt_s"] = round(BATCH / base_s, 1)
    prof["reorder_ms"] = round(_median(
        beam_decode_fn(CHUNK, indirection=False), fetch0) * 1000, 2)
    prof["plain_ms"] = round(_median(beam_decode_fn(0), fetch0) * 1000, 2)
    prof["no_unroll_ms"] = round(_median(
        beam_decode_fn(CHUNK, unroll=1), fetch0) * 1000, 2)
    prof["greedy_ms"] = round(_median(
        lambda: greedy(params, inputs), fetch0) * 1000, 2)
    enc_s = _median(lambda: encode_only(params, inputs), fetch_scalar)
    prof["encode_ms"] = round(enc_s * 1000, 2)
    prof["step_loop_ms"] = round((base_s - enc_s) * 1000, 2)

    mod_cls = type(model.module)
    orig_logits = mod_cls.output_logits
    vocab = trg_meta["vocab_size"]

    def pad_logits(self, dec_out):
        return jnp.pad(dec_out.astype(jnp.float32),
                       [(0, 0)] * (dec_out.ndim - 1)
                       + [(0, vocab - dec_out.shape[-1])])

    mod_cls.output_logits = pad_logits
    try:
        prof["no_vocabproj_ms"] = round(
            _median(beam_decode_fn(CHUNK), fetch0) * 1000, 2)
    finally:
        mod_cls.output_logits = orig_logits

    prof["attribution_ms"] = {
        "beam_machinery_and_width_vs_greedy": round(
            prof["baseline_ms"] - prof["greedy_ms"], 2),
        "indirection_saving_vs_reorder": round(
            prof["reorder_ms"] - prof["baseline_ms"], 2),
        "unroll_saving": round(
            prof["no_unroll_ms"] - prof["baseline_ms"], 2),
        "vocab_projection_and_softmax_width": round(
            prof["baseline_ms"] - prof["no_vocabproj_ms"], 2),
        "chunking_saving_vs_plain": round(
            prof["plain_ms"] - prof["baseline_ms"], 2),
    }
    with open(out_json, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main()
