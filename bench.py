"""Benchmark: ST beam-search decode throughput + MT train throughput/MFU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric (BASELINE.json): SpeechTransformer-s (12-layer encoder,
d=256) beam-4 decode over ~10-second utterances (1024 fbank frames),
utterances/sec/chip.  The reference publishes no throughput numbers
(BASELINE.md "Speed"), so ``vs_baseline`` is the ratio against the
north-star target = 5x the single-CPU-core decode throughput for this
exact workload (CPU_BASELINE_UTT_PER_SEC, measured on this host).

``extra`` additionally captures a transformer_base training step
(WMT-style MT, vocab 32k, bf16): target tokens/s/chip and model FLOPs
utilization against the v5e bf16 peak (197 TFLOP/s).  The headline
train config is bf16 params with an f32 master in the optimizer (the
trainer default; checkpoints stay f32); the plain f32-param policy is
reported as a gated extra A/B, alongside serving-dtype A/Bs,
speculative decoding economics, long-audio flash, MoE routing overhead
and scan-layers compile time.

Round-4 component profile (measured on v5e, [256,128]; ablations in
tools/PROFILE_train_step.json): per-kernel xprof traces decomposed the
r3 step (185.6 ms driver-captured, MFU 0.34) into an XLA CE region of
~37 ms (a 4 GB f32 logits tensor written twice, read four times), an
FFN region of ~38.5 ms against a ~29 ms MXU floor, an attention
region of ~42.5 ms (HBM-bound on [B,N,T,T] materializations and AT its
traffic floor: XLA's dense path beats both our flash-v2 kernels and a
batched single-block Pallas kernel at T=128 — flash pays off from
T ~ 1k), and f32 softmax residuals beyond that.  Round 4 fused the
vocab projection into the CE loss (ops/fused_ce.fused_linear_xent;
backward measured at 96%% of MXU peak), fused the whole FFN block into
one Pallas kernel pair (ops/fused_ffn.py; the post-dropout hidden is
the only residual), and made the attention softmax save bf16-rounded
probabilities instead of f32 — step 185.6 -> ~152 ms (~215k trg-tok/s,
MFU ~0.41), all on by default.  Still true from r3: rematerialization
LOSES at this shape (228.7/233.3 vs 176.6 ms), and threefry dropout
cost 114 ms before the hardware-PRNG kernels.

Decode shape note (measured on v5e, speech_transformer_s beam-4,
1024 frames): full-decode time is ~linear in batch*beam rows
(32.3/143.2/285.5 ms at batch 16/64/128, md=64, with beam-shared
cross-attention K/V), i.e. throughput-bound in the step body (cache
traffic + many small sequential ops), NOT launch-latency-bound, so
utt/s is flat in batch and batch 16 is kept for the headline.
Per-step cost also grows with decode_padded_length (batch 128:
3.4 ms/step at md=32 vs 4.5 at md=64 — the static cache is length
md): recipes should set realistic max lengths.  Beam-shared K/V
(memory cache untiled, grouped einsum) bought 11-15%% across shapes.
"""

import glob
import hashlib
import inspect
import json
import os
import time

import numpy as np

# Wall-clock budget: the headline decode + train/MFU numbers always
# run; the optional extras (dtype A/B, long-audio, speculative, MoE,
# compile-time) each check the remaining budget first and are reported
# as "skipped (deadline)" when it runs out — ONE honest JSON line
# either way.  This file enables the framework's persistent XLA
# compilation cache (same machinery as --compilation_cache_dir,
# cli/run_exp.py) in `.xla_cache/` next to this file; the repo ships
# that directory pre-warmed.  Measured cost structure on the axon
# tunnel (see the jitted model.init_params): a warm-cached program
# still pays ~10-25 s of EXECUTABLE LOAD on first run, so the ~18
# distinct programs below cost ~550 s in loads alone — the budget is
# sized for loads, not compiles (the round-3 driver tolerated an
# 846 s run).  On a cold machine the gates degrade to "skipped".
BENCH_DEADLINE_S = float(os.environ.get("NEURST_BENCH_DEADLINE", 720))
_START = time.time()


def _setup_compilation_cache():
    import jax
    cache_dir = os.environ.get(
        "NEURST_BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".xla_cache"))
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        try:
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:  # noqa: BLE001 — older jax: flag absent
            pass


def _remaining():
    return BENCH_DEADLINE_S - (time.time() - _START)


# ---------------- persistent extras cache (sidecar) ------------------
#
# Round-3/4 verdicts: gated extras repeatedly starved under the
# deadline ("skipped (deadline)" three rounds running).  The
# architectural fix: every successful extra measurement is persisted to
# BENCH_EXTRAS_CACHE.json keyed by a hash of (the extra's own source +
# a digest of the whole neurst_tpu package + this file's constants), so
# repeated invocations ACCUMULATE coverage instead of re-paying
# executable loads.  A cache hit is only taken when the code that
# produced it is byte-identical to the code running now; any source
# change anywhere in the package invalidates everything.  Cached
# dict results are annotated {"cached": true} for provenance.  The
# headline decode + train numbers are ALWAYS measured live.
_CACHE_PATH = os.environ.get(
    "NEURST_BENCH_EXTRAS_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_EXTRAS_CACHE.json"))
_SHAPE_CONSTS = None  # filled in main() once constants are final


def _package_digest():
    h = hashlib.sha256()
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "neurst_tpu")
    for path in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                 recursive=True)):
        h.update(path.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    h.update(repr(_SHAPE_CONSTS).encode())
    return h.hexdigest()


def _load_extras_cache():
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _extra_key(name, fn):
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    return name + ":" + hashlib.sha256(
        (src + _package_digest()).encode()).hexdigest()[:16]

# Measured once with the JAX CPU backend on this host (1 vCPU), same
# model/beam settings (batch 4): ~0.99 utt/s.  North-star (BASELINE.json)
# = 5x CPU = ~4.97 utt/s; vs_baseline is measured against that target.
CPU_BASELINE_UTT_PER_SEC = 0.99
TARGET = 5.0 * CPU_BASELINE_UTT_PER_SEC

BATCH = 16
FRAMES = 1024        # ~10.2 s of audio at 100 fps
MAX_DECODE = 64
BEAM = 4
WARMUP = 2
ITERS = 10

# train-side config (transformer_base per the WMT14 recipe)
TRAIN_BATCH = 256
TRAIN_LEN = 128
TRAIN_VOCAB = 32768
V5E_BF16_PEAK_FLOPS = 197e12

# long-audio encoder comparison (SpeechTransformer-s encoder after 4x
# conv subsampling; seq 2048 is ~80s of audio) — evidence for the
# Pallas flash-attention payoff regime
LONG_FRAMES = 8192
LONG_BATCH = 4


def _median_time(fn, fetch, warmup, iters, chain):
    """Median per-call seconds.  NOTE: jax.block_until_ready does NOT
    truly synchronize on the axon remote backend; fetching a value
    does.  The tunnel adds ~26 ms per fetch, so each measurement chains
    `chain` dispatches (the device serializes them) and fetches once —
    pipelined throughput, as in production serving."""
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


def bench_decode(jax):
    from functools import partial

    from __graft_entry__ import _build_model
    from neurst_tpu.layers.search.beam_search import sequence_beam_search

    model, trg_meta = _build_model(tiny=False)
    params = model.init_params(jax.random.PRNGKey(0))
    # bf16-at-rest weights (utils/param_policy): bitwise-identical
    # outputs (use sites cast to bf16 anyway), half the weight reads
    from neurst_tpu.utils.param_policy import cast_params_for_inference
    params = cast_params_for_inference(params, "bfloat16")

    rng = np.random.RandomState(0)
    # device-resident inputs: the metric is chip decode throughput; in
    # production the input pipeline overlaps host->device transfers
    # (and this host reaches the chip over a slow tunnel).
    inputs = {
        "src": jax.device_put(
            rng.randn(BATCH, FRAMES, 80, 1).astype(np.float32)),
        "src_length": jax.device_put(np.full([BATCH], FRAMES, np.int32)),
        "trg_input": jax.device_put(
            np.full([BATCH], trg_meta["bos_id"], np.int32)),
    }

    @partial(jax.jit, static_argnums=(2, 3))
    def decode(params, inputs, prefix_chunk, unroll):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=MAX_DECODE)
        return sequence_beam_search(
            s2l, init, beam_size=BEAM, top_k=1,
            maximum_decode_length=MAX_DECODE,
            extra_decode_length=MAX_DECODE,
            minimum_decode_length=MAX_DECODE - 1,  # force full-length decode
            prefix_decode_chunk=prefix_chunk,
            decode_unroll=unroll)

    # ONE headline config: chunked prefix decode (reads ~the valid
    # cache prefix per step; exact), the faster config of the round-3
    # A/B, with the BeamSearch-default decode_unroll=4 (exact; measured
    # round 5 — amortizes the ~110us/iteration while_loop overhead).
    elapsed = _median_time(lambda: decode(params, inputs, 16, 4),
                           lambda out: np.asarray(out[0]),
                           WARMUP, ITERS, chain=8)
    utt_per_sec = BATCH / elapsed
    audio_secs = FRAMES / 100.0
    rtf = 1.0 / (utt_per_sec * audio_secs)  # real-time factor (lower=better)

    # encode vs step-loop split (round-4 lesson: the 23% decode
    # regression took a round to localize because only the end-to-end
    # number was recorded).  The encoder program returns the FULL
    # generation cache (so nothing is DCE'd) and is timed separately;
    # step-loop time is the remainder.
    @jax.jit
    def encode_only(params, inputs):
        # returns ONE on-device scalar over the full generation cache:
        # nothing is DCE'd, and the fetch moves 4 bytes — fetching a
        # cache leaf over the ~32 MB/s tunnel inflated this number ~5x
        # (round-5 profile: leaf-fetch said 22.3 ms, scalarized 4.3)
        import jax.numpy as jnp
        _, init = model.prepare_generation(
            params, inputs, decode_padded_length=MAX_DECODE)
        leaves = jax.tree_util.tree_leaves(init["decoder_internal_cache"])
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    enc_s = _median_time(lambda: encode_only(params, inputs),
                         lambda o: float(o), warmup=1, iters=5, chain=8)
    split = {"encode_ms": round(enc_s * 1000, 2),
             "step_loop_ms": round((elapsed - enc_s) * 1000, 2)}

    def plain_extra(jax_mod):
        el = _median_time(lambda: decode(params, inputs, 0, 4),
                          lambda out: np.asarray(out[0]),
                          warmup=1, iters=5, chain=8)
        return {"plain_utt_s": round(BATCH / el, 1),
                "chunked_utt_s": round(utt_per_sec, 1)}

    return utt_per_sec, rtf, split, plain_extra


def bench_decode_dtype(jax):
    """On-chip A/B of the int8 serving levers at the headline decode
    shape (chunked prefix, beam 4): int8 weight-only (quarter the
    weight reads of f32-at-rest, half of the bf16-at-rest headline) vs
    full-int8 (int8 x int8 -> int32 matmuls, dynamic per-token
    activation scales) vs full-int8 with STATIC activation scales
    (PTQ-calibrated on one teacher-forced batch; no per-token absmax
    reduction in the decode step).  Full-decode milliseconds per
    config; correctness is pinned by tests/layers/test_int8_serving.py
    (f32-at-rest was A/B'd in round 3: 610.6 utt/s plain — bf16-at-rest
    is bitwise-equal, so only its speed differs)."""
    from functools import partial

    from __graft_entry__ import _build_model
    from neurst_tpu.layers.quantization.quant_layers import (
        calibrate_int8_act_scales, set_int8_serving)
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.utils.checkpoints import flatten_params
    from neurst_tpu.utils.param_policy import restore_inference_params

    base_model, trg_meta = _build_model(tiny=False)
    f32_params = base_model.init_params(jax.random.PRNGKey(0))
    flat = flatten_params(f32_params)
    rng = np.random.RandomState(0)
    inputs = {
        "src": jax.device_put(
            rng.randn(BATCH, FRAMES, 80, 1).astype(np.float32)),
        "src_length": jax.device_put(np.full([BATCH], FRAMES, np.int32)),
        "trg_input": jax.device_put(
            np.full([BATCH], trg_meta["bos_id"], np.int32)),
    }
    times = {}
    for label, act, static in (("int8_ms", False, False),
                               ("int8_act_ms", True, False),
                               ("int8_act_static_ms", True, True)):
        set_int8_serving(True, activations=act,
                         static_activation_scales=static)
        try:
            model, _ = _build_model(tiny=False)
            params = model.init_params(jax.random.PRNGKey(0))
            params, _ = restore_inference_params(model, params, flat)
            if static:
                cal_batch = dict(inputs)
                cal_batch["trg_input"] = jax.device_put(np.full(
                    [BATCH, 8], trg_meta["bos_id"], np.int32))
                params = calibrate_int8_act_scales(model, params,
                                                   [cal_batch])

            @partial(jax.jit, static_argnums=())
            def decode(params, inputs, m=model):
                s2l, init = m.prepare_generation(
                    params, inputs, decode_padded_length=MAX_DECODE)
                return sequence_beam_search(
                    s2l, init, beam_size=BEAM, top_k=1,
                    maximum_decode_length=MAX_DECODE,
                    extra_decode_length=MAX_DECODE,
                    minimum_decode_length=MAX_DECODE - 1,
                    prefix_decode_chunk=16)

            elapsed = _median_time(lambda: decode(params, inputs),
                                   lambda out: np.asarray(out[0]),
                                   warmup=1, iters=3, chain=4)
            times[label] = round(elapsed * 1000, 1)
        finally:
            set_int8_serving(False)
    return times


def bench_int8_latency(jax):
    """int8 serving in the regime it exists for: BATCH-1 LATENCY on a
    weight-read-bound model (transformer_base, d=512, 32k vocab — each
    greedy step at batch 1 reads ~39M decoder+softmax params for one
    row of compute).  The batched speech headline (bench_decode_dtype)
    is NOT weight-bound at d=256/batch16 — int8 cannot win there; this
    is the honest A/B at the shape where quarter-the-weight-reads can.
    Note XLA hoists the weight-only path's int8->compute-dtype convert
    out of the decode while_loop (the loop then reads converted weights
    — no in-loop HBM saving), so the full-int8 configs (int8 x int8 ->
    int32 on the MXU's double-rate path, weights consumed as int8
    in-loop) are where the savings are physically possible."""
    from functools import partial

    from neurst_tpu.layers.quantization.quant_layers import (
        calibrate_int8_act_scales, set_int8_serving)
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.utils.checkpoints import flatten_params
    from neurst_tpu.utils.param_policy import (cast_params_for_inference,
                                               restore_inference_params)

    meta = {"vocab_size": TRAIN_VOCAB, "eos_id": 1, "bos_id": 2,
            "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_base")["model.params"])
    cfg["dtype"] = "bfloat16"
    spec = {"model.class": "transformer", "model.params": cfg}
    base_model = build_model(spec, src_meta=meta, trg_meta=meta)
    flat = flatten_params(base_model.init_params(jax.random.PRNGKey(0)))

    src_len, md = 32, 64
    rng = np.random.RandomState(7)
    src = rng.randint(4, TRAIN_VOCAB, size=[1, src_len]).astype(np.int32)
    inputs = {"src": jax.device_put(src),
              "src_padding": jax.device_put(
                  np.zeros([1, src_len], np.float32))}

    def greedy_ms(model, params):
        @partial(jax.jit, static_argnums=())
        def decode(params, inputs, m=model):
            s2l, init = m.prepare_generation(
                params, inputs, decode_padded_length=md)
            return sequence_sampling(
                s2l, init, jax.random.PRNGKey(0), top_k=1,
                maximum_decode_length=md, extra_decode_length=md,
                minimum_decode_length=md - 1)

        el = _median_time(lambda: decode(params, inputs),
                          lambda out: np.asarray(out[0]),
                          warmup=1, iters=3, chain=4)
        return round(el * 1000, 2)

    out = {"batch": 1, "max_decode": md, "model": "transformer_base"}
    params = jax.tree_util.tree_map(jax.device_put,
                                    base_model.init_params(
                                        jax.random.PRNGKey(0)))
    out["bf16_ms"] = greedy_ms(
        base_model, cast_params_for_inference(params, "bfloat16"))
    for label, act, static in (("int8_weightonly_ms", False, False),
                               ("int8_act_ms", True, False),
                               ("int8_act_static_ms", True, True)):
        set_int8_serving(True, activations=act,
                         static_activation_scales=static)
        try:
            model = build_model(spec, src_meta=meta, trg_meta=meta)
            qparams = model.init_params(jax.random.PRNGKey(0))
            qparams, _ = restore_inference_params(model, qparams, flat)
            if static:
                cal = {"src": inputs["src"],
                       "src_padding": inputs["src_padding"],
                       "trg_input": jax.device_put(
                           np.full([1, 8], meta["bos_id"], np.int32))}
                qparams = calibrate_int8_act_scales(model, qparams, [cal])
            out[label] = greedy_ms(model, qparams)
        finally:
            set_int8_serving(False)
    out["int8_best_speedup_vs_bf16"] = round(
        out["bf16_ms"] / min(out["int8_weightonly_ms"],
                             out["int8_act_ms"],
                             out["int8_act_static_ms"]), 2)
    return out


def _train_flops(n_src_tok, n_trg_tok, dmodel=512, layers=6, ffn=2048,
                 vocab=TRAIN_VOCAB, batch=None, length=None):
    """Analytic transformer_base train FLOPs (fwd + 2x bwd = 3x fwd).
    Validated against XLA cost analysis (within 6%% at [256, 64])."""
    batch = TRAIN_BATCH if batch is None else batch
    length = TRAIN_LEN if length is None else length
    enc_mat = layers * (4 * dmodel * dmodel + 2 * dmodel * ffn)
    dec_mat = layers * (8 * dmodel * dmodel + 2 * dmodel * ffn)
    softmax_mat = dmodel * vocab
    fwd_mat = 2 * (enc_mat * n_src_tok
                   + (dec_mat + softmax_mat) * n_trg_tok)
    # attention scores+context (2 matmuls, 2*T*T*d each per layer)
    att = 4 * dmodel * layers * batch * (
        length * length      # encoder self
        + length * length    # decoder self (full, causal-masked)
        + length * length)   # cross
    return 3 * (fwd_mat + att)


def bench_long_audio(jax):
    """Dense vs Pallas-flash encoder forward on ~80s audio (seq 2048
    after 4x subsampling): the regime where avoiding the [T, T] score
    materialization pays."""
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.speech_transformer import SpeechTransformer

    cfg = SpeechTransformer.build_model_args_by_name("speech_transformer_s")
    trg_meta = {"vocab_size": 8192, "eos_id": 1, "bos_id": 2, "unk_id": 3,
                "pad_id": 1, "language": "fr"}
    src_meta = {"audio_feature_dim": 80, "audio_feature_channels": 1}
    rng = np.random.RandomState(0)
    inputs = {
        "src": jax.device_put(
            rng.randn(LONG_BATCH, LONG_FRAMES, 80, 1).astype(np.float32)),
        "src_length": jax.device_put(
            np.full([LONG_BATCH], LONG_FRAMES, np.int32)),
        "trg_input": jax.device_put(np.ones([LONG_BATCH, 4], np.int32)),
    }
    times = {}
    for key, flash in (("dense_ms", False), ("flash_ms", True)):
        params_cfg = dict(cfg["model.params"])
        params_cfg["dtype"] = "bfloat16"
        params_cfg["encoder.enable_flash_attention"] = flash
        model = build_model(dict(cfg, **{"model.params": params_cfg}),
                            src_meta=src_meta, trg_meta=trg_meta)
        params = model.init_params(jax.random.PRNGKey(0))
        fwd = jax.jit(lambda p, i, m=model: m.call(p, i,
                                                   is_training=False))
        elapsed = _median_time(lambda: fwd(params, inputs),
                               lambda out: np.asarray(out[:1, :1]),
                               warmup=1, iters=3, chain=2)
        times[key] = round(elapsed * 1000, 1)
    return times


def bench_long_audio_train(jax):
    """Dense vs flash TRAINING step (fwd+bwd) on long audio: at seq
    2048 (post-subsampling) the dense path materializes the f32
    [B, N, T, T] scores in forward AND backward; the flash custom-vjp
    recomputes blockwise.  Dropout off (the flash path would skip
    attention-prob dropout anyway)."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.speech_transformer import SpeechTransformer

    cfg = SpeechTransformer.build_model_args_by_name("speech_transformer_s")
    trg_meta = {"vocab_size": 8192, "eos_id": 1, "bos_id": 2, "unk_id": 3,
                "pad_id": 1, "language": "fr"}
    src_meta = {"audio_feature_dim": 80, "audio_feature_channels": 1}
    rng = np.random.RandomState(0)
    trg_len = 32
    batch = {
        "src": jax.device_put(
            rng.randn(LONG_BATCH, LONG_FRAMES, 80, 1).astype(np.float32)),
        "src_length": jax.device_put(
            np.full([LONG_BATCH], LONG_FRAMES, np.int32)),
        "trg_input": jax.device_put(
            rng.randint(4, 8192, size=[LONG_BATCH, trg_len]
                        ).astype(np.int32)),
        "trg": jax.device_put(
            rng.randint(4, 8192, size=[LONG_BATCH, trg_len]
                        ).astype(np.int32)),
        "trg_padding": jax.device_put(
            np.zeros([LONG_BATCH, trg_len], np.float32)),
    }
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    times = {}
    for key, flash in (("dense_ms", False), ("flash_ms", True)):
        params_cfg = dict(cfg["model.params"])
        params_cfg["dtype"] = "bfloat16"
        params_cfg["encoder.enable_flash_attention"] = flash
        for prefix in ("encoder", "decoder"):
            params_cfg[f"{prefix}.attention_dropout_rate"] = 0.0
            params_cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
            params_cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
        model = build_model(dict(cfg, **{"model.params": params_cfg}),
                            src_meta=src_meta, trg_meta=trg_meta)
        params = model.init_params(jax.random.PRNGKey(0))

        def loss_fn(p, m=model):
            import jax as _jax
            logits = m.call(p, batch, is_training=True,
                            rngs={"dropout": _jax.random.PRNGKey(5)})
            return criterion.reduce_loss(batch, logits)

        f = jax.jit(jax.value_and_grad(loss_fn))
        elapsed = _median_time(lambda: f(params),
                               lambda out: float(out[0]),
                               warmup=1, iters=3, chain=2)
        times[key] = round(elapsed * 1000, 1)
    return times


def _spec_vs_plain(jax, model, params, inputs, md, k, vocab,
                   iters=3, chain=4):
    """plain greedy vs ngram-draft speculative k on one (model, batch):
    -> (plain_s, spec_s, commit_rate)."""
    from neurst_tpu.layers.search.sampling import sequence_sampling
    from neurst_tpu.layers.search.speculative import (
        make_ngram_draft, speculative_greedy_decode)
    b = inputs["src"].shape[0]

    @jax.jit
    def plain(params, inputs):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=md)
        return sequence_sampling(
            s2l, init, jax.random.PRNGKey(0), top_k=1,
            maximum_decode_length=md, extra_decode_length=md,
            minimum_decode_length=md - 1)

    @jax.jit
    def spec(params, inputs):
        t_fn, t_init = model.prepare_speculative(
            params, inputs, decode_padded_length=md + k)
        d_fn, d_init = make_ngram_draft(
            b, md + k, vocab, ngram=3, prefix=inputs["src"])
        return speculative_greedy_decode(
            t_fn, t_init, d_fn, d_init, speculative_k=k,
            maximum_decode_length=md, extra_decode_length=md,
            minimum_decode_length=md - 1, return_stats=True)

    plain_s = _median_time(lambda: plain(params, inputs),
                           lambda out: np.asarray(out[0]),
                           warmup=1, iters=iters, chain=chain)
    holder = {}

    def run_spec():
        ids, lp, stats = spec(params, inputs)
        holder["stats"] = stats
        return ids

    spec_s = _median_time(lambda: run_spec(),
                          lambda out: np.asarray(out),
                          warmup=1, iters=iters, chain=chain)
    passes = int(np.asarray(holder["stats"]["target_passes"]))
    emitted = float(np.mean(np.asarray(holder["stats"]["tokens_emitted"])))
    return plain_s, spec_s, emitted / max(passes, 1)


def bench_speculative(jax):
    """On-chip speculative-decoding economics (transformer_base, ngram
    prompt-lookup draft, k=4, forced 64-token outputs) in TWO regimes:
    the round-4 batch-16 throughput shape (kept for continuity — the
    verification machinery there costs more than it saves: speculation
    is NOT a throughput lever at batched MT shapes) and the batch-1
    LATENCY shape speculation exists for, where a plain step is one
    row against ~45M params of weight reads and a k+1-row verify pass
    reads the same weights once.  Weights are untrained, so the commit
    rate reflects random-model greedy repetition; bench_spec_trained
    measures the realized rate on a TRAINED checkpoint."""
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer

    meta = {"vocab_size": TRAIN_VOCAB, "eos_id": 1, "bos_id": 2,
            "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_base")["model.params"])
    cfg["dtype"] = "bfloat16"
    model = build_model(
        {"model.class": "transformer", "model.params": cfg},
        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))

    src_len, md, k = 32, 64, 4
    rng = np.random.RandomState(7)
    out = {"max_decode": md}
    for tag, b in (("b16", 16), ("b1", 1)):
        src = rng.randint(4, TRAIN_VOCAB,
                          size=[b, src_len]).astype(np.int32)
        inputs = {
            "src": jax.device_put(src),
            "src_padding": jax.device_put(
                np.zeros([b, src_len], np.float32)),
        }
        plain_s, spec_s, rate = _spec_vs_plain(
            jax, model, params, inputs, md, k, TRAIN_VOCAB)
        out[tag] = {"plain_greedy_ms": round(plain_s * 1000, 1),
                    "spec_ngram_k4_ms": round(spec_s * 1000, 1),
                    "speedup": round(plain_s / spec_s, 2),
                    "commit_rate_tok_per_pass": round(rate, 2),
                    "batch": b}
    return out


def bench_spec_beam(jax):
    """Speculative BEAM search timing (VERDICT r4 #5: beam had no
    on-chip number): transformer_base at the batch-1 latency shape,
    beam 4, ngram self-draft k=4, forced 64-token outputs — plain
    ``sequence_beam_search`` vs ``speculative_beam_search`` (exact by
    construction; the draft only changes how many target passes run).
    Untrained weights: the commit rate is the random-model ceiling,
    bench_spec_trained gives the realized trained-model rate."""
    from neurst_tpu.layers.search.beam_search import sequence_beam_search
    from neurst_tpu.layers.search.speculative import (
        make_ngram_draft, speculative_beam_search)
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer

    meta = {"vocab_size": TRAIN_VOCAB, "eos_id": 1, "bos_id": 2,
            "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_base")["model.params"])
    cfg["dtype"] = "bfloat16"
    model = build_model(
        {"model.class": "transformer", "model.params": cfg},
        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))

    b, src_len, md, beam, k = 1, 32, 64, 4, 4
    rng = np.random.RandomState(9)
    inputs = {
        "src": jax.device_put(rng.randint(
            4, TRAIN_VOCAB, size=[b, src_len]).astype(np.int32)),
        "src_padding": jax.device_put(np.zeros([b, src_len], np.float32)),
    }

    @jax.jit
    def plain(params, inputs):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=md)
        return sequence_beam_search(
            s2l, init, beam_size=beam, top_k=1,
            maximum_decode_length=md, extra_decode_length=md,
            minimum_decode_length=md - 1)

    @jax.jit
    def spec(params, inputs):
        t_fn, t_init = model.prepare_speculative(
            params, inputs, decode_padded_length=md + k)
        d_fn, d_init = make_ngram_draft(b * beam, md + k, TRAIN_VOCAB,
                                        ngram=3)
        return speculative_beam_search(
            t_fn, t_init, d_fn, d_init, beam_size=beam,
            speculative_k=k, top_k=1, maximum_decode_length=md,
            extra_decode_length=md, minimum_decode_length=md - 1,
            return_stats=True)

    plain_s = _median_time(lambda: plain(params, inputs),
                           lambda out: np.asarray(out[0]),
                           warmup=1, iters=3, chain=4)
    holder = {}

    def run_spec():
        ids, lp, stats = spec(params, inputs)
        holder["stats"] = stats
        return ids

    spec_s = _median_time(run_spec, lambda out: np.asarray(out),
                          warmup=1, iters=3, chain=4)
    passes = int(np.asarray(holder["stats"]["target_passes"]))
    return {"batch": b, "beam": beam, "k": k, "max_decode": md,
            "plain_beam_ms": round(plain_s * 1000, 1),
            "spec_beam_ms": round(spec_s * 1000, 1),
            "speedup": round(plain_s / spec_s, 2),
            "beam_steps_per_pass": round(md / max(passes, 1), 2)}


def bench_spec_trained(jax):
    """Speculative decoding on the committed TRAINED checkpoint
    (tests/fixtures/reference_goldens/corpus_tf_ckpt_wide, the
    reference-TF-trained d=64 model behind the corpus-parity tests),
    decoding its real dev corpus at batch 1: the REALIZED ngram-draft
    commit rate on a trained model + corpus — the acceptance number
    the untrained benches cannot give.  (The d=64 model itself is too
    small for speculation to pay in wall-clock; the commit rate is the
    transferable quantity: wall-clock at serving scale =
    bench_speculative.b1 machinery costs x this rate.)"""
    import json as _json

    from neurst_tpu.models.model import build_model
    from neurst_tpu.utils.checkpoints import unflatten_params
    from neurst_tpu.utils.converters.converter import build_converter

    repo = os.path.dirname(os.path.abspath(__file__))
    fx = os.path.join(repo, "tests", "fixtures", "reference_goldens")
    with open(os.path.join(fx, "corpus_golden_wide.json")) as f:
        golden = _json.load(f)
    conv = build_converter({"converter.class": "neurst_transformer",
                            "converter.params": {
                                "num_heads": golden["num_heads"]}})
    flat = conv.convert_to_flat(os.path.join(fx, "corpus_tf_ckpt_wide"))
    params = unflatten_params(flat)

    from neurst_tpu.data.data_pipelines.text_data_pipeline import \
        TextDataPipeline
    pipeline = TextDataPipeline(vocab_path=os.path.join(
        repo, "tests", "examples", "wide", "vocab.txt"))
    meta = pipeline.meta
    eos = meta["eos_id"]
    mp = dict(golden["model_params"])
    mp["dtype"] = "float32"
    model = build_model({"model.class": "transformer",
                         "model.params": mp},
                        src_meta=meta, trg_meta=meta)

    with open(os.path.join(repo, "tests", "examples", "wide",
                           "dev.src")) as f:
        dev = [line.rstrip("\n") for line in f]
    md, k = 32, 4
    rates, speedups = [], []
    for sent in dev[:4]:
        ids = pipeline.encode(sent, is_processed=True)
        src = np.asarray([ids], np.int32)
        inputs = {"src": jax.device_put(src),
                  "src_padding": jax.device_put(
                      np.zeros_like(src, np.float32))}
        plain_s, spec_s, rate = _spec_vs_plain(
            jax, model, params, inputs, md, k, meta["vocab_size"],
            iters=1, chain=2)
        rates.append(rate)
        speedups.append(plain_s / spec_s)
    return {"commit_rate_tok_per_pass": round(float(np.mean(rates)), 2),
            "d64_wallclock_speedup": round(float(np.mean(speedups)), 2),
            "sentences": len(rates), "batch": 1, "k": k,
            "note": "trained ckpt; rate transfers, d=64 wall-clock "
                    "does not (model too small to be weight-bound)"}


def bench_moe(jax):
    """Dense vs Switch-MoE (8 experts, top-1, every 2nd FFN) training
    tokens/s at MATCHED ACTIVE FLOPs: each token still runs exactly one
    ffn=2048 expert, so the throughput gap is pure routing/dispatch
    machinery cost — the serving question for conditional computation
    (examples/moe/).  Single chip: expert weights are not sharded here;
    the dryrun covers expert-parallel sharding."""
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    meta = {"vocab_size": TRAIN_VOCAB, "eos_id": 1, "bos_id": 2,
            "unk_id": 3}
    b, L = 128, TRAIN_LEN
    rng = np.random.RandomState(0)
    batch = {
        "src": rng.randint(4, TRAIN_VOCAB, size=[b, L]).astype(np.int32),
        "src_padding": np.zeros([b, L], np.float32),
        "trg_input": rng.randint(4, TRAIN_VOCAB,
                                 size=[b, L]).astype(np.int32),
        "trg": rng.randint(4, TRAIN_VOCAB, size=[b, L]).astype(np.int32),
        "trg_padding": np.zeros([b, L], np.float32),
        "trg_length": np.full([b], L, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    out = {"batch": [b, L], "experts": 8}
    for label, moe in (("dense_tok_s", 0), ("moe8_top1_tok_s", 8)):
        cfg = dict(Transformer.build_model_args_by_name(
            "transformer_base")["model.params"])
        cfg["dtype"] = "bfloat16"
        if moe:
            for side in ("encoder", "decoder"):
                cfg[f"{side}.moe_num_experts"] = moe
                cfg[f"{side}.moe_layer_frequency"] = 2
                cfg[f"{side}.moe_top_k"] = 1
        model = build_model(
            {"model.class": "transformer", "model.params": cfg},
            src_meta=meta, trg_meta=meta)
        params = model.init_params(jax.random.PRNGKey(0))
        lr = NoamSchedule({"dmodel": 512, "warmup_steps": 4000,
                           "initial_factor": 1.0})
        tx = create_optax_chain(Adam({"epsilon": 1e-9, "beta_1": 0.9,
                                      "beta_2": 0.98}), lr, clip_norm=1.0)
        state = TrainState.create(params, tx)
        step_fn = jax.jit(make_train_step(model, criterion, tx),
                          donate_argnums=(0,))
        holder = {"state": state}

        def one_step():
            new_state, metrics = step_fn(holder["state"], batch, key)
            holder["state"] = new_state
            return metrics

        elapsed = _median_time(one_step, lambda m: float(m["loss"]),
                               warmup=1, iters=3, chain=4)
        out[label] = round(b * L / elapsed)
    out["routing_overhead_pct"] = round(
        100.0 * (1 - out["moe8_top1_tok_s"] / out["dense_tok_s"]), 1)
    return out


def bench_scan_compile(jax):
    """Wall-clock compile seconds for a deep (12-layer) encoder forward:
    per-layer loop vs encoder.scan_layers (one traced layer).  The
    persistent compilation cache is disabled around the measurement —
    this bench measures COMPILES, a cache hit would measure disk IO."""
    import time as _time

    import jax.numpy as jnp

    from neurst_tpu.layers.encoders.transformer_encoder import \
        TransformerEncoder
    out = {}
    x = jnp.zeros([2, 256, 256], jnp.bfloat16)
    pad = jnp.zeros([2, 256], jnp.float32)
    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        for key, scan in (("loop_s", False), ("scan_s", True)):
            enc = TransformerEncoder(
                num_layers=12, hidden_size=256, num_attention_heads=4,
                filter_size=2048, scan_layers=scan, dtype=jnp.bfloat16)
            params = enc.init({"params": jax.random.PRNGKey(0)}, x, pad)
            fwd = jax.jit(lambda p, a, b: enc.apply(p, a, b))
            start = _time.perf_counter()
            fwd.lower(params, x, pad).compile()
            out[key] = round(_time.perf_counter() - start, 1)
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    return out


def bench_train(jax, bf16_params=False):
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    meta = {"vocab_size": TRAIN_VOCAB, "eos_id": 1, "bos_id": 2,
            "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_base")["model.params"])
    cfg["dtype"] = "bfloat16"
    model = build_model(
        {"model.class": "transformer", "model.params": cfg},
        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))

    criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 512, "warmup_steps": 4000,
                       "initial_factor": 1.0})
    tx = create_optax_chain(Adam({"epsilon": 1e-9, "beta_1": 0.9,
                                  "beta_2": 0.98}), lr, clip_norm=1.0)
    if bf16_params:
        from neurst_tpu.optimizers.master_weights import (
            cast_params_bf16, with_bf16_params)
        tx = with_bf16_params(tx)
        params = cast_params_bf16(params)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_train_step(model, criterion, tx),
                      donate_argnums=(0,))

    b, L = TRAIN_BATCH, TRAIN_LEN
    rng = np.random.RandomState(0)
    batch = {
        "src": rng.randint(4, TRAIN_VOCAB, size=[b, L]).astype(np.int32),
        "src_padding": np.zeros([b, L], np.float32),
        "trg_input": rng.randint(4, TRAIN_VOCAB,
                                 size=[b, L]).astype(np.int32),
        "trg": rng.randint(4, TRAIN_VOCAB, size=[b, L]).astype(np.int32),
        "trg_padding": np.zeros([b, L], np.float32),
        "trg_length": np.full([b], L, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    holder = {"state": state}

    def one_step():
        new_state, metrics = step_fn(holder["state"], batch, key)
        holder["state"] = new_state
        return metrics

    elapsed = _median_time(one_step, lambda m: float(m["loss"]),
                           warmup=2, iters=5, chain=4)
    tokens_per_sec = b * L / elapsed
    mfu = _train_flops(b * L, b * L) / elapsed / V5E_BF16_PEAK_FLOPS
    return tokens_per_sec, elapsed, mfu


def _probe_devices(timeout_s=180):
    """The axon TPU tunnel can hang indefinitely when down; a hung
    bench is worse than a failed one.  Probe jax.devices() in a
    daemon thread and fail fast with an honest JSON error line."""
    import threading
    result = {}

    def probe():
        try:
            import jax
            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in result:
        return
    print(json.dumps({
        "metric": "st_beam4_decode_utterances_per_sec_per_chip",
        "value": None, "unit": "utt/s", "vs_baseline": None,
        "error": result.get(
            "error", f"device init exceeded {timeout_s}s (TPU tunnel "
                     "unreachable); no measurement taken")}))
    raise SystemExit(1)


def main():
    global _SHAPE_CONSTS
    _SHAPE_CONSTS = (BATCH, FRAMES, MAX_DECODE, BEAM, TRAIN_BATCH,
                     TRAIN_LEN, TRAIN_VOCAB, LONG_FRAMES, LONG_BATCH)
    _probe_devices()
    _setup_compilation_cache()
    import jax

    # headline numbers first (always run live, never cached): ONE
    # decode config (chunked prefix) + ONE train config (bf16 params
    # with the f32 master — the trainer default; checkpoints stay f32)
    utt_per_sec, rtf, decode_split, decode_plain_extra = bench_decode(jax)
    train_tok_s, train_step_s, mfu = bench_train(jax, bf16_params=True)

    # ... then budget-gated extras, highest-value first.  Each extra
    # first consults the persistent sidecar (see _extra_key): a cache
    # hit — valid only while the package + extra source are
    # byte-identical to what produced it — is returned annotated
    # {"cached": true}; a miss measures live when budget allows and
    # persists the result, so repeated invocations accumulate coverage
    # and "every extra key numeric" is the steady-state invariant.
    cache = _load_extras_cache()

    def gated(name, need_s, fn):
        key = _extra_key(name, fn)
        hit = cache.get(key)
        if isinstance(hit, dict):
            return dict(hit, cached=True)
        if _remaining() < need_s:
            return f"skipped (deadline: {_remaining():.0f}s left, " \
                   f"needs ~{need_s:.0f}s)"
        try:
            result = fn(jax)
        except Exception as e:  # noqa: BLE001 — keep the JSON line honest
            return f"error: {e!r}"
        if isinstance(result, dict):
            cache[key] = result
            try:
                with open(_CACHE_PATH, "w") as f:
                    json.dump(cache, f, indent=1, sort_keys=True)
            except OSError:
                pass
        return result

    # "needs" below are calibrated warm-cache costs: ~10-25 s program
    # load per distinct program + measurement time (see budget note).
    decode_dtype = gated("decode_dtype", 115, bench_decode_dtype)
    int8_latency = gated("int8_latency", 120, bench_int8_latency)
    speculative = gated("speculative", 110, bench_speculative)
    spec_beam = gated("spec_beam", 80, bench_spec_beam)
    spec_trained = gated("spec_trained", 60, bench_spec_trained)

    def f32_extra(jax_mod):
        tok_s, step_s, f32_mfu = bench_train(jax_mod, bf16_params=False)
        return {"tokens_per_sec": round(tok_s),
                "step_ms": round(step_s * 1000, 1),
                "mfu": round(f32_mfu, 3)}

    moe = gated("moe", 75, bench_moe)
    train_f32 = gated("train_f32", 40, f32_extra)
    long_train = gated("long_audio_train", 60, bench_long_audio_train)
    long_audio = gated("long_audio_encode", 55, bench_long_audio)
    decode_plain = gated("decode_chunking", 30, decode_plain_extra)
    scan_compile = gated("scan_compile", 50, bench_scan_compile)
    print(json.dumps({
        "metric": "st_beam4_decode_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / TARGET, 3),
        "extra": {"rtf": round(rtf, 5), "batch": BATCH, "frames": FRAMES,
                  "max_decode": MAX_DECODE, "beam": BEAM,
                  "decode_split_ms": decode_split,
                  "decode_dtype_ms": decode_dtype,
                  "int8_latency_b1": int8_latency,
                  "train_model": "transformer_base_bf16",
                  "train_trg_tokens_per_sec_per_chip": round(train_tok_s),
                  "train_step_ms": round(train_step_s * 1000, 1),
                  "train_batch": [TRAIN_BATCH, TRAIN_LEN],
                  "mfu": round(mfu, 3),
                  "train_f32_params": train_f32,
                  "long_audio_encode": dict(
                      long_audio, batch=LONG_BATCH, frames=LONG_FRAMES)
                  if isinstance(long_audio, dict) else long_audio,
                  "long_audio_train": dict(
                      long_train, batch=LONG_BATCH, frames=LONG_FRAMES)
                  if isinstance(long_train, dict) else long_train,
                  "speculative_decode": speculative,
                  "speculative_beam": spec_beam,
                  "speculative_trained": spec_trained,
                  "moe_train": moe,
                  "decode_chunking": decode_plain,
                  "scan_layers_compile": scan_compile},
    }))


if __name__ == "__main__":
    main()
