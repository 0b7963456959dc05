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
utilization against the v5e bf16 peak (197 TFLOP/s).  Shape notes
(measured): decode throughput is latency-bound in the sequential decode
loop (flat from batch 16 to 128 — 504/502/465/419 utt/s), so batch 16
is kept; the train step is HBM-bound (XLA cost analysis: 6.5e12 flops
but 9.0e10 bytes/step ≈ 110 ms of the measured step at v5e bandwidth),
so longer sequences amortize better: 256x64 / 128x128 / 256x128 give
109/127/130k tok/s with the fused CE (which stopped materializing the
f32 [B,T,V] log-probs; +6.5%% at 256x64).  [256, 128] is kept.  The
analytic FLOPs formula is validated against XLA's own cost analysis
(6.1e12 vs 6.5e12 at 256x64).
"""

import json
import time

import numpy as np

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
    from __graft_entry__ import _build_model
    from neurst_tpu.layers.search.beam_search import sequence_beam_search

    model, trg_meta = _build_model(tiny=False)
    params = model.init_params(jax.random.PRNGKey(0))

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

    @jax.jit
    def decode(params, inputs):
        s2l, init = model.prepare_generation(
            params, inputs, decode_padded_length=MAX_DECODE)
        return sequence_beam_search(
            s2l, init, beam_size=BEAM, top_k=1,
            maximum_decode_length=MAX_DECODE,
            extra_decode_length=MAX_DECODE,
            minimum_decode_length=MAX_DECODE - 1)  # force full-length decode

    elapsed = _median_time(lambda: decode(params, inputs),
                           lambda out: np.asarray(out[0]),
                           WARMUP, ITERS, chain=8)
    utt_per_sec = BATCH / elapsed
    audio_secs = BATCH * (FRAMES / 100.0)
    rtf = (elapsed / audio_secs)  # real-time factor (lower is better)
    return utt_per_sec, rtf


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


def bench_train(jax):
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


def main():
    import jax

    utt_per_sec, rtf = bench_decode(jax)
    train_tok_s, train_step_s, mfu = bench_train(jax)
    long_audio = bench_long_audio(jax)
    print(json.dumps({
        "metric": "st_beam4_decode_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / TARGET, 3),
        "extra": {"rtf": round(rtf, 5), "batch": BATCH, "frames": FRAMES,
                  "max_decode": MAX_DECODE, "beam": BEAM,
                  "train_model": "transformer_base_bf16",
                  "train_trg_tokens_per_sec_per_chip": round(train_tok_s),
                  "train_step_ms": round(train_step_s * 1000, 1),
                  "train_batch": [TRAIN_BATCH, TRAIN_LEN],
                  "mfu": round(mfu, 3),
                  "long_audio_encode": dict(
                      long_audio, batch=LONG_BATCH, frames=LONG_FRAMES)},
    }))


if __name__ == "__main__":
    main()
