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
"""Per-component profile of the transformer_base training step.

Measures the headline bench config ([256, 128], vocab 32k, bf16
compute + bf16 params with f32 master) under controlled ablations so
each subsystem's cost is attributable from DIFFERENCES of end-to-end
steps (XLA fuses across op boundaries, so isolated op timings mislead):

  baseline        dense attention, fused dropout, fused proj+CE
                  (the default train configuration)
  xla_ce          NEURST_FUSED_CE=0: XLA logits + CE (the pre-r4 path)
  flash           Pallas flash attention enc+dec (in-kernel dropout)
  no_attn_drop    attention_dropout_rate = 0 (isolates attn-prob drop)
  no_dropout      every dropout rate 0 (PRNG+mask upper bound)
  no_ce           criterion replaced by logits.mean() (projection+CE
                  region cost, unfused by construction)

Writes tools/PROFILE_train_step.json (committed as the evidence
artifact for the MFU target — VERDICT r3 #2) and prints one row per
variant: step ms, tokens/s, MFU, and XLA cost-model flops/bytes.

Usage: python tools/profile_train_step.py [out_json]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, LEN, VOCAB = 256, 128, 32768
V5E_BF16_PEAK_FLOPS = 197e12


def build_step(jax, flash=False, attn_dropout=True, dropout=True,
               ce=True):
    from neurst_tpu.criterions.label_smoothed_cross_entropy import \
        LabelSmoothedCrossEntropy
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.optimizers.master_weights import (cast_params_bf16,
                                                      with_bf16_params)
    from neurst_tpu.optimizers.optimizers import Adam, create_optax_chain
    from neurst_tpu.optimizers.schedules.lr_schedules import NoamSchedule
    from neurst_tpu.parallel import TrainState, make_train_step

    meta = {"vocab_size": VOCAB, "eos_id": 1, "bos_id": 2, "unk_id": 3}
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_base")["model.params"])
    cfg["dtype"] = "bfloat16"
    if flash:
        cfg["encoder.enable_flash_attention"] = True
        cfg["decoder.enable_flash_attention"] = True
    if not attn_dropout:
        cfg["encoder.attention_dropout_rate"] = 0.0
        cfg["decoder.attention_dropout_rate"] = 0.0
    if not dropout:
        for side in ("encoder", "decoder"):
            for k in ("attention_dropout_rate", "ffn_dropout_rate",
                      "layer_postprocess_dropout_rate"):
                cfg[f"{side}.{k}"] = 0.0
    model = build_model({"model.class": "transformer",
                         "model.params": cfg},
                        src_meta=meta, trg_meta=meta)
    params = model.init_params(jax.random.PRNGKey(0))

    if ce:
        criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
    else:
        class _MeanLogits(LabelSmoothedCrossEntropy):
            supports_prelogits = False  # reads raw logits below

            def reduce_loss(self, model_inp, model_out):
                import jax.numpy as jnp
                logits = model_out["logits"] if isinstance(
                    model_out, dict) else model_out
                return jnp.mean(logits.astype(jnp.float32))
        criterion = _MeanLogits({"label_smoothing": 0.1})
    lr = NoamSchedule({"dmodel": 512, "warmup_steps": 4000,
                       "initial_factor": 1.0})
    tx = create_optax_chain(Adam({"epsilon": 1e-9, "beta_1": 0.9,
                                  "beta_2": 0.98}), lr, clip_norm=1.0)
    tx = with_bf16_params(tx)
    params = cast_params_bf16(params)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_train_step(model, criterion, tx),
                      donate_argnums=(0,))
    return step_fn, state


def measure(jax, step_fn, state, batch, key, iters=6, chain=4):
    holder = {"state": state}

    def one():
        for _ in range(chain):
            new_state, metrics = step_fn(holder["state"], batch, key)
            holder["state"] = new_state
        return metrics

    m = one()
    float(m["loss"])  # sync (block_until_ready lies on this backend)
    times = []
    for _ in range(iters):
        t0 = time.time()
        m = one()
        float(m["loss"])
        times.append((time.time() - t0) / chain)
    return float(np.median(times))


def train_flops(tokens):
    # same model as bench.py: reuse its analytic count for comparability
    import bench
    return bench._train_flops(tokens, tokens)


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tools", "PROFILE_train_step.json")
    os.chdir(REPO)
    import bench
    bench._setup_compilation_cache()
    import jax

    rng = np.random.RandomState(0)
    b, L = BATCH, LEN
    batch = {
        "src": rng.randint(4, VOCAB, size=[b, L]).astype(np.int32),
        "src_padding": np.zeros([b, L], np.float32),
        "trg_input": rng.randint(4, VOCAB, size=[b, L]).astype(np.int32),
        "trg": rng.randint(4, VOCAB, size=[b, L]).astype(np.int32),
        "trg_padding": np.zeros([b, L], np.float32),
        "trg_length": np.full([b], L, np.int32),
        "sample_mask": np.ones([b], np.float32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    flops = train_flops(b * L)

    variants = [
        ("baseline", {}),
        ("xla_ce", {"_env": ("NEURST_FUSED_CE", "0")}),
        ("flash", {"flash": True}),
        ("no_attn_drop", {"attn_dropout": False}),
        ("no_dropout", {"dropout": False}),
        ("no_ce", {"ce": False}),
    ]
    results = {}
    for name, kw in variants:
        env = kw.pop("_env", None)
        if env:
            env, env_val = env
            os.environ[env] = env_val
        step_fn = state = None
        try:
            step_fn, state = build_step(jax, **kw)
            step_s = measure(jax, step_fn, state, batch, key)
            row = {
                "step_ms": round(step_s * 1000, 1),
                "tokens_per_sec": round(b * L / step_s),
                "mfu": round(flops / step_s / V5E_BF16_PEAK_FLOPS, 3),
            }
            print(f"{name:16s} {row['step_ms']:8.1f} ms  "
                  f"{row['tokens_per_sec']:8d} tok/s  "
                  f"mfu {row['mfu']:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001 — profile what survives
            row = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name:16s} ERROR {row['error'][:120]}", flush=True)
        finally:
            if env:
                os.environ.pop(env, None)
        results[name] = row
        del step_fn, state

    def delta(a, b_):
        if "step_ms" in results.get(a, {}) and \
                "step_ms" in results.get(b_, {}):
            return round(results[a]["step_ms"] - results[b_]["step_ms"], 1)
        return None

    attribution = {
        "attention_dense_minus_flash_ms": delta("baseline", "flash"),
        "fused_ce_win_ms": delta("xla_ce", "baseline"),
        "fused_ce_region_ms": delta("baseline", "no_ce"),
        "attn_prob_dropout_ms": delta("baseline", "no_attn_drop"),
        "all_dropout_ms": delta("baseline", "no_dropout"),
    }
    out = {
        "config": {"model": "transformer_base", "batch": [b, L],
                   "vocab": VOCAB, "dtype": "bfloat16",
                   "bf16_params": True,
                   "peak_flops": V5E_BF16_PEAK_FLOPS,
                   "analytic_flops_per_step": flops},
        "backend": f"{jax.default_backend()}:"
                   f"{jax.devices()[0].device_kind}",
        "variants": results,
        "attribution_ms": attribution,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(attribution))


if __name__ == "__main__":
    main()
