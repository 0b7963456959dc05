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
"""Isolates the attention-probability dropout cost on the chip.

The train-step profile (tools/PROFILE_train_step.json) attributes
~25 ms of the transformer_base [256,128] step to attention-prob
dropout even though the mask comes from the Pallas hardware-PRNG
kernel.  Pure bandwidth says it should be ~6 ms (36 kernel calls x
134 MB r+w at ~800 GB/s), so something else dominates: either the
kernel underruns HBM bandwidth at the [B*N*F, T=128] shape (narrow
rows), or the custom-call boundary between softmax and the PV matmul
breaks an XLA fusion that otherwise avoids materializations.

This tool measures, per candidate shape, on-chip:
  1. the isolated fused_dropout fwd and fwd+bwd time and effective
     GB/s,
  2. an attention block (softmax -> dropout -> PV matmul) fwd+bwd
     with dropout OFF / fused_dropout / stock bernoulli,
so the fix (kernel tuning vs fusion-friendly integration) follows
from data, not guesswork.
"""

import json
import time

import numpy as np


def _med(fn, fetch, iters=6, chain=4):
    fetch(fn())
    fetch(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn()
        fetch(out)
        times.append((time.perf_counter() - t0) / chain)
    return sorted(times)[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from neurst_tpu.ops.fused_dropout import fused_dropout

    out = {"backend": f"{jax.default_backend()}:"
                      f"{jax.devices()[0].device_kind}"}
    key = jax.random.PRNGKey(0)

    # ---- 1. isolated kernel at attention-prob and ffn shapes ---- #
    shapes = {
        "attn_probs_bf16": ((256 * 8 * 128, 128), jnp.bfloat16),
        "ffn_act_bf16": ((256 * 128, 2048), jnp.bfloat16),
        "resid_bf16": ((256 * 128, 512), jnp.bfloat16),
    }
    iso = {}
    for name, (shape, dtype) in shapes.items():
        x = jnp.ones(shape, dtype)
        fwd = jax.jit(lambda x: fused_dropout(x, key, 0.1))

        def loss(x):
            return jnp.sum(fused_dropout(x, key, 0.1)
                           .astype(jnp.float32))

        fb = jax.jit(jax.grad(loss))
        t_f = _med(lambda: fwd(x), lambda o: np.asarray(o[:1, :1]))
        t_b = _med(lambda: fb(x), lambda o: np.asarray(o[:1, :1]))
        nbytes = x.size * x.dtype.itemsize
        iso[name] = {
            "shape": list(shape), "fwd_ms": round(t_f * 1e3, 2),
            "grad_ms": round(t_b * 1e3, 2),
            # fwd moves read+write = 2x nbytes
            "fwd_gbps": round(2 * nbytes / t_f / 1e9, 1),
        }
        print(name, iso[name], flush=True)
    out["isolated"] = iso

    # ---- 2. attention block fwd+bwd, 3 dropout variants ---- #
    B, N, F, T, H = 256, 8, 128, 128, 64
    q = jnp.ones([B, N, F, H], jnp.bfloat16) * 0.1
    k_ = jnp.ones([B, N, T, H], jnp.bfloat16) * 0.1
    v = jnp.ones([B, N, T, H], jnp.bfloat16) * 0.1

    def make(variant):
        def block(q, k_, v):
            s = jnp.einsum("bnfh,bnth->bnft", q, k_)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1
                               ).astype(jnp.bfloat16)
            if variant == "fused":
                p = fused_dropout(p, key, 0.1)
            elif variant == "bernoulli":
                keep = jax.random.bernoulli(key, 0.9, p.shape)
                p = jnp.where(keep, p / 0.9, 0.0).astype(p.dtype)
            o = jnp.einsum("bnft,bnth->bnfh", p, v)
            return jnp.sum(o.astype(jnp.float32))

        return jax.jit(jax.grad(block))

    blk = {}
    for variant in ("none", "fused", "bernoulli"):
        g = make(variant)
        t = _med(lambda: g(q, k_, v),
                 lambda o: np.asarray(o[:1, :1, :1, :1]))
        blk[variant] = round(t * 1e3, 2)
        print("attn_block", variant, blk[variant], "ms", flush=True)
    out["attn_block_grad_ms"] = blk
    out["attn_block_note"] = ("one [256,8,128,128] attention fwd+bwd; "
                              "the train step has 18 such blocks")

    with open("tools/PROFILE_dropout.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
