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
"""Mixture-of-experts feed-forward with expert parallelism.

Beyond-reference capability: the reference has no conditional
computation (its FFN is ``common_layers.TransformerFFN``); this layer
scales model capacity without scaling per-token FLOPs, the standard
recipe for large production translation models (Switch Transformer /
GShard).

TPU-first design — dense dispatch, no host-side routing:
  * expert weights are stacked ``[num_experts, ...]`` and the expert
    axis carries the logical name "expert", which LOGICAL_AXIS_RULES
    maps onto the mesh's "data" devices: each data-parallel group holds
    ``num_experts / dp`` experts (classic EP-over-DP);
  * routing is expressed as two einsums against a one-hot
    dispatch/combine tensor ``[batch, tokens, experts, capacity]`` —
    XLA lowers the batch-sharded -> expert-sharded layout change to the
    dispatch/combine all-to-alls, and every op keeps static shapes (the
    capacity bound makes token dropping a masked write, not a dynamic
    shape);
  * the router runs in float32 regardless of the compute dtype
    (bf16 router logits make top-k selection noisy);
  * the Switch load-balancing auxiliary loss is sown into the "losses"
    collection and surfaced by ``BaseModel.call_train``; outside
    training (plain ``apply`` without the mutable collection) sow is a
    no-op, so decode paths need no changes.

Capacity/grouping: tokens are grouped per batch row (group size = T),
so the dispatch tensors never mix rows and the batch axis stays
sharded over "data" end to end.  Per-expert capacity is
``ceil(T * top_k * capacity_factor / num_experts)``; overflow tokens
fall through the residual connection (their FFN output is zero),
exactly the Switch semantics.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import activation_by_name, apply_dropout

__all__ = ["MoeFFN"]

Dtype = Any


class MoeFFN(nn.Module):
    """Drop-in replacement for TransformerFFN with E experts.

    top_k=1 is a Switch layer; top_k=2 is the GShard top-2 router
    (second choice weighted by its renormalized router prob).
    """
    num_experts: int
    filter_size: int
    output_size: int
    top_k: int = 1
    capacity_factor: float = 1.25
    eval_capacity_factor: float = 2.0
    aux_loss_coef: float = 0.01
    router_jitter: float = 0.01
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_training: bool = False):
        B, T, H = x.shape
        E = int(self.num_experts)
        K = int(self.top_k)
        assert E >= 1 and 1 <= K <= E

        w_router = self.param(
            "router_kernel",
            nn.with_partitioning(nn.initializers.lecun_normal(),
                                 ("embed", "expert_logits")),
            (H, E), jnp.float32)
        w1 = self.param(
            "expert_dense1_kernel",
            nn.with_partitioning(nn.initializers.lecun_normal(),
                                 ("expert", "embed", "mlp")),
            (E, H, self.filter_size), jnp.float32)
        b1 = self.param(
            "expert_dense1_bias",
            nn.with_partitioning(nn.initializers.zeros, ("expert", "mlp")),
            (E, self.filter_size), jnp.float32)
        w2 = self.param(
            "expert_dense2_kernel",
            nn.with_partitioning(nn.initializers.lecun_normal(),
                                 ("expert", "mlp", "embed")),
            (E, self.filter_size, self.output_size), jnp.float32)
        b2 = self.param(
            "expert_dense2_bias",
            nn.with_partitioning(nn.initializers.zeros, ("expert", "embed")),
            (E, self.output_size), jnp.float32)

        # ---- router (f32) ---- #
        logits = jnp.einsum("bth,he->bte", x.astype(jnp.float32), w_router)
        if is_training and self.router_jitter > 0.0:
            eps = float(self.router_jitter)
            noise = jax.random.uniform(
                self.make_rng("dropout"), logits.shape, jnp.float32,
                1.0 - eps, 1.0 + eps)
            logits = logits * noise
        probs = jax.nn.softmax(logits, axis=-1)          # [B,T,E]

        cf = (self.capacity_factor if is_training
              else self.eval_capacity_factor)
        capacity = max(1, int(math.ceil(T * K * float(cf) / E)))
        capacity = min(capacity, T)  # one row never sends >T to one expert
        if not is_training and T <= 16:
            # short eval windows are decode steps (stepwise T=1, or a
            # speculative verification window T=k): route DROPLESS so
            # multi-token verification matches single-token decode
            # exactly (with E > 2*top_k the capacity bound could
            # otherwise drop a token that stepwise decode would keep);
            # the [B,T,E,T] dispatch tensor is tiny at these T
            capacity = T

        # ---- top-k assignment with per-expert capacity ---- #
        combine = jnp.zeros((B, T, E, capacity), jnp.float32)
        remaining = probs
        fill = jnp.zeros((B, E), jnp.int32)  # tokens already placed
        first_choice_onehot = None
        for _ in range(K):
            idx = jnp.argmax(remaining, axis=-1)          # [B,T]
            onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)
            if first_choice_onehot is None:
                first_choice_onehot = onehot
            # position of each token within its chosen expert's buffer
            # (earlier tokens in the row win, matching Switch)
            pos = (jnp.cumsum(onehot, axis=1) - 1.0
                   + fill[:, None, :].astype(jnp.float32))  # [B,T,E]
            pos = jnp.sum(pos * onehot, axis=-1)            # [B,T]
            keep = pos < capacity                           # [B,T]
            gate = jnp.sum(probs * onehot, axis=-1)         # [B,T]
            slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                                  dtype=jnp.float32)        # [B,T,C]
            contrib = (gate * keep.astype(jnp.float32))[:, :, None, None] \
                * onehot[:, :, :, None] * slot[:, :, None, :]
            combine = combine + contrib
            fill = fill + jnp.sum(
                onehot * keep.astype(jnp.float32)[:, :, None],
                axis=1).astype(jnp.int32)
            remaining = remaining * (1.0 - onehot)
        if K > 1:
            # renormalize gates over the surviving selections (GShard
            # top-2: g_i / sum g_j); fully-dropped tokens keep 0
            denom = jnp.sum(combine, axis=(2, 3), keepdims=True)
            combine = jnp.where(denom > 0.0,
                                combine / jnp.maximum(denom, 1e-9), 0.0)
        dispatch = (combine > 0.0).astype(x.dtype)          # [B,T,E,C]

        # ---- Switch auxiliary load-balancing loss ---- #
        # fraction of tokens whose FIRST choice is e  x  mean router prob
        frac = jnp.mean(first_choice_onehot, axis=(0, 1))   # [E]
        mean_prob = jnp.mean(probs, axis=(0, 1))            # [E]
        aux = jnp.sum(frac * mean_prob) * (E * float(self.aux_loss_coef))
        if is_training:
            self.sow("losses", "moe_aux_loss", aux,
                     init_fn=lambda: jnp.zeros([], jnp.float32),
                     reduce_fn=lambda a, b: a + b)

        # ---- dispatch -> experts -> combine ---- #
        expert_in = jnp.einsum("btec,bth->bech", dispatch,
                               x.astype(self.dtype))        # [B,E,C,H]
        h = jnp.einsum("bech,ehf->becf", expert_in,
                       w1.astype(self.dtype)) \
            + b1.astype(self.dtype)[None, :, None, :]
        h = activation_by_name(self.activation)(h)
        h = apply_dropout(self, h, self.dropout_rate, is_training)
        out = jnp.einsum("becf,efh->bech", h, w2.astype(self.dtype)) \
            + b2.astype(self.dtype)[None, :, None, :]
        y = jnp.einsum("btec,bech->bth", combine.astype(self.dtype), out)
        return y.astype(self.dtype)
