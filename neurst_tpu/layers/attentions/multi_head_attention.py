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
"""Multi-head attention with a static-shape incremental kv-cache.

Parity: /root/reference/neurst/layers/attentions/multi_head_attention.py
(fused qkv projection, einsum BTNH,BFNH->BNFT logits, query scaling by
head_dim^-0.5, cached cross-attention k/v, static-shape decode cache).

TPU-first redesign of the cache (SURVEY.md §7 "hard parts"): the decode
cache is ALWAYS static-shape ``[batch*beam, max_len, heads, head_dim]``
(the reference's ``padded_decode`` mode is the only mode).  Step updates
use ``lax.dynamic_update_slice`` (no one-hot multiply).  Under beam
search the cache rows never move: the search carries an ancestor-index
matrix and ``_attend_indirect`` selects each position's key/value row
in-register (fallback paths keep the single ``jnp.take`` reorder on
the fused batch*beam axis).  Softmax runs in float32 regardless of the
bf16 compute dtype.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurst_tpu.layers.common_layers import apply_dropout

__all__ = ["MultiHeadAttention", "MultiHeadSelfAttention"]

Dtype = Any


@jax.custom_vjp
def _softmax_bf16_residual(z):
    """softmax(z_f32) stored (and saved for backward) as bfloat16.

    jax.nn.softmax keeps its float32 output alive as the vjp residual;
    at training attention shapes that is a [B, N, F, T] f32 tensor per
    site.  This saves the bf16-rounded probabilities instead and
    computes dsoftmax from them: dz = p * (dp - sum(dp * p))."""
    return jax.nn.softmax(z, axis=-1).astype(jnp.bfloat16)


def _softmax_bf16_fwd(z):
    p = jax.nn.softmax(z, axis=-1).astype(jnp.bfloat16)
    return p, p


def _softmax_bf16_bwd(p, dp):
    p32 = p.astype(jnp.float32)
    dp32 = dp.astype(jnp.float32)
    dz = p32 * (dp32 - jnp.sum(dp32 * p32, axis=-1, keepdims=True))
    return (dz,)


_softmax_bf16_residual.defvjp(_softmax_bf16_fwd, _softmax_bf16_bwd)


class MultiHeadAttention(nn.Module):
    """Cross-attention (q from query; k/v from memory or cache)."""

    num_heads: int
    num_units: int
    attention_key_depth: Optional[int] = None
    attention_value_depth: Optional[int] = None
    output_depth: Optional[int] = None
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @property
    def key_depth(self):
        return self.attention_key_depth or self.num_units

    @property
    def value_depth(self):
        return self.attention_value_depth or self.num_units

    @property
    def out_depth(self):
        return self.output_depth or self.num_units

    def _proj(self, name, n_proj, depth):
        """Fused projection -> [B, L, n_proj, heads, depth // heads].
        Uses the QAT dense when --enable_quant is on (learned clip-max
        fake quantization of kernel + output)."""
        from neurst_tpu.layers.quantization.quant_layers import \
            dense_general
        return dense_general(
            features=(n_proj, self.num_heads, depth // self.num_heads),
            dtype=self.dtype, name=name,
            kernel_init=nn.with_partitioning(
                nn.initializers.glorot_uniform(),
                ("embed", None, "heads", "head_dim")),
            bias_init=nn.initializers.zeros)

    def _out_proj(self):
        from neurst_tpu.layers.quantization.quant_layers import \
            dense_general
        return dense_general(
            features=self.out_depth, axis=(-2, -1),
            dtype=self.dtype, name="output_transform",
            kernel_init=nn.with_partitioning(
                nn.initializers.glorot_uniform(),
                ("heads", "head_dim", "embed")),
            bias_init=nn.initializers.zeros)

    def setup(self):
        self.q_transform = self._proj("q_transform", 1, self.key_depth)
        self.kv_transform = self._proj("kv_transform", 2, self.key_depth)
        self.output_transform = self._out_proj()

    def _attend(self, q, k, v, bias, is_training):
        """q [B,F,N,H], k/v [B,T,N,H], bias broadcastable to [B,N,F,T]."""
        head_dim = q.shape[-1]
        q = q * (head_dim ** -0.5)
        logits = jnp.einsum("BTNH,BFNH->BNFT", k, q,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        if is_training and self.dtype == jnp.bfloat16:
            # training at bf16: save only the bf16 probabilities for
            # the backward (jax.nn.softmax would keep the f32 [B,N,F,T]
            # tensor alive as a residual — 134 MB/site at the bench
            # shape; the dsoftmax from bf16-rounded p costs ~0.4%
            # relative gradient noise, the same class as the flash
            # path's p->bf16 cast)
            weights = _softmax_bf16_residual(logits)
        else:
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = apply_dropout(self, weights, self.attention_dropout_rate,
                                is_training)
        out = jnp.einsum("BNFT,BTNH->BFNH", weights, v)
        return self.output_transform(out)

    def compute_kv(self, memory):
        """Projects memory to (k, v), each [B, T, N, H]."""
        kv = self.kv_transform(memory)
        return kv[:, :, 0], kv[:, :, 1]

    def _flash_dropout(self, is_training):
        """(rate, key) for the IN-KERNEL attention-probability dropout
        on the flash path — it needs the TPU hardware PRNG (the Pallas
        interpreter stubs it), so training a flash recipe with
        attention dropout off-TPU is a HARD config error: silently
        dropping the rate to 0 would train a different model on CPU
        than the same recipe trains on TPU.  Set
        ``attention_dropout_rate: 0`` (or disable flash attention) to
        run such a recipe off-TPU; ``NEURST_FLASH_DROPOUT_OFF_TPU=skip``
        opts into the old skip-silently behavior for smoke tests."""
        if not is_training or self.attention_dropout_rate <= 0.0:
            return 0.0, None
        if jax.default_backend() != "tpu":
            import os
            if os.environ.get("NEURST_FLASH_DROPOUT_OFF_TPU") == "skip":
                return 0.0, None
            raise ValueError(
                "flash attention applies attention-probability dropout "
                f"in-kernel on the TPU hardware PRNG; rate="
                f"{self.attention_dropout_rate} cannot run on the "
                f"'{jax.default_backend()}' backend.  Training this "
                "recipe here would silently diverge from its TPU "
                "semantics — set attention_dropout_rate: 0 or "
                "enable_flash_attention: false for off-TPU runs "
                "(NEURST_FLASH_DROPOUT_OFF_TPU=skip overrides).")
        return float(self.attention_dropout_rate), self.make_rng("dropout")

    def __call__(self, query, memory=None, bias=None, cache=None,
                 is_training=False, flash_lengths=None
                 ) -> Tuple[jnp.ndarray, Optional[dict]]:
        """Returns (output [B, F, out_depth], cache passthrough).

        With ``flash_lengths`` (valid KEY counts; no cache), the Pallas
        flash kernel computes the attention without materializing the
        [F, T] probability matrix; attention-probability dropout runs
        IN-KERNEL on the TPU hardware PRNG (skipped off-TPU).
        """
        q = self.q_transform(query)[:, :, 0]
        if cache is not None:
            k, v = cache["keys"], cache["values"]
        else:
            k, v = self.compute_kv(memory)
        if cache is None and flash_lengths is not None:
            from neurst_tpu.ops.flash_attention import flash_attention
            rate, key = self._flash_dropout(is_training)
            out = flash_attention(q, k, v, lengths=flash_lengths,
                                  dropout_rate=rate, dropout_key=key)
            return self.output_transform(out), cache
        if cache is not None and q.shape[0] != k.shape[0]:
            # beam-shared kv: query rows are [B*beam] while the cached
            # memory k/v stayed [B] (beam hypotheses of one sentence
            # attend identical encoder state).  Group the beam rows
            # into the query-length axis — `bias` [B, 1, 1, S]
            # broadcasts over it — then ungroup.
            b = k.shape[0]
            beam = q.shape[0] // b
            f = q.shape[1]
            qg = q.reshape(b, beam * f, *q.shape[2:])
            out = self._attend(qg, k, v, bias, is_training)
            return out.reshape(b * beam, f, out.shape[-1]), cache
        return self._attend(q, k, v, bias, is_training), cache


class MultiHeadSelfAttention(MultiHeadAttention):
    """Self-attention with fused qkv and incremental static cache."""

    def setup(self):
        self.qkv_transform = self._proj("qkv_transform", 3, self.key_depth)
        self.output_transform = self._out_proj()

    def _attend_indirect(self, q, k, v, bias, beam_anc):
        """Decode-step attention reading the kv-cache through a beam
        ancestor-index matrix instead of a physically reordered cache.

        Beam search without cache indirection spends most of its
        step-loop HBM traffic reordering the self kv-cache (one
        ``jnp.take`` read+write of every leaf per step).  With
        indirection the cache rows never move: row b's position-j
        key/value physically lives at row ``beam_anc[.., b, j]`` of its
        beam group, and the selection happens IN-REGISTER via a one-hot
        over the (tiny) beam axis after computing all beam-pair logits
        — the cache is read once, nothing is rewritten.  Exact: the
        selected dot products are the same dot products the reordered
        path computes (one-hot has a single unit entry; padded/future
        positions carry arbitrary valid indices and are bias-masked).

        q [BB, 1, N, H]; k/v [BB, T, N, H]; bias broadcastable over
        [., ., ., T]; beam_anc int [B, beam, T] with BB = B * beam.
        Returns the projected output [BB, 1, out_depth].
        """
        batch, beam, t_len = beam_anc.shape
        head_dim = q.shape[-1]
        qg = (q[:, 0] * (head_dim ** -0.5)).reshape(
            batch, beam, q.shape[-2], head_dim)
        kg = k.reshape((batch, beam) + k.shape[1:])
        vg = v.reshape((batch, beam) + v.shape[1:])
        # all beam-pair logits: lg[B, q, p, N, T] = q_beam q vs k_beam p
        lg = jnp.einsum("BqNH,BpTNH->BqpNT", qg, kg,
                        preferred_element_type=jnp.float32)
        onehot = jax.nn.one_hot(beam_anc, beam, dtype=jnp.float32,
                                axis=-1)  # [B, q, T, p]
        logits = jnp.einsum("BqpNT,BqTp->BqNT", lg, onehot)
        if bias is not None:
            # decode bias is [1, 1, 1, T] (scalar decode step) — it
            # broadcasts over [B, beam, N, T] directly
            logits = logits + bias.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        wsel = (weights[:, :, None]
                * jnp.moveaxis(onehot, -1, 2)[:, :, :, None, :].astype(
                    self.dtype))  # [B, q, p, N, T]
        out = jnp.einsum("BqpNT,BpTNH->BqNH", wsel, vg)
        out = out.reshape(batch * beam, 1, out.shape[-2], out.shape[-1])
        return self.output_transform(out)

    def __call__(self, query, bias=None, cache=None, decode_step=None,
                 is_training=False, flash_lengths=None,
                 flash_causal=False, ring_axis=None, ring_lengths=None,
                 beam_anc=None):
        """Self-attention over `query` [B, F, D].

        With ``flash_lengths`` (and no cache), the Pallas flash kernel
        computes the attention (padding via lengths; optional causal),
        never materializing the [F, T] probability matrix in HBM.
        Differentiable (custom VJP with blockwise recompute), so it
        serves training too; attention-probability dropout runs
        IN-KERNEL on the TPU hardware PRNG (mask regenerated in the
        backward; skipped off-TPU, where callers warn once).

        With ``ring_axis`` (and no cache), the time axis is treated as
        sharded over that mesh axis and attention runs as a
        sequence-parallel ring (kv shards rotate over ICI; see
        neurst_tpu/ops/ring_attention.py) — sequences longer than one
        chip's HBM.  Differentiable (the ring is a scan), so it serves
        training and encoding alike.

        Incremental mode (``decode_step`` is not None): query is
        [B, 1, D]; `cache` {"keys"/"values": [B, max_len, N, H]} is
        scatter-updated at `decode_step`; caller's `bias` must mask
        positions > decode_step.

        Returns (output, new_cache).
        """
        qkv = self.qkv_transform(query)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cache is None and ring_axis is not None:
            from neurst_tpu.ops.ring_attention import ring_self_attention
            out = ring_self_attention(q, k, v, seq_axis=ring_axis,
                                      lengths=ring_lengths,
                                      causal=flash_causal)
            return self.output_transform(out), cache
        if cache is None and flash_lengths is not None:
            from neurst_tpu.ops.flash_attention import flash_attention
            rate, key = self._flash_dropout(is_training)
            out = flash_attention(q, k, v, lengths=flash_lengths,
                                  causal=flash_causal,
                                  dropout_rate=rate, dropout_key=key)
            return self.output_transform(out), cache
        if cache is not None and decode_step is not None:
            if getattr(decode_step, "ndim", 0) == 1:
                # per-row write offsets ([B] times, speculative decode):
                # query is [B, k, D]; row b's k slots land at
                # decode_step[b] + [0..k)
                def upd(c, val, t):
                    return jax.lax.dynamic_update_slice(c, val, (t, 0, 0))
                keys = jax.vmap(upd)(
                    cache["keys"], k.astype(cache["keys"].dtype),
                    decode_step)
                values = jax.vmap(upd)(
                    cache["values"], v.astype(cache["values"].dtype),
                    decode_step)
            else:
                keys = jax.lax.dynamic_update_slice(
                    cache["keys"], k.astype(cache["keys"].dtype),
                    (0, decode_step, 0, 0))
                values = jax.lax.dynamic_update_slice(
                    cache["values"], v.astype(cache["values"].dtype),
                    (0, decode_step, 0, 0))
            cache = {"keys": keys, "values": values}
            k, v = keys, values
            if beam_anc is not None and q.shape[1] == 1 \
                    and getattr(decode_step, "ndim", 0) == 0:
                return self._attend_indirect(q, k, v, bias, beam_anc), \
                    cache
        return self._attend(q, k, v, bias, is_training), cache
