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
"""Mask/bias helpers for attention (parity: neurst/layers/layer_utils.py).

Conventions (identical to the reference):
* ``padding`` is a float tensor, 1.0 at PAD positions, 0.0 at tokens;
* attention biases are *additive*: 0 where attendable, ``NEG_INF`` where
  masked, applied to logits before softmax.
"""

import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e9

__all__ = ["NEG_INF", "input_padding_to_bias", "causal_self_attention_bias",
           "input_length_to_padding", "input_length_to_nonpadding",
           "one_entry_bias", "waitk_cross_attention_bias", "stack_beam_size",
           "unstack_beam_size", "gather_beams"]


def input_length_to_padding(lengths, max_len):
    """[B] lengths -> [B, L] float padding (1.0 = pad)."""
    positions = jnp.arange(max_len)[None, :]
    return (positions >= lengths[:, None]).astype(jnp.float32)


def input_length_to_nonpadding(lengths, max_len, dtype=jnp.float32):
    positions = jnp.arange(max_len)[None, :]
    return (positions < lengths[:, None]).astype(dtype)


def input_padding_to_bias(padding, dtype=jnp.float32):
    """[B, L] float padding -> [B, 1, 1, L] additive bias."""
    return (padding * NEG_INF).astype(dtype)[:, None, None, :]


def causal_self_attention_bias(length, dtype=jnp.float32):
    """[1, 1, L, L] additive bias masking j > i (future positions)."""
    mask = np.triu(np.full([length, length], NEG_INF, dtype=np.float32), k=1)
    return jnp.asarray(mask, dtype=dtype)[None, None, :, :]


def one_entry_bias(on_entry, num_entries, on_value, off_value, dtype=jnp.float32):
    """[num_entries] vector: on_value at `on_entry`, off_value elsewhere."""
    return jnp.where(jnp.arange(num_entries) == on_entry,
                     jnp.asarray(on_value, dtype),
                     jnp.asarray(off_value, dtype))


def waitk_cross_attention_bias(query_len, memory_len, lagging, dtype=jnp.float32):
    """Wait-k bias: decoding position i may only see source positions
    < i + lagging.  Shape [1, 1, query_len, memory_len]."""
    q_pos = jnp.arange(query_len)[:, None]
    m_pos = jnp.arange(memory_len)[None, :]
    allowed = m_pos < (q_pos + lagging)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(dtype)
    return bias[None, None, :, :]


def stack_beam_size(x, beam_size):
    """[B, ...] -> [B * beam, ...] by repeating each batch entry."""
    return jnp.repeat(x, beam_size, axis=0)


def unstack_beam_size(x, beam_size):
    """[B * beam, ...] -> [B, beam, ...]."""
    return x.reshape((-1, beam_size) + x.shape[1:])


def gather_beams(nested, beam_indices):
    """Reorders the leading batch*beam axis of every leaf by beam_indices."""
    import jax
    return jax.tree_util.tree_map(
        lambda t: jnp.take(t, beam_indices, axis=0), nested)


def stack_beam_size_selective(nested, beam_size,
                              skip_keys=("memory", "memory_padding")):
    """Tiles a cache pytree to [B*beam, ...], LEAVING the batch-invariant
    subtrees at [B, ...]: beam hypotheses of one sentence share the
    encoder-derived cross-attention k/v and memory padding bit-for-bit,
    so tiling them only multiplies the per-step HBM reads by beam_size.
    The cross-attention computes the shared-kv case with a grouped
    einsum (MultiHeadAttention detects the batch mismatch).

    Leaves under a ``"stacked"`` key (scan-over-layers decoders) carry a
    leading layer axis, so their batch axis is 1, not 0."""

    def walk(node, under_skip, axis):
        if isinstance(node, dict):
            return {k: walk(v, under_skip or (k in skip_keys),
                            1 if k == "stacked" else axis)
                    for k, v in node.items()}
        if under_skip or node is None:
            return node
        return jnp.repeat(node, beam_size, axis=axis)

    return walk(nested, False, 0)


def gather_beams_selective(nested, beam_indices, skip_keys=("memory",
                                                           "memory_padding")):
    """Beam-reorders a cache pytree, skipping batch-invariant subtrees.

    Beam hypotheses of the same sentence share identical encoder-derived
    state (cross-attention k/v, memory padding): `beam_indices` only
    permutes within each sentence's beam block, so those leaves are
    fixed points of the gather.  Skipping them cuts the per-step HBM
    traffic of beam reordering by ~an order of magnitude for speech
    inputs (long source, short target).

    Leaves under a ``"stacked"`` key (scan-over-layers decoders) carry a
    leading layer axis, so their batch axis is 1, not 0.
    """

    def walk(node, under_skip, axis):
        if isinstance(node, dict):
            return {k: walk(v, under_skip or (k in skip_keys),
                            1 if k == "stacked" else axis)
                    for k, v in node.items()}
        if under_skip or node is None:
            return node
        return jnp.take(node, beam_indices, axis=axis)

    return walk(nested, False, 0)
