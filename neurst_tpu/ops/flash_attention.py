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
"""Flash attention for TPU (Pallas).

Memory-light attention: never materializes the [T_q, T_k] probability
matrix in HBM — each q-block streams over k-blocks with an online
softmax (running max + normalizer), keeping everything in VMEM.  This
is the hot op of long-sequence speech encoding (3000-frame fbank inputs
make the naive [B, N, T, T] logits tensor the HBM bottleneck,
SURVEY.md §7).

Supports sequence masking via per-example key lengths and causal
masking.  Inference-only: the kernel defines no AD rule, and callers
gate it off during training (see MultiHeadSelfAttention).
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1.0e30


def _flash_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
                  block_k: int, causal: bool, scale: float):
    """One (batch*head, q_block) program.

    q_ref: [block_q, head_dim]; k_ref/v_ref: [t_k, head_dim] (VMEM);
    lengths_ref: SMEM [1] valid key length for this batch*head row;
    o_ref: [block_q, head_dim].
    """
    _, block_q, head_dim = q_ref.shape
    t_k = k_ref.shape[1]
    qi = pl.program_id(1)
    valid_len = lengths_ref[pl.program_id(0)]

    q = q_ref[0].astype(jnp.float32) * scale

    num_kb = t_k // block_k

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        # [block_q, block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < valid_len
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, NEG_INF)
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        # fully-masked rows: s - m_new == 0 would give p == 1; zero them
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    init = (jnp.zeros((block_q, head_dim), jnp.float32),
            jnp.full((block_q,), NEG_INF, jnp.float32),
            jnp.zeros((block_q,), jnp.float32))
    if causal:
        # only k-blocks up to (and including) this q-block contribute
        upper = jnp.minimum(num_kb, (qi + 1) * block_q // block_k
                            + (1 if block_q % block_k else 0) + 1)
        upper = jnp.minimum(upper, num_kb)
        acc, m, l = jax.lax.fori_loop(0, upper, body, init)
    else:
        acc, m, l = jax.lax.fori_loop(0, num_kb, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def flash_attention(q, k, v, lengths=None, causal: bool = False,
                    block_q: int = 256, block_k: int = 256,
                    interpret: bool = None):
    """See _flash_attention; `interpret=None` auto-selects interpreter
    mode off-TPU (pallas compiles only on TPU)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention(q, k, v, lengths, causal=causal,
                            block_q=block_q, block_k=block_k,
                            interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"))
def _flash_attention(q, k, v, lengths=None, causal: bool = False,
                     block_q: int = 256, block_k: int = 256,
                     interpret: bool = False):
    """q [B, Tq, N, H], k/v [B, Tk, N, H], lengths [B] valid key counts.

    Returns [B, Tq, N, H] (same dtype as q).  Scaling by H^-0.5 is
    applied inside (callers must NOT pre-scale).
    """
    b, t_q, n, h = q.shape
    t_k = k.shape[1]
    scale = 1.0 / math.sqrt(h)
    if lengths is None:
        lengths = jnp.full((b,), t_k, jnp.int32)

    # pad sequence dims to block multiples (masked out via lengths)
    pt_q = _round_up(t_q, block_q)
    pt_k = _round_up(t_k, block_k)
    if pt_q != t_q:
        q = jnp.pad(q, [(0, 0), (0, pt_q - t_q), (0, 0), (0, 0)])
    if pt_k != t_k:
        k = jnp.pad(k, [(0, 0), (0, pt_k - t_k), (0, 0), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, pt_k - t_k), (0, 0), (0, 0)])

    # [B, T, N, H] -> [B*N, T, H]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, pt_q, h)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, pt_k, h)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, pt_k, h)
    lengths_bn = jnp.repeat(lengths.astype(jnp.int32), n)

    grid = (b * n, pt_q // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               causal=causal, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, h),
                             lambda bn, qi, *_: (bn, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pt_k, h), lambda bn, qi, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pt_k, h), lambda bn, qi, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, h),
                                   lambda bn, qi, *_: (bn, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, pt_q, h), q.dtype),
        interpret=interpret,
    )(lengths_bn, qt, kt, vt)

    out = out.reshape(b, n, pt_q, h).transpose(0, 2, 1, 3)
    return out[:, :t_q]
