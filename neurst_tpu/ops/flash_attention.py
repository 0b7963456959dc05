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
"""Flash attention for TPU (Pallas) — trainable (custom VJP).

Memory-light attention: never materializes the [T_q, T_k] probability
matrix in HBM — each q-block streams over k-blocks with an online
softmax (running max + normalizer), keeping everything in VMEM.  This
is the hot op of long-sequence speech encoding (3000-frame fbank inputs
make the naive [B, N, T, T] logits tensor the HBM bottleneck,
SURVEY.md §7) and of the training step in general: even at T=128 the
dense path round-trips a float32 [B, N, T, T] tensor through HBM for
every layer in forward AND backward.

Differentiable: a ``jax.custom_vjp`` with a FlashAttention-2 style
backward — the forward saves (q, k, v, o, logsumexp) and the backward
recomputes attention probabilities blockwise in two Pallas kernels
(dq over q-blocks; dk/dv over k-blocks), so the [T_q, T_k] matrix is
never materialized in the backward either.

Performance shape (v2, this file): the v1 kernels ran one
(batch*head) slice per grid program and upcast q/k/v to float32
before every dot.  At training shapes (T=128, 2048 slices) that made
flash LOSE to XLA's dense attention: the per-program DMA waits
dominated (~6000 tiny programs per step), and f32 matmuls run the MXU
at a quarter rate.  v2 (a) BATCHES ``block_b`` (batch*head) slices per
program — one DMA brings bb slices of K/V, an in-kernel loop sweeps
them — and (b) feeds the MXU its native mixed precision: dots take the
INPUT dtype (bf16) with float32 accumulation
(``preferred_element_type``), probabilities are cast back to the value
dtype for the P@V / dS@K / P^T@dO products (the FlashAttention
standard), and all online-softmax statistics stay float32.

Supports sequence masking via per-example key lengths and causal
masking.

Attention-probability dropout runs INSIDE the kernel on the TPU
hardware PRNG (``dropout_rate`` / ``dropout_seed``): each (q-block,
k-block) tile draws its keep mask from ``pltpu.prng_random_bits``
seeded by (seed, batch*head, q-block, k-block), and the backward
REGENERATES the identical bits from the same seeding — no mask ever
touches HBM (same design as ops/fused_dropout.py).  The dense-path
semantics are reproduced exactly: the softmax normalizer uses the
UN-dropped probabilities (dense normalizes first, then drops), and the
FlashAttention-2 backward survives dropout unchanged in shape because
``delta = rowsum(dO * O) == rowsum(P~ * dP~)`` with the mask folded
into ``dP~`` — only ``ds`` splits into ``pm*dp - p*delta`` (``pm`` the
dropped, ``p`` the raw probabilities).  Off-TPU the Pallas interpreter
stubs the PRNG, so ``dropout_rate > 0`` requires a real TPU backend
(callers gate on it).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1.0e30


def _seed_tile(seed_ref, bn, qi, kj):
    """Seeds the hardware PRNG for one (batch*head, q-block, k-block)
    probability tile.  The same (seed, bn, qi, kj) always yields the
    same bits, which is what lets the backward kernels regenerate the
    forward's dropout mask without storing it (odd-constant mixing
    keeps distinct tiles distinct; fwd and bwd call this with identical
    arguments for the tile they share)."""
    pltpu.prng_seed(
        seed_ref[0] ^ (jnp.uint32(bn) * jnp.uint32(2654435761)),
        seed_ref[1] ^ (jnp.uint32(qi) * jnp.uint32(1000003)
                       + jnp.uint32(kj) * jnp.uint32(7919)))


def _keep_tile(seed_ref, bn, qi, kj, shape, threshold: int):
    _seed_tile(seed_ref, bn, qi, kj)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(threshold)


def _fwd_kernel(lengths_ref, seed_ref, q_ref, k_ref, v_ref, o_ref,
                lse_ref, *, block_k: int, causal: bool, scale: float,
                threshold: int, inv_keep: float):
    """One (bb-slice group, q_block) program.

    q_ref: [bb, block_q, head_dim]; k_ref/v_ref: [bb, t_k, head_dim]
    (VMEM); lengths_ref: SMEM [B*N] valid key length per slice;
    o_ref: [bb, block_q, head_dim]; lse_ref: [bb, 1, block_q] float32
    row logsumexp (saved for the backward; the middle singleton keeps
    the Mosaic block shape legal — sublane dim == array dim)."""
    bb, block_q, head_dim = q_ref.shape
    t_k = k_ref.shape[1]
    qi = pl.program_id(1)
    bn0 = pl.program_id(0) * bb
    num_kb = t_k // block_k
    prec = (jax.lax.Precision.DEFAULT if q_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if causal:
        # only k-blocks overlapping rows <= (qi+1)*block_q - 1 contribute
        upper = jnp.minimum(
            num_kb, ((qi + 1) * block_q + block_k - 1) // block_k)
    else:
        upper = num_kb

    def one_slice(s, _):
        valid_len = lengths_ref[bn0 + s]
        q = q_ref[pl.ds(s, 1), :, :][0]  # input dtype (bf16 on MXU)

        def body(j, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[pl.ds(s, 1), pl.ds(j * block_k, block_k), :][0]
            v = v_ref[pl.ds(s, 1), pl.ds(j * block_k, block_k), :][0]
            # [block_q, block_k] — native-dtype dot, f32 accumulation
            st = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec) * scale
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = col < valid_len
            if causal:
                row = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, col <= row)
            st = jnp.where(mask, st, NEG_INF)
            m_cur = jnp.max(st, axis=1)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(st - m_new[:, None])
            # fully-masked rows: st - m_new == 0 would give p == 1
            p = jnp.where(mask, p, 0.0)
            alpha = jnp.exp(m_prev - m_new)
            # the normalizer accumulates the UN-dropped probabilities
            # (dense semantics: softmax first, then dropout)
            l_new = l_prev * alpha + jnp.sum(p, axis=1)
            if threshold:
                keep = _keep_tile(seed_ref, bn0 + s, qi, j,
                                  p.shape, threshold)
                pd = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pd = p
            acc = acc * alpha[:, None] + jax.lax.dot_general(
                pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            return acc, m_new, l_new

        init = (jnp.zeros((block_q, head_dim), jnp.float32),
                jnp.full((block_q,), NEG_INF, jnp.float32),
                jnp.zeros((block_q,), jnp.float32))
        acc, m, l = jax.lax.fori_loop(0, upper, body, init)
        o_ref[pl.ds(s, 1)] = (acc / jnp.maximum(l, 1e-20)[:, None]
                              ).astype(o_ref.dtype)[None]
        lse_ref[pl.ds(s, 1)] = jnp.where(
            l > 0.0, m + jnp.log(jnp.maximum(l, 1e-37)),
            NEG_INF)[None, None, :]
        return 0

    jax.lax.fori_loop(0, bb, one_slice, 0)


def _dq_kernel(lengths_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
               lse_ref, delta_ref, dq_ref, *, block_k: int, causal: bool,
               scale: float, threshold: int, inv_keep: float):
    """dQ for one (bb-slice group, q_block) program: stream over
    k-blocks, recomputing probabilities from the saved logsumexp."""
    bb, block_q, head_dim = q_ref.shape
    t_k = k_ref.shape[1]
    qi = pl.program_id(1)
    bn0 = pl.program_id(0) * bb
    num_kb = t_k // block_k
    prec = (jax.lax.Precision.DEFAULT if q_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if causal:
        upper = jnp.minimum(
            num_kb, ((qi + 1) * block_q + block_k - 1) // block_k)
    else:
        upper = num_kb

    def one_slice(s, _):
        valid_len = lengths_ref[bn0 + s]
        q = q_ref[pl.ds(s, 1), :, :][0]
        do = do_ref[pl.ds(s, 1), :, :][0]
        lse = lse_ref[pl.ds(s, 1)][0, 0]
        delta = delta_ref[pl.ds(s, 1)][0, 0]

        def body(j, acc):
            k = k_ref[pl.ds(s, 1), pl.ds(j * block_k, block_k), :][0]
            v = v_ref[pl.ds(s, 1), pl.ds(j * block_k, block_k), :][0]
            st = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec) * scale
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = col < valid_len
            if causal:
                row = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, col <= row)
            st = jnp.where(mask, st, NEG_INF)
            p = jnp.exp(st - lse[:, None])
            p = jnp.where(mask, p, 0.0)
            # dp = dO V^T ; without dropout ds = p * (dp - delta); with
            # it ds = pm * dp - p * delta (pm = regenerated-mask p)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            if threshold:
                keep = _keep_tile(seed_ref, bn0 + s, qi, j,
                                  p.shape, threshold)
                pm = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pm = p
            ds = pm * dp - p * delta[:, None]
            return acc + jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)

        acc = jax.lax.fori_loop(
            0, upper, body, jnp.zeros((block_q, head_dim), jnp.float32))
        dq_ref[pl.ds(s, 1)] = (acc * scale).astype(dq_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, bb, one_slice, 0)


def _dkv_kernel(lengths_ref, seed_ref, k_ref, v_ref, q_ref, do_ref,
                lse_ref, delta_ref, dk_ref, dv_ref, *, block_q: int,
                causal: bool, scale: float, threshold: int,
                inv_keep: float):
    """dK/dV for one (bb-slice group, k_block) program: stream over
    q-blocks."""
    bb, block_k, head_dim = k_ref.shape
    t_q = q_ref.shape[1]
    ki = pl.program_id(1)
    bn0 = pl.program_id(0) * bb
    num_qb = t_q // block_q
    prec = (jax.lax.Precision.DEFAULT if k_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    # only q-blocks at or after this k-block contribute under causality
    lower = (ki * block_k) // block_q if causal else 0

    def one_slice(s, _):
        valid_len = lengths_ref[bn0 + s]
        k = k_ref[pl.ds(s, 1), :, :][0]
        v = v_ref[pl.ds(s, 1), :, :][0]

        def body(i, carry):
            dk_acc, dv_acc = carry
            q = q_ref[pl.ds(s, 1), pl.ds(i * block_q, block_q), :][0]
            do = do_ref[pl.ds(s, 1), pl.ds(i * block_q, block_q), :][0]
            lse = lse_ref[pl.ds(s, 1), :, pl.ds(i * block_q, block_q)][0, 0]
            delta = delta_ref[pl.ds(s, 1), :,
                              pl.ds(i * block_q, block_q)][0, 0]
            st = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec) * scale
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = col < valid_len
            if causal:
                row = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, col <= row)
            st = jnp.where(mask, st, NEG_INF)
            p = jnp.exp(st - lse[:, None])
            p = jnp.where(mask, p, 0.0)
            if threshold:
                # the tile (q-block i, k-block ki) regenerates the same
                # bits the forward drew for it
                keep = _keep_tile(seed_ref, bn0 + s, i, ki,
                                  p.shape, threshold)
                pm = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pm = p
            # dv += (dropped P)^T dO
            pmc = pm.astype(do.dtype)
            dv_acc = dv_acc + jax.lax.dot_general(
                pmc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            ds = pm * dp - p * delta[:, None]
            # dk += dS^T Q
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            return dk_acc, dv_acc

        init = (jnp.zeros((block_k, head_dim), jnp.float32),
                jnp.zeros((block_k, head_dim), jnp.float32))
        dk_acc, dv_acc = jax.lax.fori_loop(lower, num_qb, body, init)
        dk_ref[pl.ds(s, 1)] = (dk_acc * scale).astype(dk_ref.dtype)[None]
        dv_ref[pl.ds(s, 1)] = dv_acc.astype(dv_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, bb, one_slice, 0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pick_bb(bn: int, slice_bytes: int, budget: int = 4 << 20) -> int:
    """How many (batch*head) slices to batch per grid program: the
    largest power of two dividing ``bn`` whose blocked operands fit a
    VMEM budget (double buffering costs another 2x on top).  v1 used 1
    slice/program; at T=128 that is ~6000 tiny programs per training
    step and the DMA waits dominate the kernel."""
    bb = 1
    while (bb < 64 and bn % (bb * 2) == 0
           and (bb * 2) * slice_bytes <= budget):
        bb *= 2
    return bb


def _prep(q, k, v, lengths, block_q, block_k):
    """Pads sequence dims to block multiples and fuses [B,T,N,H] to
    [B*N, T, H]; returns (qt, kt, vt, lengths_bn, shapes)."""
    b, t_q, n, h = q.shape
    t_k = k.shape[1]
    pt_q = _round_up(t_q, block_q)
    pt_k = _round_up(t_k, block_k)
    if pt_q != t_q:
        q = jnp.pad(q, [(0, 0), (0, pt_q - t_q), (0, 0), (0, 0)])
    if pt_k != t_k:
        k = jnp.pad(k, [(0, 0), (0, pt_k - t_k), (0, 0), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, pt_k - t_k), (0, 0), (0, 0)])
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, pt_q, h)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, pt_k, h)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, pt_k, h)
    lengths_bn = jnp.repeat(lengths.astype(jnp.int32), n)
    return qt, kt, vt, lengths_bn, (b, t_q, t_k, n, h, pt_q, pt_k)


def _drop_consts(dropout_rate):
    if not dropout_rate:
        return 0, 1.0
    threshold = min(int(round(dropout_rate * 4294967296.0)), 4294967295)
    return threshold, 1.0 / (1.0 - dropout_rate)


def _fwd_impl(q, k, v, lengths, seed2, causal, block_q, block_k,
              interpret, dropout_rate):
    qt, kt, vt, lengths_bn, (b, t_q, t_k, n, h, pt_q, pt_k) = _prep(
        q, k, v, lengths, block_q, block_k)
    scale = 1.0 / math.sqrt(h)
    threshold, inv_keep = _drop_consts(dropout_rate)
    itemsize = 2 if qt.dtype == jnp.bfloat16 else 4
    bb = _pick_bb(b * n, (2 * pt_k + 2 * block_q) * h * itemsize)
    grid = (b * n // bb, pt_q // block_q)
    kernel = functools.partial(_fwd_kernel, block_k=block_k,
                               causal=causal, scale=scale,
                               threshold=threshold, inv_keep=inv_keep)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb, block_q, h),
                             lambda bn, qi, *_: (bn, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, pt_k, h), lambda bn, qi, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, pt_k, h), lambda bn, qi, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb, block_q, h),
                             lambda bn, qi, *_: (bn, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1, block_q),
                             lambda bn, qi, *_: (bn, 0, qi),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * n, pt_q, h), q.dtype),
            jax.ShapeDtypeStruct((b * n, 1, pt_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_bn, seed2, qt, kt, vt)
    o = out.reshape(b, n, pt_q, h).transpose(0, 2, 1, 3)[:, :t_q]
    return o, (out, lse)


def _bwd_impl(res, do4, causal, block_q, block_k, interpret,
              dropout_rate):
    """res = (q, k, v, lengths, seed2, ot [B*N,ptq,H], lse);
    do4 [B,Tq,N,H]."""
    q, k, v, lengths, seed2, ot, lse = res
    qt, kt, vt, lengths_bn, (b, t_q, t_k, n, h, pt_q, pt_k) = _prep(
        q, k, v, lengths, block_q, block_k)
    scale = 1.0 / math.sqrt(h)
    threshold, inv_keep = _drop_consts(dropout_rate)
    if pt_q != t_q:
        do4 = jnp.pad(do4, [(0, 0), (0, pt_q - t_q), (0, 0), (0, 0)])
    dot = do4.transpose(0, 2, 1, 3).reshape(b * n, pt_q, h)
    # delta_i = dO_i . O_i  (rowwise), cheap in XLA (one fused pass)
    delta = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [B*N, 1, pt_q] like lse

    itemsize = 2 if qt.dtype == jnp.bfloat16 else 4
    bb = _pick_bb(
        b * n, (2 * pt_k + 3 * block_q) * h * itemsize + 8 * block_q)
    dq_kernel = functools.partial(_dq_kernel, block_k=block_k,
                                  causal=causal, scale=scale,
                                  threshold=threshold, inv_keep=inv_keep)
    dqt = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * n // bb, pt_q // block_q),
            in_specs=[
                pl.BlockSpec((bb, block_q, h),
                             lambda bn, qi, *_: (bn, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, pt_k, h), lambda bn, qi, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, pt_k, h), lambda bn, qi, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, block_q, h),
                             lambda bn, qi, *_: (bn, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1, block_q),
                             lambda bn, qi, *_: (bn, 0, qi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1, block_q),
                             lambda bn, qi, *_: (bn, 0, qi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, block_q, h),
                                   lambda bn, qi, *_: (bn, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, pt_q, h), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_bn, seed2, qt, kt, vt, dot, lse, delta)

    bb2 = _pick_bb(
        b * n, (4 * block_k + 2 * pt_q) * h * itemsize + 8 * pt_q)
    dkv_kernel = functools.partial(_dkv_kernel, block_q=block_q,
                                   causal=causal, scale=scale,
                                   threshold=threshold, inv_keep=inv_keep)
    dkt, dvt = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * n // bb2, pt_k // block_k),
            in_specs=[
                pl.BlockSpec((bb2, block_k, h),
                             lambda bn, ki, *_: (bn, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb2, block_k, h),
                             lambda bn, ki, *_: (bn, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb2, pt_q, h), lambda bn, ki, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb2, pt_q, h), lambda bn, ki, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb2, 1, pt_q),
                             lambda bn, ki, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb2, 1, pt_q),
                             lambda bn, ki, *_: (bn, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb2, block_k, h),
                             lambda bn, ki, *_: (bn, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb2, block_k, h),
                             lambda bn, ki, *_: (bn, ki, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * n, pt_k, h), k.dtype),
            jax.ShapeDtypeStruct((b * n, pt_k, h), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_bn, seed2, kt, vt, qt, dot, lse, delta)

    dq = dqt.reshape(b, n, pt_q, h).transpose(0, 2, 1, 3)[:, :t_q]
    dk = dkt.reshape(b, n, pt_k, h).transpose(0, 2, 1, 3)[:, :t_k]
    dv = dvt.reshape(b, n, pt_k, h).transpose(0, 2, 1, 3)[:, :t_k]
    # int lengths/seed take a float0 (symbolic-zero) cotangent
    dlengths = np.zeros(lengths.shape, jax.dtypes.float0)
    dseed = np.zeros(seed2.shape, jax.dtypes.float0)
    return dq, dk, dv, dlengths, dseed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_custom(q, k, v, lengths, seed2, causal, block_q, block_k,
                  interpret, dropout_rate):
    o, _ = _fwd_impl(q, k, v, lengths, seed2, causal, block_q, block_k,
                     interpret, dropout_rate)
    return o


def _flash_custom_fwd(q, k, v, lengths, seed2, causal, block_q, block_k,
                      interpret, dropout_rate):
    o, (ot, lse) = _fwd_impl(q, k, v, lengths, seed2, causal, block_q,
                             block_k, interpret, dropout_rate)
    return o, (q, k, v, lengths, seed2, ot, lse)


def _flash_custom_bwd(causal, block_q, block_k, interpret, dropout_rate,
                      res, do):
    return _bwd_impl(res, do, causal, block_q, block_k, interpret,
                     dropout_rate)


_flash_custom.defvjp(_flash_custom_fwd, _flash_custom_bwd)


def flash_attention(q, k, v, lengths=None, causal: bool = False,
                    block_q: int = 256, block_k: int = 256,
                    interpret: bool = None, dropout_rate: float = 0.0,
                    dropout_key=None):
    """Flash (memory-light, differentiable) attention.

    q [B, Tq, N, H], k/v [B, Tk, N, H], lengths [B] valid KEY counts
    (queries need no mask: padded query rows produce garbage that
    callers drop via loss masks / output slicing).  Returns
    [B, Tq, N, H] (dtype of q).  Scaling by H^-0.5 is applied inside
    (callers must NOT pre-scale).  ``interpret=None`` auto-selects
    interpreter mode off-TPU (Pallas compiles only on TPU).

    ``dropout_rate`` > 0 applies attention-probability dropout inside
    the kernel (hardware PRNG; requires a real TPU backend — the
    interpreter stubs the PRNG to zeros, which would drop everything).
    ``dropout_key`` is a jax PRNG key; callers pass a fresh key per
    step like any dropout site.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dropout_rate = float(dropout_rate or 0.0)
    if dropout_rate > 0.0:
        if interpret:
            raise NotImplementedError(
                "flash attention dropout needs the TPU hardware PRNG "
                "(interpret mode stubs it); run with dropout_rate=0 "
                "off-TPU")
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 needs a dropout_key")
        seed2 = jax.random.key_data(dropout_key).astype(
            jnp.uint32).reshape(-1)[:2]
    else:
        seed2 = jnp.zeros([2], jnp.uint32)
    b, t_q, _, _ = q.shape
    t_k = k.shape[1]
    if lengths is None:
        lengths = jnp.full((b,), t_k, jnp.int32)
    # blocks must be multiples of the 128 lane width: the backward
    # kernels slice lse/delta on the LANE dim at dynamic offsets
    # i*block_q, which Mosaic can prove aligned only when block_q is a
    # multiple of 128; then shrink for short sequences
    block_q = min(_round_up(block_q, 128), _round_up(t_q, 128))
    block_k = min(_round_up(block_k, 128), _round_up(t_k, 128))
    return _flash_custom(q, k, v, lengths, seed2, causal, block_q,
                         block_k, interpret, dropout_rate)
