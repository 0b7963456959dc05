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
"""Fused label-smoothed softmax cross-entropy (Pallas, custom VJP).

The XLA-fused criterion still costs 29 ms / 13 GB of HBM traffic per
transformer_base [256, 128] step (measured): the f32 upcast of the
[B, T, V] logits materializes once, and forward + backward re-read it.
This kernel streams vocab blocks through VMEM with an online
max/logsumexp (flash-attention style), so each direction reads the
bf16 logits exactly once and the backward writes dlogits once:
~6.5 GB total instead of 13.

Per-token math (identical to LabelSmoothedCrossEntropy.__call__):
    xent = -(c - l) * (z_y - lse) - l * (sum_z - V * lse)
    dz_v = g * ((c - l) * (p_v - 1[v=y]) + l * (V * p_v - 1))
with c = 1 - smoothing, l = smoothing / (V - 1), p = softmax(z).

Row-wise tensors (labels, lse, xent, g) are carried as [R, 1] columns:
Mosaic requires block shapes whose trailing dims are (8k, 128k) or
equal to the array dims — a [R] vector blocked (rows,) is neither.

The kernel contains no TPU-only primitives, so interpret mode works
and CPU tests compare it against the jnp formula.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_softmax_xent", "fused_ce_available"]

NEG_INF = -1.0e30
_ROWS = 64
_VBLOCK = 4096


def fused_ce_available(vocab_size: int) -> bool:
    # vocab need not divide _VBLOCK (the ragged final block is masked
    # on the column index), but must be lane-aligned
    return jax.default_backend() == "tpu" and vocab_size % 128 == 0 \
        and vocab_size >= _VBLOCK


def _fwd_kernel(z_ref, label_ref, xent_ref, lse_ref,
                m_sc, l_sc, zy_sc, sz_sc, *,
                confidence: float, low_confidence: float, vocab: int):
    """grid = (row_blocks, vocab_blocks); vocab is the fast axis.
    Scratch carries the online (max, sumexp, z_label, sum_z) [rows, 1]
    across the vocab blocks of one row block."""
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        zy_sc[:] = jnp.zeros_like(zy_sc)
        sz_sc[:] = jnp.zeros_like(sz_sc)

    z = z_ref[:].astype(jnp.float32)           # [rows, vblock]
    rows, vblock = z.shape
    label = label_ref[:]                        # [rows, 1] int32
    col = j * vblock + jax.lax.broadcasted_iota(jnp.int32,
                                                (rows, vblock), 1)
    # the final vocab block may be ragged (vocab % vblock != 0): its
    # out-of-range lanes hold unspecified padding, so mask every
    # reduction on the column index
    valid = col < vocab
    z = jnp.where(valid, z, NEG_INF)
    m_prev = m_sc[:]                            # [rows, 1]
    m_new = jnp.maximum(m_prev, jnp.max(z, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    l_sc[:] = l_sc[:] * alpha + jnp.sum(jnp.exp(z - m_new), axis=1,
                                        keepdims=True)
    m_sc[:] = m_new
    onehot = col == label
    zy_sc[:] = zy_sc[:] + jnp.sum(jnp.where(onehot, z, 0.0), axis=1,
                                  keepdims=True)
    sz_sc[:] = sz_sc[:] + jnp.sum(jnp.where(valid, z, 0.0), axis=1,
                                  keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        lse = m_sc[:] + jnp.log(jnp.maximum(l_sc[:], 1e-37))
        xent_ref[:] = (-(confidence - low_confidence) * (zy_sc[:] - lse)
                       - low_confidence * (sz_sc[:] - vocab * lse))
        lse_ref[:] = lse


def _bwd_kernel(z_ref, label_ref, lse_ref, g_ref, dz_ref, *,
                confidence: float, low_confidence: float, vocab: int):
    z = z_ref[:].astype(jnp.float32)
    rows, vblock = z.shape
    label = label_ref[:]                        # [rows, 1]
    lse = lse_ref[:]                            # [rows, 1]
    g = g_ref[:]                                # [rows, 1]
    j = pl.program_id(1)
    col = j * vblock + jax.lax.broadcasted_iota(jnp.int32,
                                                (rows, vblock), 1)
    valid = col < vocab
    p = jnp.exp(jnp.where(valid, z, NEG_INF) - lse)
    onehot = (col == label).astype(jnp.float32)
    dz = ((confidence - low_confidence) * (p - onehot)
          + low_confidence * (vocab * p - 1.0))
    dz_ref[:] = jnp.where(valid, g * dz, 0.0).astype(dz_ref.dtype)


def _row_spec(rows):
    return pl.BlockSpec((rows, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _impl_fwd(z2, labels1, confidence, low_confidence, interpret):
    r, v = z2.shape
    rows = min(_ROWS, r)
    vb = min(_VBLOCK, v)
    grid = (-(-r // rows), -(-v // vb))
    kernel = functools.partial(_fwd_kernel, confidence=confidence,
                               low_confidence=low_confidence, vocab=v)
    xent, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, vb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            _row_spec(rows),
        ],
        out_specs=[_row_spec(rows), _row_spec(rows)],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, 1), jnp.float32)] * 4,
        interpret=interpret,
    )(z2, labels1)
    return xent, lse


def _impl_bwd(z2, labels1, lse, g, confidence, low_confidence, interpret):
    r, v = z2.shape
    rows = min(_ROWS, r)
    vb = min(_VBLOCK, v)
    grid = (-(-r // rows), -(-v // vb))
    kernel = functools.partial(_bwd_kernel, confidence=confidence,
                               low_confidence=low_confidence, vocab=v)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, vb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            _row_spec(rows),
            _row_spec(rows),
            _row_spec(rows),
        ],
        out_specs=pl.BlockSpec((rows, vb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, v), z2.dtype),
        interpret=interpret,
    )(z2, labels1, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_xent(z2, labels1, confidence, low_confidence, interpret):
    xent, _ = _impl_fwd(z2, labels1, confidence, low_confidence, interpret)
    return xent


def _xent_fwd(z2, labels1, confidence, low_confidence, interpret):
    xent, lse = _impl_fwd(z2, labels1, confidence, low_confidence,
                          interpret)
    return xent, (z2, labels1, lse)


def _xent_bwd(confidence, low_confidence, interpret, res, g):
    z2, labels1, lse = res
    dz = _impl_bwd(z2, labels1, lse, g, confidence, low_confidence,
                   interpret)
    return dz, np.zeros(labels1.shape, jax.dtypes.float0)


_fused_xent.defvjp(_xent_fwd, _xent_bwd)


def fused_softmax_xent(logits, labels, confidence: float,
                       low_confidence: float, interpret: bool = None):
    """Per-token label-smoothed cross entropy WITHOUT the normalizing
    constant (the criterion subtracts it outside).

    logits [..., V] (any float dtype), labels [...] int32.
    Returns float32 [...] per-token xent.  Differentiable wrt logits.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    v = logits.shape[-1]
    lead = logits.shape[:-1]
    z2 = logits.reshape(-1, v)
    labels1 = labels.reshape(-1, 1).astype(jnp.int32)
    xent = _fused_xent(z2, labels1, float(confidence),
                       float(low_confidence), interpret)
    return xent.reshape(lead)


# --------------------------------------------------------------------- #
# Fused PROJECTION + label-smoothed CE ("linear cross entropy"):
# the [R, V] logits tensor never touches HBM.
#
# The XLA criterion path at transformer_base [256, 128] materializes the
# float32 [B, T, V] logits (4 GB) TWICE (forward + rematerialized
# backward) and streams it through four more fusions — ~37 ms of the
# 186 ms step, all HBM-bound (tools/PROFILE_train_step.json).  These
# kernels compute z = x @ W^T blockwise in VMEM:
#
#   forward:  grid (row blocks, vocab blocks); W [V, D] stays RESIDENT
#     in VMEM (32 MB bf16 at transformer_base) across the whole grid;
#     each cell takes one [br, D] x [D, vb] MXU dot and updates online
#     (max, sumexp, z_label, sum_z) scratch; the last vocab block emits
#     xent and logsumexp [R, 1].
#   backward: recomputes z per cell IN FLOAT32 ACCUMULATION (exactly
#     the forward dot — gradients are exact, nothing is stored except
#     the [R, 1] logsumexp), forms dz in registers, and feeds two MXU
#     dots: dx_acc += dz @ W_j and dW_j += dz^T @ x_i, accumulated in
#     VMEM scratch ([br, D] and the full [V, D] f32 at 64 MB).
#
# Cost model per step at [R=32768, D=512, V=32768]: fwd 1.1 TFLOP,
# bwd 3.3 TFLOP (recompute + two grad dots), ~1.3 GB total traffic —
# vs the XLA path's ~24 GB.  The recompute costs ~5 ms of MXU time and
# buys exact f32-accumulated gradients (a stored-bf16-z variant was
# rejected: |z| ~ 20 gives bf16 rounding ~0.06, a ~6% relative error
# on the top probabilities).
# --------------------------------------------------------------------- #

_LROWS = 1024    # row block (R padded to a multiple via OOB masking)
_LVBLOCK = 2048  # vocab block


def _linear_fwd_kernel(x_ref, w_ref, bias_ref, label_ref,
                       xent_ref, lse_ref, m_sc, l_sc, zy_sc, sz_sc, *,
                       confidence: float, low_confidence: float,
                       vocab: int, vb: int):
    """grid = (row_blocks, vocab_blocks), vocab inner; W resident."""
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        zy_sc[:] = jnp.zeros_like(zy_sc)
        sz_sc[:] = jnp.zeros_like(sz_sc)

    x = x_ref[:]                                   # [br, D], input dtype
    rows = x.shape[0]
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    w = w_ref[pl.ds(j * vb, vb), :]                # [vb, D]
    z = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    z = z + bias_ref[:, pl.ds(j * vb, vb)]         # [1, vb] f32
    label = label_ref[:]                           # [br, 1] int32
    col = j * vb + jax.lax.broadcasted_iota(jnp.int32, (rows, vb), 1)
    valid = col < vocab                            # ragged final block
    z = jnp.where(valid, z, NEG_INF)
    m_prev = m_sc[:]
    m_new = jnp.maximum(m_prev, jnp.max(z, axis=1, keepdims=True))
    l_sc[:] = l_sc[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(z - m_new), axis=1, keepdims=True)
    m_sc[:] = m_new
    onehot = col == label
    zy_sc[:] = zy_sc[:] + jnp.sum(jnp.where(onehot, z, 0.0), axis=1,
                                  keepdims=True)
    sz_sc[:] = sz_sc[:] + jnp.sum(jnp.where(valid, z, 0.0), axis=1,
                                  keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        lse = m_sc[:] + jnp.log(jnp.maximum(l_sc[:], 1e-37))
        xent_ref[:] = (-(confidence - low_confidence) * (zy_sc[:] - lse)
                       - low_confidence * (sz_sc[:] - vocab * lse))
        lse_ref[:] = lse


def _linear_bwd_kernel(x_ref, w_ref, bias_ref, label_ref, lse_ref, g_ref,
                       dx_ref, dw_ref, db_ref, dx_sc, dw_sc, db_sc, *,
                       confidence: float, low_confidence: float,
                       vocab: int, rows_total: int):
    """grid = (row_blocks, vocab_blocks), vocab inner.  Recomputes z
    (same dot, same f32 accumulation -> identical probabilities), forms
    dz in registers, accumulates dx ([br, D] scratch, one row block)
    and dW/db (full [V, D] / [1, V] f32 scratch across all cells)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dx_sc[:] = jnp.zeros_like(dx_sc)

    x = x_ref[:]                                   # [br, D]
    rows, vb = x.shape[0], dw_ref.shape[0]
    # zero the ragged final row block's out-of-range rows at the
    # source: their contents are UNSPECIFIED padding, and even though
    # dz is masked to zero there, 0 * garbage = NaN inside the dW dot
    row1 = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    x = jnp.where(row1 < rows_total, x, jnp.zeros_like(x))
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    w = w_ref[:]                                   # [vb, D] (blocked)
    z = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    z = z + bias_ref[:, pl.ds(j * vb, vb)]
    label = label_ref[:]                           # [br, 1]
    lse = lse_ref[:]                               # [br, 1] f32
    g = g_ref[:]                                   # [br, 1] f32
    col = j * vb + jax.lax.broadcasted_iota(jnp.int32, (rows, vb), 1)
    valid = col < vocab
    p = jnp.exp(jnp.where(valid, z, NEG_INF) - lse)
    onehot = (col == label).astype(jnp.float32)
    dz = g * ((confidence - low_confidence) * (p - onehot)
              + low_confidence * (vocab * p - 1.0))
    # mask ragged vocab lanes AND ragged tail rows (the final row
    # block's out-of-range rows hold unspecified x/g/label padding and
    # must not leak into dW/db)
    row = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, vb), 0)
    dz = jnp.where(jnp.logical_and(valid, row < rows_total), dz, 0.0)
    dzc = dz.astype(x.dtype)
    dx_sc[:] = dx_sc[:] + jax.lax.dot_general(
        dzc, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == 0)
    def _():
        dw_sc[pl.ds(j * vb, vb), :] = jnp.zeros((vb, dw_sc.shape[1]),
                                                jnp.float32)
        db_sc[:, pl.ds(j * vb, vb)] = jnp.zeros((1, vb), jnp.float32)

    dw_sc[pl.ds(j * vb, vb), :] = dw_sc[pl.ds(j * vb, vb), :] + \
        jax.lax.dot_general(dzc, x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    db_sc[:, pl.ds(j * vb, vb)] = db_sc[:, pl.ds(j * vb, vb)] + \
        jnp.sum(dz, axis=0, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        dx_ref[:] = dx_sc[:].astype(dx_ref.dtype)

    @pl.when(i == ni - 1)
    def _():
        dw_ref[:] = dw_sc[pl.ds(j * vb, vb), :].astype(dw_ref.dtype)
        db_ref[:] = db_sc[:].astype(db_ref.dtype)


def _linear_shapes(r, vpad, d):
    """vpad is the PADDED vocab (a multiple of the vocab block): the
    wrapper pads w/bias so the forward's manual slices of the
    VMEM-resident W never go out of bounds (Pallas masks only
    BlockSpec-level raggedness, not in-kernel pl.ds slices)."""
    br = min(_LROWS, _round_up_8(r))
    vb = min(_LVBLOCK, vpad)
    assert vpad % vb == 0, (vpad, vb)
    return br, vb, -(-r // br), vpad // vb


def _round_up_8(x):
    return ((x + 7) // 8) * 8


def _linear_fwd_impl(x2, w, bias2, labels1, confidence, low_confidence,
                     vocab, interpret):
    r, d = x2.shape
    v = w.shape[0]  # padded
    br, vb, ni, nv = _linear_shapes(r, v, d)
    kernel = functools.partial(
        _linear_fwd_kernel, confidence=confidence,
        low_confidence=low_confidence, vocab=vocab, vb=vb)
    xent, lse = pl.pallas_call(
        kernel,
        grid=(ni, nv),
        in_specs=[
            pl.BlockSpec((br, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),   # W resident
            pl.BlockSpec((1, v), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec_ij(br),
        ],
        out_specs=[_row_spec_ij(br), _row_spec_ij(br)],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((br, 1), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x2, w, bias2, labels1)
    return xent, lse


def _row_spec_ij(rows):
    return pl.BlockSpec((rows, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _linear_bwd_impl(x2, w, bias2, labels1, lse, g, confidence,
                     low_confidence, vocab, interpret):
    r, d = x2.shape
    v = w.shape[0]  # padded
    br, vb, ni, nv = _linear_shapes(r, v, d)
    kernel = functools.partial(
        _linear_bwd_kernel, confidence=confidence,
        low_confidence=low_confidence, vocab=vocab, rows_total=r)
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(ni, nv),
        in_specs=[
            pl.BlockSpec((br, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),   # W blocked
            pl.BlockSpec((1, v), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec_ij(br),
            _row_spec_ij(br),
            _row_spec_ij(br),
        ],
        out_specs=[
            pl.BlockSpec((br, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((v, d), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((br, d), jnp.float32),
            pltpu.VMEM((v, d), jnp.float32),
            pltpu.VMEM((1, v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x2, w, bias2, labels1, lse, g)
    return dx, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_linear_xent(x2, w, bias2, labels1, confidence, low_confidence,
                       vocab, interpret):
    xent, _ = _linear_fwd_impl(x2, w, bias2, labels1, confidence,
                               low_confidence, vocab, interpret)
    return xent


def _linear_xent_fwd(x2, w, bias2, labels1, confidence, low_confidence,
                     vocab, interpret):
    xent, lse = _linear_fwd_impl(x2, w, bias2, labels1, confidence,
                                 low_confidence, vocab, interpret)
    return xent, (x2, w, bias2, labels1, lse)


def _linear_xent_bwd(confidence, low_confidence, vocab, interpret, res, g):
    x2, w, bias2, labels1, lse = res
    dx, dw, db = _linear_bwd_impl(x2, w, bias2, labels1, lse,
                                  g.astype(jnp.float32), confidence,
                                  low_confidence, vocab, interpret)
    return (dx, dw.astype(w.dtype), db.astype(bias2.dtype),
            np.zeros(labels1.shape, jax.dtypes.float0))


_fused_linear_xent.defvjp(_linear_xent_fwd, _linear_xent_bwd)


def linear_xent_reference(x, w, labels, confidence, low_confidence,
                          bias=None):
    """Plain-jnp projection + label-smoothed xent (the exact formula
    the kernels implement; semantics of WordEmbedding.attend followed
    by LabelSmoothedCrossEntropy).  Used off-TPU and by the tests."""
    logits = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    v = w.shape[0]
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    label_z = jnp.take_along_axis(
        logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    sum_z = jnp.sum(logits, axis=-1)
    return (-(confidence - low_confidence) * (label_z - lse)
            - low_confidence * (sum_z - v * lse))


def fused_linear_ce_available(vocab_size: int, dim: int) -> bool:
    return (jax.default_backend() == "tpu"
            and vocab_size % 128 == 0 and dim % 128 == 0)


def fused_linear_xent(x, w, labels, confidence: float,
                      low_confidence: float, bias=None,
                      interpret: bool = None):
    """Per-token label-smoothed cross entropy of ``x @ w.T (+ bias)``
    WITHOUT materializing the logits (and WITHOUT the normalizing
    constant — the criterion subtracts it outside).

    x [..., D] (any float dtype), w [V, D] (cast to x.dtype, matching
    WordEmbedding.attend), labels [...] int32, bias [V] f32 or None.
    Returns float32 [...] per-token xent.  Differentiable wrt x, w and
    bias (backward recomputes z in f32 accumulation — exact).
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return linear_xent_reference(x, w, labels, confidence,
                                         low_confidence, bias=bias)
        interpret = False
    d = x.shape[-1]
    v = w.shape[0]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    w2 = w.astype(x.dtype)
    labels1 = labels.reshape(-1, 1).astype(jnp.int32)
    bias2 = (jnp.zeros((1, v), jnp.float32) if bias is None
             else bias.astype(jnp.float32).reshape(1, v))
    # pad the vocab dim to a multiple of the vocab block: the forward
    # keeps W resident in VMEM and slices it manually per block
    vb = min(_LVBLOCK, ((v + 127) // 128) * 128)
    vpad = -(-v // vb) * vb
    if vpad != v:
        w2 = jnp.pad(w2, [(0, vpad - v), (0, 0)])
        bias2 = jnp.pad(bias2, [(0, 0), (0, vpad - v)])
    xent = _fused_linear_xent(x2, w2, bias2, labels1, float(confidence),
                              float(low_confidence), v, interpret)
    return xent.reshape(lead)
