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
