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
"""Fused position-wise FFN (dense1 -> relu -> dropout -> dense2) for
TPU (Pallas, custom VJP): the [R, filter] hidden tensor never touches
HBM.

The per-op profile (tools/PROFILE_train_step.json) put the FFN region
at ~38.5 ms of the 175 ms transformer_base [256, 128] step against a
~29 ms MXU floor: the [32768, 2048] hidden materializes in bf16
(128 MB) once per direction per layer, the relu-dropout select runs as
its own HBM pass (activation + u8 mask + output, ~320 MB/site), and
the dW dots re-read it.  These kernels keep the hidden in VMEM:

  forward:  grid over row blocks; W1 [D, F], W2 [F, D] and biases stay
    RESIDENT in VMEM (4 MB bf16 at transformer_base); each cell runs
    z1 = x @ W1 + b1 (f32 accumulation), relu, inverted dropout from
    the on-core hardware PRNG (one u32 draw per FOUR hidden elements,
    bitcast to bytes — same scheme as ops/fused_dropout.py), and
    y = h~ @ W2 + b2.  Only x is read and y written: 64 MB of traffic
    per layer instead of ~600.
  backward: FOUR MXU dots per cell (dW2, dh~, dW1, dx) — the
    forward saves the post-dropout hidden hd in the compute dtype
    (the dW2 dot consumed exactly that array, and sign(hd) encodes
    both the relu and the dropout masks), so nothing is recomputed
    and the gradients are IDENTICAL to a recompute backward.  dW1/dW2
    accumulate in full-size f32 VMEM scratch (8 MB), db1/db2 in lane
    vectors, dx per row block.  (A recompute variant measured 2.18
    ms/layer vs 1.4 for this one at [32768, 512, 2048]; the hd
    residual costs 128 MB HBM per layer — what the unfused path
    materialized anyway.)

Dropout follows fused_dropout v2 semantics: the realized rate is
quantized to 1/256 and the inverted-dropout scale uses the REALIZED
rate, so E[out] == relu(z1) @ W2 exactly; forward and backward draw
identical bytes from (seed, row-block) so no mask is ever stored.

Only the relu activation is fused (transformer_base/speech defaults);
callers gate on it.  Off-TPU callers use the plain jnp path (the
math is identical; see common_layers.TransformerFFN).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ffn", "fused_ffn_available"]

_ROWS = 1024


def fused_ffn_available(d: int, f: int, activation: str,
                        rows: int, is_training: bool = True,
                        dropout_rate: float = 0.0) -> bool:
    """The kernels hold W1+W2 (+ their f32 grad accumulators in the
    backward) in VMEM and only implement the relu activation; tiny row
    counts (decode steps) stay on the XLA path where fusion wins.

    The row threshold per mode comes from the MEASURED win-region
    table (ops/kernel_gates.json, written by tools/sweep_kernel_gates.py
    on real hardware) rather than a guessed constant: round 4 shipped a
    ``rows >= 1024`` guess that silently engaged this training kernel
    inside the decode-time speech encoder (d=256, rows=4096) where XLA
    fusion wins, costing 23% of headline decode throughput.  The
    fallback when no sweep artifact exists is the conservative one —
    training only (the kernel's win is fwd+bwd HBM traffic; it was
    never measured to win any inference shape)."""
    if not (jax.default_backend() == "tpu"
            and activation == "relu"
            and d % 128 == 0 and f % 128 == 0
            and d * f * 8 <= 24 * 2**20):
        return False
    from neurst_tpu.ops.kernel_gates import gate_min_rows
    if not is_training:
        mode = "infer"
    elif dropout_rate and dropout_rate > 0.0:
        # the in-kernel hardware-PRNG dropout is the kernel's main win
        # over "XLA matmuls + standalone dropout kernel" — measured
        # separately from the no-dropout train mode
        mode = "train_drop"
    else:
        mode = "train"
    min_rows = gate_min_rows("fused_ffn", mode, d=d)
    return min_rows is not None and rows >= min_rows


def _threshold_and_scale(rate: float):
    if rate <= 0.0:
        return 0, 1.0
    t8 = min(max(int(round(rate * 256.0)), 1), 255)
    return t8, 1.0 / (1.0 - t8 / 256.0)


def _keep_mask(seed_ref, i, shape, t8):
    """[rows, f] keep mask from the hardware PRNG, deterministic in
    (seed, row-block): forward and backward regenerate identical
    bytes.  One u32 draw per 4 bytes (rows is a multiple of 8)."""
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (i * 1000003))
    rows, f = shape
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((rows // 4, f)), jnp.uint8)
    # Mosaic has no u8 vector compare ("Target does not support this
    # comparison") — widen to i32 for the threshold test
    return bits.astype(jnp.int32) >= jnp.int32(t8)


def _ffn_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    y_ref, hd_ref=None, *, t8: int, inv_keep: float,
                    save_hidden: bool):
    i = pl.program_id(0)
    x = x_ref[:]
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    z1 = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    z1 = z1 + b1_ref[:]
    h = jnp.maximum(z1, 0.0)
    if t8:
        keep = _keep_mask(seed_ref, i, h.shape, t8)
        h = jnp.where(keep, h * inv_keep, 0.0)
    hd = h.astype(x.dtype)
    y = jax.lax.dot_general(
        hd, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    y_ref[:] = (y + b2_ref[:]).astype(y_ref.dtype)
    if save_hidden:
        # training residual: the dW2 dot consumed hd in x.dtype, and
        # sign(hd) encodes BOTH the relu and the dropout masks, so the
        # backward needs no z1 recompute and no PRNG regeneration —
        # the resulting gradients are IDENTICAL to recompute
        hd_ref[:] = hd


def _ffn_bwd_kernel(x_ref, w1_ref, w2_ref, hd_ref, dy_ref,
                    dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref,
                    dw1_sc, dw2_sc, db1_sc, db2_sc, *,
                    t8: int, inv_keep: float, rows_total: int):
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    x = x_ref[:]
    rows = x.shape[0]
    # zero unspecified tail-row padding at the source (0*garbage = NaN
    # inside the dW dots otherwise)
    row1 = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    rmask = row1 < rows_total
    x = jnp.where(rmask, x, jnp.zeros_like(x))
    dy = jnp.where(rmask, dy_ref[:].astype(jnp.float32), 0.0)
    hd = jnp.where(rmask, hd_ref[:], jnp.zeros_like(hd_ref[:]))
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    @pl.when(i == 0)
    def _():
        dw1_sc[:] = jnp.zeros_like(dw1_sc)
        dw2_sc[:] = jnp.zeros_like(dw2_sc)
        db1_sc[:] = jnp.zeros_like(db1_sc)
        db2_sc[:] = jnp.zeros_like(db2_sc)

    dyc = dy.astype(x.dtype)
    # dW2 += hd^T dy ; db2 += sum dy
    dw2_sc[:] = dw2_sc[:] + jax.lax.dot_general(
        hd, dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    db2_sc[:] = db2_sc[:] + jnp.sum(dy, axis=0, keepdims=True)
    # dh~ = dy W2^T ; dh = dh~ * keep*inv * relu'(z1), where
    # keep*relu' == [hd > 0] exactly (kept AND positive)
    dhd = jax.lax.dot_general(
        dyc, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    scale = inv_keep if t8 else 1.0
    # (bf16 vector compares are unsupported on this target — compare
    # in f32; sign is preserved exactly by the widening)
    dh = jnp.where(hd.astype(jnp.float32) > 0.0, dhd * scale, 0.0)
    dhc = dh.astype(x.dtype)
    # dW1 += x^T dh ; db1 += sum dh ; dx = dh W1^T
    dw1_sc[:] = dw1_sc[:] + jax.lax.dot_general(
        x, dhc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    db1_sc[:] = db1_sc[:] + jnp.sum(dh, axis=0, keepdims=True)
    dx_ref[:] = jax.lax.dot_general(
        dhc, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(dx_ref.dtype)

    @pl.when(i == ni - 1)
    def _():
        dw1_ref[:] = dw1_sc[:]
        dw2_ref[:] = dw2_sc[:]
        db1_ref[:] = db1_sc[:]
        db2_ref[:] = db2_sc[:]


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _resident(shape):
    # index map takes (grid idx, scalar-prefetch ref, ...) — constant
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _ffn_fwd_impl(x2, w1, b1, w2, b2, seed2, t8, inv_keep, interpret,
                  save_hidden):
    """-> y [r, d]; with save_hidden also the post-dropout hidden
    hd [r, f] (the training residual that makes the backward
    recompute-free)."""
    r, d = x2.shape
    f = w1.shape[1]
    br = min(_ROWS, ((r + 7) // 8) * 8)
    kernel = functools.partial(_ffn_fwd_kernel, t8=t8, inv_keep=inv_keep,
                               save_hidden=save_hidden)
    row_spec = pl.BlockSpec((br, d), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    hid_spec = pl.BlockSpec((br, f), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-r // br),),
            in_specs=[
                row_spec,
                _resident((d, f)), _resident((1, f)),
                _resident((f, d)), _resident((1, d)),
            ],
            out_specs=[row_spec, hid_spec] if save_hidden
            else [row_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((r, d), x2.dtype)]
        + ([jax.ShapeDtypeStruct((r, f), x2.dtype)] if save_hidden
           else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed2, x2, w1, b1, w2, b2)
    return (out[0], out[1]) if save_hidden else (out[0], None)


def _ffn_bwd_impl(x2, w1, w2, hd, dy, t8, inv_keep, interpret):
    r, d = x2.shape
    f = w1.shape[1]
    br = min(_ROWS, ((r + 7) // 8) * 8)
    kernel = functools.partial(_ffn_bwd_kernel, t8=t8,
                               inv_keep=inv_keep, rows_total=r)
    return pl.pallas_call(
        kernel,
        grid=(-(-r // br),),
        in_specs=[
                pl.BlockSpec((br, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                _resident((d, f)),
                _resident((f, d)),
                pl.BlockSpec((br, f), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        out_specs=[
                pl.BlockSpec((br, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                _resident((d, f)), _resident((f, d)),
                _resident((1, f)), _resident((1, d)),
            ],
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, w1, w2, hd, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_ffn(x2, w1, b1, w2, b2, seed2, t8, inv_keep, interpret):
    y, _ = _ffn_fwd_impl(x2, w1, b1, w2, b2, seed2, t8, inv_keep,
                         interpret, save_hidden=False)
    return y


def _ffn_fwd(x2, w1, b1, w2, b2, seed2, t8, inv_keep, interpret):
    y, hd = _ffn_fwd_impl(x2, w1, b1, w2, b2, seed2, t8, inv_keep,
                          interpret, save_hidden=True)
    return y, (x2, w1, b1, w2, hd)


def _ffn_bwd(t8, inv_keep, interpret, res, dy):
    x2, w1, b1, w2, hd = res
    dx, dw1, dw2, db1, db2 = _ffn_bwd_impl(
        x2, w1, w2, hd, dy, t8, inv_keep, interpret)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b1.dtype),
            np.zeros((2,), jax.dtypes.float0))


_fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def fused_ffn(x, w1, b1, w2, b2, dropout_rate: float = 0.0,
              dropout_key=None, interpret: bool = None):
    """relu FFN with in-kernel hidden + dropout: y = dropout(relu(
    x @ w1 + b1)) @ w2 + b2, hidden never in HBM.

    x [..., D] (bf16/f32); w1 [D, F], w2 [F, D] (cast to x.dtype like
    the dense layers they replace); b1 [F], b2 [D] float32.
    Differentiable wrt x/w1/b1/w2/b2 (the forward saves the
    post-dropout hidden; gradients equal the recompute backward
    exactly).  ``dropout_rate > 0`` needs the TPU
    hardware PRNG (callers gate; interpret mode stubs it to zeros).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t8, inv_keep = _threshold_and_scale(float(dropout_rate or 0.0))
    if t8 and interpret:
        raise NotImplementedError(
            "fused_ffn dropout needs the TPU hardware PRNG")
    if t8:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 needs a dropout_key")
        seed2 = jax.random.key_data(dropout_key).astype(
            jnp.uint32).reshape(-1)[:2]
    else:
        seed2 = jnp.zeros([2], jnp.uint32)
    d = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    y = _fused_ffn(x2, w1.astype(x.dtype),
                   b1.astype(jnp.float32).reshape(1, -1),
                   w2.astype(x.dtype),
                   b2.astype(jnp.float32).reshape(1, -1),
                   seed2, t8, inv_keep, interpret)
    return y.reshape(lead + (d,))
