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
"""Fused dropout on the TPU hardware PRNG (Pallas).

Dropout is nearly half the transformer_base train-step cost with JAX's
default counter-based threefry PRNG (measured on v5e: 254 ms/step with
dropout vs 140 ms without at [256, 128]; the threefry bit generation
and the [*, T, dim] mask round-trips dominate).  This kernel

  * draws mask bits from the on-core hardware PRNG
    (``pltpu.prng_random_bits``) — orders of magnitude cheaper than
    threefry on the VPU, and
  * never materializes the mask in HBM: the backward pass REGENERATES
    the identical bits from the same (seed, block) pair via a
    ``jax.custom_vjp``, so dropout costs one elementwise read+write in
    each direction and zero residual memory.

Off-TPU (tests, CPU smoke runs) callers fall back to the stock
``jax.random.bernoulli`` path (see layers.common_layers.apply_dropout)
— the two paths draw different bits, so numerical-parity tests must
disable dropout (they already do).  The Pallas interpreters stub the
hardware PRNG (zeros), so this op requires a real TPU backend; its
tests run only on-device.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_dropout", "fused_dropout_available"]

def fused_dropout_available() -> bool:
    return jax.default_backend() == "tpu"


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int,
                    inv_keep: float):
    # per-block seeding keeps fwd and bwd bit-identical for the same
    # (seed, grid position) without any cross-block state; Mosaic
    # accepts at most two seed words, so the block id is hashed into
    # the second (odd-prime multiply keeps blocks distinct)
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (pl.program_id(0) * 1000003))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits >= jnp.uint32(threshold)
    o_ref[:] = jnp.where(keep, x_ref[:] * inv_keep, 0.0).astype(o_ref.dtype)


def _apply(x, seed2, rate: float):
    """Elementwise dropout via the kernel.

    The tensor is viewed as [rows, last_dim] IN PLACE (callers
    guarantee last_dim % 128 == 0): no pad/ravel copies — an earlier
    pad-to-block version tripled the HBM traffic and ate the win.
    Ragged final blocks are handled by Pallas's out-of-bounds masking;
    forward and backward see identical (shape, grid) so the
    regenerated bits match exactly.
    """
    orig_shape = x.shape
    cols = orig_shape[-1]
    rows = x.size // cols
    # ~512K elements per block, rows a multiple of 8 for tiling
    block_rows = min(rows, max(8, ((1 << 19) // cols) // 8 * 8))
    grid = -(-rows // block_rows)
    threshold = min(int(round(rate * 4294967296.0)), 4294967295)
    kernel = functools.partial(_dropout_kernel, threshold=threshold,
                               inv_keep=1.0 / (1.0 - rate))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, cols),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, cols),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, cols), x.dtype),
    )(seed2, x.reshape(rows, cols))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_dropout(x, seed2, rate):
    return _apply(x, seed2, rate)


def _fwd(x, seed2, rate):
    return _apply(x, seed2, rate), seed2


def _bwd(rate, seed2, g):
    # identical bits -> identical mask; dx = g * mask / keep
    return (_apply(g, seed2, rate),
            np.zeros(seed2.shape, jax.dtypes.float0))


_fused_dropout.defvjp(_fwd, _bwd)


def fused_dropout(x, key, rate: float):
    """Inverted dropout with hardware-PRNG bits (TPU backend only —
    the Pallas interpreters stub the PRNG).

    ``key``: a jax PRNG key (each call site must pass a fresh key, as
    with ``jax.random.bernoulli``).  Requires ``x.shape[-1]`` to be a
    multiple of 128 (lane width); callers gate on that.  Returns an
    array like x.
    """
    if rate <= 0.0:
        return x
    assert x.shape[-1] % 128 == 0, x.shape
    seed2 = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2]
    return _fused_dropout(x, seed2, rate)
