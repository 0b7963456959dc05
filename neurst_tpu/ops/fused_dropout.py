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
and the [*, T, dim] mask round-trips dominate).

Two generations of this op were measured on v5e:

  v1 (round 3): one Pallas kernel per site reading x and writing
    dropout(x), PRNG bits drawn in-kernel (one uint32 per element).
    Cut the step 254 -> 195 ms, but the per-site profile
    (tools/PROFILE_train_step.json) still attributed 45 ms/step to
    dropout — the kernel boundary forces an extra HBM round-trip of
    the activation on every site (producer fusion writes x, kernel
    reads x + writes y, consumer reads y) and pays one hardware-PRNG
    word per element.

  v2 (this file): the kernel only STREAMS RANDOM BYTES — one uint32
    draw per FOUR elements, bitcast to uint8, no activation operand —
    and the actual mask-compare + multiply happen in plain XLA, where
    they fuse into the producer of x (softmax epilogue, residual add):
    the activation never makes an extra HBM round-trip, and the mask
    costs 1 byte/element of traffic instead of 2x2 bytes.  Backward
    REGENERATES the identical bytes from the same (seed, block) pair
    via jax.custom_vjp — zero residual memory, same as v1.

Rate granularity: keep = (byte >= round(rate * 256)); the realized
drop rate is quantized to 1/256 (0.1 -> 0.1016) and the inverted-
dropout scale uses the REALIZED rate, so E[dropout(x)] == x exactly.

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


def _mask_kernel(seed_ref, o_ref):
    # per-block seeding keeps fwd and bwd bit-identical for the same
    # (seed, grid position) without any cross-block state; Mosaic
    # accepts at most two seed words, so the block id is hashed into
    # the second (odd-prime multiply keeps blocks distinct)
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (pl.program_id(0) * 1000003))
    rows, cols = o_ref.shape
    if rows % 4 == 0:
        # one uint32 word per 4 output bytes: bitcast unpacks along
        # the second-minor dim ([rows//4, cols] u32 -> [rows, cols] u8)
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((rows // 4, cols)), jnp.uint8)
    else:  # tiny ragged arrays: one word per byte (still correct)
        bits = (pltpu.bitcast(pltpu.prng_random_bits((rows, cols)),
                              jnp.uint32) & 0xFF).astype(jnp.uint8)
    o_ref[:] = bits


def _gen_mask_bytes(seed2, rows, cols):
    """[rows, cols] uint8 of hardware-PRNG bytes, deterministic in
    (seed2, shape) — forward and backward regenerate identical bytes."""
    # ~512K elements per block; rows a multiple of 8 for tiling (and
    # of 4 for the u32->u8 bitcast)
    block_rows = min(rows, max(8, ((1 << 19) // cols) // 8 * 8))
    grid = -(-rows // block_rows)
    return pl.pallas_call(
        _mask_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[],
            out_specs=pl.BlockSpec((block_rows, cols),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.uint8),
    )(seed2)


def _threshold_and_scale(rate: float):
    t8 = min(max(int(round(rate * 256.0)), 1), 255)
    realized_rate = t8 / 256.0
    return t8, 1.0 / (1.0 - realized_rate)


def _apply(x, seed2, rate: float):
    """Mask bytes from the kernel; compare+scale in XLA so they fuse
    into x's producer (no extra HBM round-trip of the activation).

    The tensor is viewed as [rows, last_dim] IN PLACE (callers
    guarantee last_dim % 128 == 0): no pad/ravel copies — an earlier
    pad-to-block version tripled the HBM traffic and ate the win.
    Ragged final blocks are handled by Pallas's out-of-bounds masking;
    forward and backward see identical (shape, grid) so the
    regenerated bytes match exactly.
    """
    orig_shape = x.shape
    cols = orig_shape[-1]
    rows = x.size // cols
    t8, inv_keep = _threshold_and_scale(rate)
    mask = _gen_mask_bytes(seed2, rows, cols)
    y = jnp.where(mask >= jnp.uint8(t8),
                  x.reshape(rows, cols) * jnp.asarray(inv_keep, x.dtype),
                  jnp.asarray(0.0, x.dtype))
    return y.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_dropout(x, seed2, rate):
    return _apply(x, seed2, rate)


def _fwd(x, seed2, rate):
    return _apply(x, seed2, rate), seed2


def _bwd(rate, seed2, g):
    # identical bytes -> identical mask; dx = g * mask / keep
    return (_apply(g, seed2, rate),
            np.zeros(seed2.shape, jax.dtypes.float0))


_fused_dropout.defvjp(_fwd, _bwd)


def fused_dropout(x, key, rate: float):
    """Inverted dropout with hardware-PRNG bytes (TPU backend only —
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
