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
"""Ring attention: sequence-parallel attention over the device mesh.

A NEW TPU-native capability beyond the reference (SURVEY.md §5/§7: the
reference has no sequence/context parallelism; long audio was only
managed by subsampling + bucketing).  Here the sequence axis is sharded
over a mesh axis; each device holds a q shard and rotates k/v shards
around the ring with ``lax.ppermute`` (ICI traffic only), combining
partial results with an online softmax — attention over sequences far
longer than one chip's HBM.

Implemented with ``shard_map`` + jnp (XLA overlaps the permute with
compute); a pallas RDMA variant can drop in later without changing the
interface.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_self_attention"]

NEG_INF = -1.0e30


def _ring_kernel(q, k, v, lengths, axis_name: str, causal: bool):
    """Per-device body. q/k/v: [B, T_local, N, H]; lengths [B]."""
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, t_local, n, h = q.shape
    scale = h ** -0.5
    q32 = q.astype(jnp.float32) * scale
    q_pos = my * t_local + jnp.arange(t_local)           # global q rows

    perm = [(i, (i + 1) % p) for i in range(p)]

    def combine(i, acc, m_prev, l_prev, k_blk, v_blk):
        src = (my - i) % p                                # block owner
        kv_pos = src * t_local + jnp.arange(t_local)      # global kv cols
        s = jnp.einsum("BqNH,BkNH->BNqk", q32,
                       k_blk.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        mask = (kv_pos[None, :] < lengths[:, None])[:, None, None, :]
        if causal:
            mask = jnp.logical_and(
                mask, (kv_pos[None, :] <= q_pos[:, None])[None, None, :, :])
        s = jnp.where(mask, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        pexp = jnp.exp(s - m_new[..., None])
        pexp = jnp.where(mask, pexp, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(pexp, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "BNqk,BkNH->BNqH", pexp, v_blk.astype(jnp.float32))
        return acc, m_new, l_new

    def step(i, carry):
        acc, m_prev, l_prev, k_blk, v_blk = carry
        acc, m_new, l_new = combine(i, acc, m_prev, l_prev, k_blk, v_blk)
        # rotate kv to the next device (ICI ring)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return acc, m_new, l_new, k_blk, v_blk

    init = (jnp.zeros((b, n, t_local, h), jnp.float32),
            jnp.full((b, n, t_local), NEG_INF, jnp.float32),
            jnp.zeros((b, n, t_local), jnp.float32), k, v)
    # p-1 rotated rounds, then the last block in place — the final
    # ppermute would only restore the original layout, pure wasted ICI.
    acc, m, l, k_last, v_last = jax.lax.fori_loop(0, p - 1, step, init)
    acc, m, l = combine(p - 1, acc, m, l, k_last, v_last)
    out = acc / jnp.maximum(l, 1e-20)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)      # [B, T, N, H]


def ring_self_attention(q, k, v, mesh: Optional[Mesh] = None,
                        seq_axis: str = "data",
                        lengths: Optional[jnp.ndarray] = None,
                        causal: bool = False):
    """Attention with the sequence dim sharded over `seq_axis`.

    q/k/v: [B, T, N, H] with T divisible by the axis size; `lengths` [B]
    marks valid key positions (global).  Returns [B, T, N, H] with the
    same sharding.  With ``mesh=None`` the ambient mesh (the enclosing
    ``with mesh:`` block, e.g. the trainer's) is used — this is how the
    encoder's ``enable_ring_attention`` flag reaches the op.
    """
    if mesh is None:
        from jax._src.mesh import thread_resources
        mesh = thread_resources.env.physical_mesh
        if mesh.empty:
            raise ValueError(
                "ring_self_attention needs a device mesh: call under "
                "`with mesh:` or pass mesh= explicitly")
    if lengths is None:
        lengths = jnp.full((q.shape[0],), q.shape[1], jnp.int32)
    try:
        from jax import shard_map
        rep_kw = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}
    fn = shard_map(
        functools.partial(_ring_kernel, axis_name=seq_axis, causal=causal),
        mesh=mesh,
        in_specs=(P(None, seq_axis), P(None, seq_axis), P(None, seq_axis),
                  P()),
        out_specs=P(None, seq_axis),
        **rep_kw)
    return fn(q, k, v, lengths.astype(jnp.int32))
