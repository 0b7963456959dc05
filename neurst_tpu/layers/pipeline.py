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
"""Pipeline parallelism over the mesh's "stage" axis (GPipe schedule).

Beyond-reference capability: the reference scales only by data
parallelism (/root/reference/neurst/training/distribution_utils.py);
here deep stacks can additionally be split across devices by LAYERS.

TPU-first design (no host scheduler, no sends/recvs in Python):
  * layer parameters are stacked ``[num_stages, layers_per_stage, ...]``
    — the stage axis carries the logical name "stage" and is sharded
    over the mesh's "stage" axis, so each device group holds only its
    own stage's weights;
  * one pipeline tick applies every stage in parallel via ``nn.vmap``
    over the stage axis (SPMD: each stage's devices run only their
    shard) and then shifts activations stage->stage+1 with ``jnp.roll``
    on the stage-sharded axis, which XLA lowers to a neighbour
    ``collective-permute`` riding ICI;
  * the batch is split into M microbatches; ``lax.scan`` over
    ``M + S - 1`` ticks realizes the GPipe fill/steady/drain schedule.
    Bubble fraction = (S-1)/(M+S-1).  Microbatch m leaves the last
    stage at tick ``m + S - 1``; those outputs are the scan's stacked
    ys, so garbage computed during fill/drain never reaches the loss
    and therefore contributes zero gradient;
  * the backward pass is jax.grad of the scan: the reverse-order ticks
    with transposed collective-permutes ARE the reverse pipeline
    schedule — no hand-written backward.

Composition: dp x pp x tp = mesh ("data", "stage", "model"): the batch
axis stays sharded over "data" inside every microbatch, tensor
parallelism applies within each stage's layers, and the gradient
all-reduce over "data" happens once per step as usual.

Scope: the training/teacher-forcing path.  Stepwise decode keeps the
dense scan/loop layout — converting a pipeline-trained checkpoint is a
reshape handled transparently by checkpoints._bridge_scan_layouts.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PipelinedEncoderLayers", "PipelinedDecoderLayers"]


def _stage_schedule(t, num_stages, num_microbatches):
    """Microbatch index processed by each stage at tick t (clipped into
    range; out-of-schedule stages compute garbage that is never
    collected)."""
    s = jnp.arange(num_stages)
    return jnp.clip(t - s, 0, num_microbatches - 1)


class _EncStageBody(nn.Module):
    """One pipeline stage: lax.scan over this stage's encoder layers."""
    layer_kwargs: tuple
    layers_per_stage: int

    @nn.compact
    def __call__(self, x, bias, is_training):
        from neurst_tpu.layers.encoders.transformer_encoder import \
            _ScanEncoderBody
        scan = nn.scan(
            _ScanEncoderBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=self.layers_per_stage,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(layer_kwargs=self.layer_kwargs, name="layers")
        x, _ = scan(x, bias, is_training, None, False, None, None)
        return x


class _DecStageBody(nn.Module):
    """One pipeline stage: lax.scan over this stage's decoder layers
    (teacher-forcing path: no cache)."""
    layer_kwargs: tuple
    layers_per_stage: int

    @nn.compact
    def __call__(self, x, self_bias, memory, memory_bias, is_training):
        from neurst_tpu.layers.decoders.transformer_decoder import \
            _ScanDecoderBody
        scan = nn.scan(
            _ScanDecoderBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,) + (nn.broadcast,) * 9,
            out_axes=0,
            length=self.layers_per_stage,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(layer_kwargs=self.layer_kwargs, name="layers")
        x, _ = scan(x, None, self_bias, memory, memory_bias, None,
                    is_training, False, None, None, "forward")
        return x


class _EncTick(nn.Module):
    """One pipeline tick (all stages in parallel + shift)."""
    layer_kwargs: tuple
    layers_per_stage: int
    num_stages: int
    num_microbatches: int

    @nn.compact
    def __call__(self, stage_buf, t, x_mb, bias_mb, is_training):
        S, M = self.num_stages, self.num_microbatches
        inject = x_mb[jnp.minimum(t, M - 1)]
        stage_buf = stage_buf.at[0].set(
            jnp.where(t < M, inject, stage_buf[0]))
        mb_idx = _stage_schedule(t, S, M)
        bias_s = jnp.take(bias_mb, mb_idx, axis=0)
        stages = nn.vmap(
            _EncStageBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, 0, None),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: "stage"},
        )(layer_kwargs=self.layer_kwargs,
          layers_per_stage=self.layers_per_stage, name="stages")
        out = stages(stage_buf, bias_s, is_training)
        # shift stage s -> s+1 (collective-permute over ICI when the
        # stage axis is sharded); stage 0's slot is refilled by the
        # next tick's injection
        return jnp.roll(out, 1, axis=0), out[S - 1]


class _DecTick(nn.Module):
    layer_kwargs: tuple
    layers_per_stage: int
    num_stages: int
    num_microbatches: int

    @nn.compact
    def __call__(self, stage_buf, t, x_mb, self_bias, memory_mb,
                 memory_bias_mb, is_training):
        S, M = self.num_stages, self.num_microbatches
        inject = x_mb[jnp.minimum(t, M - 1)]
        stage_buf = stage_buf.at[0].set(
            jnp.where(t < M, inject, stage_buf[0]))
        mb_idx = _stage_schedule(t, S, M)
        memory_s = (None if memory_mb is None
                    else jnp.take(memory_mb, mb_idx, axis=0))
        memory_bias_s = (None if memory_bias_mb is None
                         else jnp.take(memory_bias_mb, mb_idx, axis=0))
        stages = nn.vmap(
            _DecStageBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, None, 0 if memory_mb is not None else None,
                     0 if memory_bias_mb is not None else None, None),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: "stage"},
        )(layer_kwargs=self.layer_kwargs,
          layers_per_stage=self.layers_per_stage, name="stages")
        out = stages(stage_buf, self_bias, memory_s, memory_bias_s,
                     is_training)
        return jnp.roll(out, 1, axis=0), out[S - 1]


def _run_ticks(tick_cls, tick_fields, stage_buf, broadcast_args,
               num_stages, num_microbatches, name):
    ticks = nn.scan(
        tick_cls,
        variable_broadcast="params",
        split_rngs={"params": False, "dropout": True},
        in_axes=(0,) + (nn.broadcast,) * len(broadcast_args),
        out_axes=0,
        length=num_microbatches + num_stages - 1,
    )(**tick_fields, name=name)
    t = jnp.arange(num_microbatches + num_stages - 1)
    _, ys = ticks(stage_buf, t, *broadcast_args)
    # microbatch m exits the last stage at tick m + S - 1
    return ys[num_stages - 1:]


class PipelinedEncoderLayers(nn.Module):
    """The encoder layer stack, pipelined over ``num_stages``."""
    layer_kwargs: tuple
    num_layers: int
    num_stages: int
    num_microbatches: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias, is_training=False):
        S, M = self.num_stages, self.num_microbatches
        if self.is_initializing():
            M = 1  # shape-only init (e.g. batch-1 example inputs)
        if self.num_layers % S:
            raise ValueError(f"num_layers={self.num_layers} not divisible "
                             f"by pipeline_stages={S}")
        b = x.shape[0]
        if b % M:
            raise ValueError(f"batch {b} not divisible by "
                             f"pipeline_microbatches={M}")
        mb = b // M
        x_mb = x.reshape((M, mb) + x.shape[1:])
        bias_mb = jnp.broadcast_to(
            bias, (b,) + bias.shape[1:]).reshape((M, mb) + bias.shape[1:])
        stage_buf = jnp.zeros((S, mb) + x.shape[1:], x.dtype)
        ys = _run_ticks(
            _EncTick,
            dict(layer_kwargs=self.layer_kwargs,
                 layers_per_stage=self.num_layers // S,
                 num_stages=S, num_microbatches=M),
            stage_buf, (x_mb, bias_mb, is_training), S, M, name="pipeline")
        return ys.reshape((b,) + x.shape[1:])


class PipelinedDecoderLayers(nn.Module):
    """The decoder layer stack (teacher forcing), pipelined."""
    layer_kwargs: tuple
    num_layers: int
    num_stages: int
    num_microbatches: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, self_bias, memory, memory_bias,
                 is_training=False):
        S, M = self.num_stages, self.num_microbatches
        if self.is_initializing():
            M = 1  # shape-only init (e.g. batch-1 example inputs)
        if self.num_layers % S:
            raise ValueError(f"num_layers={self.num_layers} not divisible "
                             f"by pipeline_stages={S}")
        b = x.shape[0]
        if b % M:
            raise ValueError(f"batch {b} not divisible by "
                             f"pipeline_microbatches={M}")
        mb = b // M
        x_mb = x.reshape((M, mb) + x.shape[1:])
        memory_mb = None
        if memory is not None:
            memory_mb = memory.reshape((M, mb) + memory.shape[1:])
        memory_bias_mb = None
        if memory_bias is not None:
            memory_bias_mb = jnp.broadcast_to(
                memory_bias, (b,) + memory_bias.shape[1:]).reshape(
                (M, mb) + memory_bias.shape[1:])
        stage_buf = jnp.zeros((S, mb) + x.shape[1:], x.dtype)
        ys = _run_ticks(
            _DecTick,
            dict(layer_kwargs=self.layer_kwargs,
                 layers_per_stage=self.num_layers // S,
                 num_stages=S, num_microbatches=M),
            stage_buf, (x_mb, self_bias, memory_mb, memory_bias_mb,
                        is_training), S, M, name="pipeline")
        return ys.reshape((b,) + x.shape[1:])
