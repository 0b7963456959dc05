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
"""Device mesh + sharding rules: the single replacement for all five of
the reference's DP backends (SURVEY.md §2.7 / §5).

The reference reaches data parallelism through tf.distribute/Horovod/
BytePS (``/root/reference/neurst/training/distribution_utils.py``).
Here one ``jax.sharding.Mesh`` with axes ("data", "model") covers:
  * data parallelism: batch sharded over "data"; XLA inserts the
    gradient all-reduce over ICI;
  * tensor parallelism: parameter logical axes ("mlp", "heads",
    "vocab") map to "model";
multi-host: ``jax.distributed.initialize`` + the same mesh spanning all
processes (DCN between slices).
"""

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "LOGICAL_AXIS_RULES", "logical_to_mesh_sharding",
           "params_shardings", "batch_sharding", "replicated"]

# logical axis name -> mesh axis (None = replicated)
LOGICAL_AXIS_RULES = (
    ("batch", "data"),
    ("vocab", "model"),
    ("embed", None),
    ("mlp", "model"),
    ("heads", "model"),
    ("head_dim", None),
    ("kv", None),
    ("conv_io", None),
    ("layers", None),   # scan-over-layers stacking axis (never sharded)
    ("stage", "stage"),  # pipeline-parallel stage axis (layers/pipeline.py)
    # expert parallelism (layers/moe.py): expert weights shard over the
    # same devices that hold the batch shards; XLA inserts the
    # dispatch/combine all-to-alls between batch- and expert-sharded
    # layouts
    ("expert", "data"),
    ("expert_logits", None),  # router output axis (tiny; replicated)
)


def make_mesh(data_parallel: Optional[int] = None,
              model_parallel: int = 1,
              pipeline_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Creates a ("data", "stage", "model") mesh over the available
    devices.  "stage" has size 1 unless pipeline parallelism is on, so
    dp/tp-only jobs see the same ("data", "model") semantics as before
    (size-1 axes never shard anything)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = model_parallel * pipeline_parallel
    if data_parallel is None:
        assert n % mp == 0, (
            f"{n} devices not divisible by "
            f"pp({pipeline_parallel}) x tp({model_parallel})")
        data_parallel = n // mp
    assert data_parallel * mp == n, (
        f"dp({data_parallel}) x pp({pipeline_parallel}) x "
        f"tp({model_parallel}) != devices({n})")
    dev_array = np.asarray(devices).reshape(
        data_parallel, pipeline_parallel, model_parallel)
    logging.info("Mesh: data=%d x stage=%d x model=%d over %d devices",
                 data_parallel, pipeline_parallel, model_parallel, n)
    return Mesh(dev_array, axis_names=("data", "stage", "model"))


def logical_to_mesh_spec(logical_spec) -> PartitionSpec:
    """Maps a logical PartitionSpec (axis names from layer annotations)
    to a mesh PartitionSpec via LOGICAL_AXIS_RULES."""
    rules = dict(LOGICAL_AXIS_RULES)
    if logical_spec is None:
        return PartitionSpec()
    axes = []
    for ax in logical_spec:
        if ax is None:
            axes.append(None)
        else:
            axes.append(rules.get(ax))
    return PartitionSpec(*axes)


def logical_to_mesh_sharding(logical_spec, mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, logical_to_mesh_spec(logical_spec))


def params_shardings(mesh: Mesh, params_spec, params=None):
    """Converts a pytree of logical PartitionSpecs (from
    ``nn.get_partition_spec``) into NamedShardings on `mesh`.

    When ``params`` (arrays or shape structs, same tree) is given, any
    partitioned dimension whose size is not divisible by its mesh axis
    falls back to replicated with a warning instead of failing at
    device_put (e.g. 2 MoE experts on an 8-way "data" axis, or an odd
    vocabulary under tensor parallelism)."""
    def _convert(spec):
        if isinstance(spec, PartitionSpec):
            return logical_to_mesh_sharding(spec, mesh)
        return NamedSharding(mesh, PartitionSpec())

    is_spec = lambda x: isinstance(x, PartitionSpec)  # noqa: E731
    shardings = jax.tree_util.tree_map(_convert, params_spec,
                                       is_leaf=is_spec)
    if params is None:
        return shardings

    def _fit(sharding, p):
        spec = sharding.spec
        if not any(spec):
            return sharding
        shape = getattr(p, "shape", None)
        if shape is None or len(shape) < len(spec):
            return sharding
        fitted, changed = [], False
        for dim, ax in zip(shape, spec):
            if ax is not None and dim % mesh.shape[ax] != 0:
                fitted.append(None)
                changed = True
            else:
                fitted.append(ax)
        if not changed:
            return sharding
        logging.warning(
            "Replicating axis of param with shape %s: %s does not divide "
            "its mesh axes, using %s", shape, spec, PartitionSpec(*fitted))
        return NamedSharding(mesh, PartitionSpec(*fitted))

    return jax.tree_util.tree_map(_fit, shardings, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading axis over the "data" mesh axis."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
