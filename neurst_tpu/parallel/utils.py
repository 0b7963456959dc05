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
"""Host->device batch placement helpers (single- and multi-host)."""

import jax
import numpy as np

from neurst_tpu.parallel.mesh import batch_sharding

__all__ = ["put_batch", "local_device_count", "process_index",
           "process_count"]


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()


def put_batch(mesh, batch: dict, batch_axis: int = 0) -> dict:
    """Places a (process-local) numpy batch onto the mesh, sharding
    axis `batch_axis` over "data" (axis 1 for micro-batched arrays
    shaped [update_cycle, B, ...]).  Works on one process (device_put)
    and on multi-host meshes (make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec
    from neurst_tpu.parallel.mesh import replicated
    repl = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray) or v.dtype == object:
            continue  # host-only fields (raw strings etc.)
        if v.ndim <= batch_axis:
            s = repl
        else:
            spec = [None] * v.ndim
            spec[batch_axis] = "data"
            s = NamedSharding(mesh, PartitionSpec(*spec))
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, s)
        else:
            out[k] = jax.make_array_from_process_local_data(s, v)
    return out
