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
"""Multi-host cluster bootstrap.

Parity: /root/reference/neurst/training/distribution_utils.py:151-169 —
the reference builds TF_CONFIG from ``--worker_hosts``/``--task_index``
flags or the ``WORKER_HOSTS``/``TASK_ID`` environment variables.  Here
the same inputs resolve to ``jax.distributed.initialize`` keyword
arguments (coordinator = first worker); with no cluster spec at all,
initialize() is called bare and JAX discovers the topology from the
TPU metadata server / launcher env — the common case on Cloud TPU.
"""

import logging
import os
from typing import Mapping, Optional

__all__ = ["resolve_cluster", "distributed_initialize"]


def resolve_cluster(worker_hosts: Optional[str] = None,
                    task_index: Optional[int] = None,
                    env: Optional[Mapping[str, str]] = None) -> dict:
    """Resolves a cluster spec to jax.distributed.initialize kwargs.

    Returns {} when no spec is given (auto-discovery).  Raises on an
    ambiguous spec (several workers but no task index), matching the
    reference's validation (distribution_utils.py:159-160).
    """
    env = os.environ if env is None else env
    if worker_hosts is None:
        worker_hosts = env.get("WORKER_HOSTS") or None
        if task_index is None and env.get("TASK_ID") is not None:
            task_index = int(env["TASK_ID"])
    if not worker_hosts:
        return {}
    workers = [w.strip() for w in str(worker_hosts).split(",") if w.strip()]
    if len(workers) > 1 and (task_index is None or task_index < 0):
        raise ValueError(
            "Must specify task_index (or TASK_ID) when number of "
            "workers > 1")
    task_index = 0 if len(workers) == 1 else int(task_index)
    if not 0 <= task_index < len(workers):
        raise ValueError(
            f"task_index {task_index} out of range for {len(workers)} "
            f"workers")
    coordinator = workers[0]
    if ":" not in coordinator:
        coordinator += ":8476"  # jax's conventional coordinator port
    return {"coordinator_address": coordinator,
            "num_processes": len(workers),
            "process_id": task_index}


def distributed_initialize(worker_hosts: Optional[str] = None,
                           task_index: Optional[int] = None) -> None:
    """Initializes jax.distributed from flags/env (idempotent guard is
    the caller's; jax raises if initialized twice)."""
    import jax
    kwargs = resolve_cluster(worker_hosts, task_index)
    if kwargs:
        logging.info("jax.distributed.initialize(%s)", kwargs)
    jax.distributed.initialize(**kwargs)
    logging.info("jax.distributed initialized: process %d/%d, "
                 "%d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
