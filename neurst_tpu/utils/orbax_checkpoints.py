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
"""Sharded (orbax) checkpoint format for multi-host-scale models.

The default name-keyed ``.npz`` format (checkpoints.py) gathers every
array to host 0 — right for the reference-compatible tooling
(avg_checkpoint, converters, keep-best savers) and any model that fits
one host.  At pod scale each process must write only its own parameter
shards; orbax's OCDBT tensorstore does exactly that and restores
directly into the target sharding, so no host ever materializes the
full pytree.  Select with ``--checkpoint_format orbax`` on the trainer;
the directory stays compatible with ``list/latest_checkpoint`` via the
same meta file, using ``ckpt-{step}.orbax`` directories.
"""

import logging
import os
import re
from typing import List, Optional

__all__ = ["save_checkpoint_orbax", "save_checkpoint_orbax_raw",
           "restore_checkpoint_orbax", "latest_orbax_checkpoint",
           "is_orbax_checkpoint"]


def save_checkpoint_orbax_raw(path: str, tree) -> str:
    """Saves a pytree at the exact path (no step meta); used for the
    optimizer-state sidecar."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)
    return path


def _ckpt_dir(model_dir: str, step: int) -> str:
    return os.path.join(model_dir, f"ckpt-{step}.orbax")


def is_orbax_checkpoint(path: str) -> bool:
    return path is not None and path.endswith(".orbax") \
        and os.path.isdir(path)


def save_checkpoint_orbax(model_dir: str, step: int, params,
                          max_to_keep: Optional[int] = 8) -> str:
    """Each process writes its own shards (OCDBT); returns the path."""
    import orbax.checkpoint as ocp

    os.makedirs(model_dir, exist_ok=True)
    path = _ckpt_dir(model_dir, step)
    # the save itself is collective (every process writes its shards
    # and orbax synchronizes); the meta read-modify-write and the
    # pruning below must run on ONE process or they race on shared
    # storage (TOCTOU rmtree, dropped meta entries)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)
    import jax
    if jax.process_index() != 0:
        return path
    from neurst_tpu.utils.checkpoints import _read_meta, _write_meta
    meta = _read_meta(model_dir)
    if step not in meta["all"]:
        meta["all"].append(step)
    meta["latest"] = step
    if max_to_keep and len(meta["all"]) > max_to_keep:
        import shutil
        for old in sorted(meta["all"])[:-max_to_keep]:
            meta["all"].remove(old)
            old_path = _ckpt_dir(model_dir, old)
            for p in (old_path,
                      old_path.replace(".orbax", ".optstate.orbax")):
                if os.path.isdir(p):
                    shutil.rmtree(p)
    _write_meta(model_dir, meta)
    logging.info("Saved sharded checkpoint %s", path)
    return path


def latest_orbax_checkpoint(model_dir: str) -> Optional[str]:
    if model_dir is None or not os.path.isdir(model_dir):
        return None
    steps: List[int] = []
    for f in os.listdir(model_dir):
        m = re.match(r"^ckpt-(\d+)\.orbax$", f)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return _ckpt_dir(model_dir, max(steps))


def restore_checkpoint_orbax(path: str, template=None):
    """Restores into `template`'s structure/shardings: a pytree of
    jax.ShapeDtypeStruct (with shardings) restores each array directly
    onto its devices; a concrete pytree restores host-local; None
    restores the saved structure as host arrays (for tooling)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path), template)
