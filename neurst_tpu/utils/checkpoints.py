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
"""Name-keyed checkpointing with keep-best and averaging savers.

Parity: /root/reference/neurst/utils/checkpoints.py — name-based restore
tolerant of scope renames (40-91, 315-360), regex/prefix remapping for
pretrain restore (363-414), atomic metadata writes (127-141),
``KeepBestCheckpointSaver`` (186-236) and ``AverageCheckpointSaver``
(239-312).

TPU-first: a checkpoint is a flat ``{path/to/param: ndarray}`` mapping
stored as ``.npz`` (portable, averaging-friendly, convertible from
foreign checkpoints by pure name mapping), plus an optional msgpack
sidecar with optimizer state for exact resume.
"""

import json
import logging
import os
import re
from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = ["flatten_params", "unflatten_params", "save_checkpoint",
           "latest_checkpoint", "list_checkpoints",
           "restore_checkpoint_params", "restore_into",
           "average_checkpoints", "NameBasedCheckpointManager",
           "KeepBestCheckpointSaver", "AverageCheckpointSaver"]

_META_FILE = "checkpoint.json"


def flatten_params(params, sep="/", prefix="") -> Dict[str, np.ndarray]:
    """Flattens a nested dict to {path: leaf}.  Leaves are kept as-is
    (works on traced arrays inside jit); savers convert to numpy."""
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, sep, f"{prefix}{k}{sep}"))
    else:
        out[prefix[:-len(sep)]] = params
    return out


def unflatten_params(flat: Dict[str, np.ndarray], sep="/") -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _ckpt_path(model_dir, step):
    return os.path.join(model_dir, f"ckpt-{step}.npz")


def _read_meta(model_dir) -> dict:
    path = os.path.join(model_dir, _META_FILE)
    if not os.path.exists(path):
        return {"latest": None, "all": []}
    with open(path) as f:
        return json.load(f)


def _write_meta(model_dir, meta: dict):
    path = os.path.join(model_dir, _META_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)  # atomic (parity: checkpoints.py:137-141)


def save_checkpoint(model_dir: str, step: int, params,
                    opt_state_bytes: Optional[bytes] = None,
                    max_to_keep: Optional[int] = 8) -> str:
    """Saves params (+ optional serialized optimizer state) at `step`.

    Dtypes are canonicalized to what npz represents natively: bfloat16
    (an ml_dtypes extension numpy serializes as raw void '|V2' bytes —
    unreadable without the original dtype) is widened LOSSLESSLY to
    float32.  This keeps the "checkpoints stay f32" contract no matter
    which caller saves: the round-5 quality run caught the inline
    validator's keep-best/averaged savers silently writing the live
    bf16 training params as void arrays that exploded at restore."""
    os.makedirs(model_dir, exist_ok=True)
    flat = {k: _canonical_dtype(np.asarray(v))
            for k, v in flatten_params(params).items()}
    path = _ckpt_path(model_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    if opt_state_bytes is not None:
        opt_path = path.replace(".npz", ".optstate")
        with open(opt_path + ".tmp", "wb") as f:
            f.write(opt_state_bytes)
        os.replace(opt_path + ".tmp", opt_path)
    meta = _read_meta(model_dir)
    if step not in meta["all"]:
        meta["all"].append(step)
    meta["latest"] = step
    # prune old checkpoints
    if max_to_keep and len(meta["all"]) > max_to_keep:
        for old in sorted(meta["all"])[:-max_to_keep]:
            meta["all"].remove(old)
            for suffix in (".npz", ".optstate"):
                p = os.path.join(model_dir, f"ckpt-{old}{suffix}")
                if os.path.exists(p):
                    os.remove(p)
    _write_meta(model_dir, meta)
    logging.info("Saved checkpoint %s", path)
    return path


def list_checkpoints(model_dir: str) -> List[int]:
    meta = _read_meta(model_dir)
    steps = list(meta["all"])
    # also pick up files not in meta (e.g. copied in)
    if os.path.isdir(model_dir):
        for f in os.listdir(model_dir):
            m = re.match(r"^ckpt-(\d+)\.npz$", f)
            if m and int(m.group(1)) not in steps:
                steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(model_dir: str) -> Optional[str]:
    if model_dir is None or not os.path.isdir(model_dir):
        return None
    meta = _read_meta(model_dir)
    step = meta.get("latest")
    if step is None:
        steps = list_checkpoints(model_dir)
        if not steps:
            step = None
        else:
            step = steps[-1]
    if step is not None:
        path = _ckpt_path(model_dir, step)
        if os.path.exists(path):
            return path
        orbax = path.replace(".npz", ".orbax")
        if os.path.isdir(orbax):
            return orbax
    # sharded-format-only directories (--checkpoint_format orbax):
    # every consumer goes through restore_checkpoint_params, which
    # reads .orbax paths transparently
    from neurst_tpu.utils.orbax_checkpoints import latest_orbax_checkpoint
    return latest_orbax_checkpoint(model_dir)


def _canonical_dtype(a: np.ndarray) -> np.ndarray:
    """bfloat16 -> float32 (lossless); other extension dtypes -> f32."""
    if a.dtype.name == "bfloat16" or (a.dtype.kind == "V"
                                      and a.dtype.itemsize == 2):
        import ml_dtypes
        if a.dtype.kind == "V":
            a = a.view(ml_dtypes.bfloat16)
        return a.astype(np.float32)
    return a


def _rescue_void_bf16(a: np.ndarray) -> np.ndarray:
    """Repairs legacy checkpoints where bf16 arrays were np.savez'd as
    raw void '|V2' bytes (pre-round-5 keep-best/avg savers under
    --bf16_params): the bytes ARE bf16, so the view is exact."""
    if a.dtype.kind == "V" and a.dtype.itemsize == 2:
        import ml_dtypes
        return a.view(ml_dtypes.bfloat16).astype(np.float32)
    return a


def restore_checkpoint_params(path: str) -> Dict[str, np.ndarray]:
    """Loads the flat name->array mapping from a .npz checkpoint (or a
    sharded ``.orbax`` directory — read host-side and flattened, so
    every npz tool: inspect/avg/converters/sidecar works on both)."""
    if path.endswith(".orbax") and os.path.isdir(path):
        from neurst_tpu.utils.orbax_checkpoints import \
            restore_checkpoint_orbax
        tree = restore_checkpoint_orbax(path, None)
        return {k: np.asarray(v)
                for k, v in flatten_params(tree).items()}
    if os.path.isdir(path):
        found = latest_checkpoint(path)
        if found is None:
            from neurst_tpu.utils.orbax_checkpoints import \
                latest_orbax_checkpoint
            found = latest_orbax_checkpoint(path)
        if found is None:
            raise FileNotFoundError("No checkpoint found")
        return restore_checkpoint_params(found)
    with np.load(path) as data:
        return {k: _rescue_void_bf16(data[k]) for k in data.files}


def _bridge_scan_layouts(flat: Dict[str, np.ndarray],
                         target_flat: Dict) -> Dict[str, np.ndarray]:
    """Converts between the per-layer checkpoint layout
    (``<stack>/layer_<i>/REST``), the scan-over-layers layout
    (``<stack>/layers/layer/REST`` with a stacked leading axis), and
    the pipeline-parallel layout
    (``<stack>/layers/pipeline/stages/layers/layer/REST`` with leading
    ``[num_stages, layers_per_stage]`` axes), and the MoE block-scan
    layout (``<stack>/layers/block_layer_<j>/REST`` with a leading
    num_blocks axis; global layer index = block * block_size + j), in
    whichever direction the restore target requires."""
    out = dict(flat)
    pipe_suffix = "/pipeline/stages/layers/layer/"
    pipe_re = re.compile(r"^(.*)/layers/pipeline/stages/layers/layer/(.*)$")
    scan_re = re.compile(r"^(.*)/layers/layer/(.*)$")
    block_re = re.compile(r"^(.*)/layers/block_layer_(\d+)/(.*)$")

    def _block_size_in(names, base):
        """Sub-layers per scanned block under `base` in `names`."""
        f = 0
        prefix = f"{base}/layers/block_layer_"
        for k in names:
            if k.startswith(prefix):
                f = max(f, int(k[len(prefix):].split("/", 1)[0]) + 1)
        return f

    def _stacked_source(base, rest, n):
        """[n, ...] from whichever source layout is present."""
        stacked = out.get(f"{base}/layers/layer/{rest}")
        if stacked is not None and np.asarray(stacked).shape[0] == n:
            return np.asarray(stacked)
        piped = out.get(f"{base}/layers{pipe_suffix}{rest}")
        if piped is not None:
            piped = np.asarray(piped)
            if piped.shape[0] * piped.shape[1] == n:
                return piped.reshape((n,) + piped.shape[2:])
        f = _block_size_in(out, base)
        if f and n % f == 0:
            parts = [out.get(f"{base}/layers/block_layer_{j}/{rest}")
                     for j in range(f)]
            if all(p is not None for p in parts):
                arrs = [np.asarray(p) for p in parts]
                if all(a.shape[0] == n // f for a in arrs):
                    # interleave: global layer i = block*f + j
                    return np.stack(arrs, 1).reshape(
                        (n,) + arrs[0].shape[1:])
        parts = [out.get(f"{base}/layer_{i}/{rest}") for i in range(n)]
        if all(p is not None for p in parts):
            return np.stack([np.asarray(p) for p in parts], 0)
        return None

    for name, current in target_flat.items():
        if name in out:
            continue
        m = pipe_re.match(name)
        if m:  # target is pipelined [S, P, ...]
            base, rest = m.groups()
            shape = np.asarray(current).shape
            s, p = int(shape[0]), int(shape[1])
            stacked = _stacked_source(base, rest, s * p)
            if stacked is not None:
                out[name] = stacked.reshape((s, p) + stacked.shape[1:])
            continue
        m = scan_re.match(name)
        if m and pipe_suffix not in name:  # target is scan-stacked
            base, rest = m.groups()
            n = int(np.asarray(current).shape[0])
            stacked = _stacked_source(base, rest, n)
            if stacked is not None:
                out[name] = stacked
            continue
        m = block_re.match(name)
        if m:  # target is MoE block-scan [num_blocks, ...]
            base, j, rest = m.groups()
            j = int(j)
            nb = int(np.asarray(current).shape[0])
            f = _block_size_in(target_flat, base)
            parts = [out.get(f"{base}/layer_{b * f + j}/{rest}")
                     for b in range(nb)]
            if all(p is not None for p in parts):
                out[name] = np.stack([np.asarray(p) for p in parts], 0)
                continue
            # homogeneous params may also come from a plain-scan or
            # pipelined source: take the j-th layer of every block
            stacked = _stacked_source(base, rest, nb * f)
            if stacked is not None:
                out[name] = stacked[j::f]
            continue
        m = re.match(r"^(.*)/layer_(\d+)/(.*)$", name)
        if m:  # target is per-layer; source may be stacked/pipelined
            base, idx, rest = m.groups()
            stacked = out.get(f"{base}/layers/layer/{rest}")
            if stacked is None:
                piped = out.get(f"{base}/layers{pipe_suffix}{rest}")
                if piped is not None:
                    piped = np.asarray(piped)
                    stacked = piped.reshape((-1,) + piped.shape[2:])
            if stacked is None:
                f = _block_size_in(out, base)
                if f:
                    b, j = divmod(int(idx), f)
                    arr = out.get(f"{base}/layers/block_layer_{j}/{rest}")
                    if arr is not None \
                            and b < np.asarray(arr).shape[0]:
                        out[name] = np.asarray(arr)[b]
                        continue
            if stacked is not None \
                    and int(idx) < np.asarray(stacked).shape[0]:
                out[name] = np.asarray(stacked)[int(idx)]
    return out


def restore_into(params, flat: Dict[str, np.ndarray],
                 name_mapping: Optional[Callable[[str], str]] = None,
                 from_prefix: Optional[str] = None,
                 to_prefix: Optional[str] = None,
                 name_pattern: Optional[str] = None,
                 strict: bool = False):
    """Name-based tolerant restore into an existing parameter pytree.

    Parity: restore_checkpoint_if_possible_v2 (checkpoints.py:363-414):
    optional `from_prefix`->`to_prefix` remapping, regex filter
    `name_pattern`, and warnings (not errors) for missing/unrestored
    names unless `strict`.

    Returns (new_params, restored_names, missing_names).
    """
    target_flat = flatten_params(params)
    pattern = re.compile(name_pattern) if name_pattern else None
    remapped = {}
    for name, value in flat.items():
        new_name = name
        if from_prefix and to_prefix and new_name.startswith(from_prefix):
            new_name = to_prefix + new_name[len(from_prefix):]
        if name_mapping is not None:
            new_name = name_mapping(new_name)
        if new_name is not None:
            remapped[new_name] = value
    remapped = _bridge_scan_layouts(remapped, target_flat)
    restored, missing = [], []
    out_flat = {}
    for name, current in target_flat.items():
        if pattern and not pattern.search(name):
            out_flat[name] = current
            continue
        if name in remapped:
            value = remapped[name]
            if tuple(value.shape) != tuple(np.asarray(current).shape):
                msg = (f"Shape mismatch for {name}: ckpt {value.shape} vs "
                       f"model {np.asarray(current).shape}")
                if strict:
                    raise ValueError(msg)
                logging.warning(msg)
                out_flat[name] = current
                missing.append(name)
            else:
                out_flat[name] = value.astype(np.asarray(current).dtype)
                restored.append(name)
        else:
            out_flat[name] = current
            missing.append(name)
    if missing:
        logging.info("Unrestored parameters (%d): %s", len(missing),
                     missing[:10])
        if strict:
            raise ValueError(f"Missing parameters in checkpoint: {missing}")
    logging.info("Restored %d/%d parameters", len(restored),
                 len(target_flat))
    return unflatten_params(out_flat), restored, missing


def average_checkpoints(paths: List[str]) -> Dict[str, np.ndarray]:
    """Arithmetic mean of flat checkpoints (parity: avg_checkpoint CLI)."""
    acc: Dict[str, np.ndarray] = {}
    n = 0
    for p in paths:
        flat = restore_checkpoint_params(p)
        if not acc:
            acc = {k: v.astype(np.float64) for k, v in flat.items()}
        else:
            for k in acc:
                acc[k] += flat[k]
        n += 1
    return {k: (v / n).astype(np.float32) for k, v in acc.items()}


class NameBasedCheckpointManager(object):
    """Save/restore manager bound to a model_dir."""

    def __init__(self, model_dir: str, max_to_keep: int = 8):
        self._model_dir = model_dir
        self._max_to_keep = max_to_keep

    @property
    def model_dir(self):
        return self._model_dir

    def save(self, step: int, params, opt_state_bytes=None):
        return save_checkpoint(self._model_dir, step, params,
                               opt_state_bytes, self._max_to_keep)

    def restore(self, params):
        path = latest_checkpoint(self._model_dir)
        if path is None:
            return None
        flat = restore_checkpoint_params(path)
        new_params, _, _ = restore_into(params, flat)
        from neurst_tpu.utils.compat import hack_global_step
        return {"params": new_params,
                "step": hack_global_step(path.replace(".npz", "")),
                "path": path}


class KeepBestCheckpointSaver(object):
    """Keeps the top-k checkpoints by metric
    (parity: checkpoints.py:186-236)."""

    def __init__(self, model_dir: str, metric, max_to_keep: int = 8,
                 subdir: str = "best"):
        self._dir = os.path.join(model_dir, subdir)
        os.makedirs(self._dir, exist_ok=True)
        self._metric = metric
        self._max_to_keep = max_to_keep
        self._records_file = os.path.join(self._dir, "metrics.json")
        self._records = {}
        if os.path.exists(self._records_file):
            with open(self._records_file) as f:
                self._records = {int(k): v for k, v in json.load(f).items()}

    def save(self, step: int, params, metric_value: float) -> bool:
        worst = None
        if len(self._records) >= self._max_to_keep:
            worst = min(self._records.items(),
                        key=lambda kv: (kv[1] if self._greater_is_better()
                                        else -kv[1]))
            if not self._better(metric_value, worst[1]):
                return False
        save_checkpoint(self._dir, step, params, max_to_keep=None)
        self._records[step] = float(metric_value)
        if worst is not None:
            self._records.pop(worst[0], None)
            p = _ckpt_path(self._dir, worst[0])
            if os.path.exists(p):
                os.remove(p)
        with open(self._records_file, "w") as f:
            json.dump(self._records, f)
        return True

    def _greater_is_better(self):
        return self._metric.greater_or_eq(1.0, 0.0)

    def _better(self, a, b):
        return self._metric.greater_or_eq(a, b)


class AverageCheckpointSaver(object):
    """Maintains a sliding window of weights; writes their mean only
    when the metric improves (parity: checkpoints.py:239-312)."""

    def __init__(self, model_dir: str, metric, max_to_keep: int = 8,
                 subdir: str = "best_avg"):
        self._dir = os.path.join(model_dir, subdir)
        os.makedirs(self._dir, exist_ok=True)
        self._metric = metric
        self._max_to_keep = max_to_keep
        self._window: Dict[int, Dict[str, np.ndarray]] = {}
        self._best: Optional[float] = None

    def save(self, step: int, params, metric_value: float) -> bool:
        # canonicalize (bf16 -> f32) BEFORE windowing: the mean must
        # not accumulate in bf16 when training runs --bf16_params
        flat = {k: _canonical_dtype(np.asarray(v))
                for k, v in flatten_params(params).items()}
        self._window[step] = flat
        if len(self._window) > self._max_to_keep:
            oldest = min(self._window)
            del self._window[oldest]
        if self._best is not None and not self._metric.greater_or_eq(
                metric_value, self._best):
            return False
        self._best = metric_value
        avg = {}
        for k in flat:
            avg[k] = np.mean([w[k].astype(np.float64)
                              for w in self._window.values()],
                             axis=0).astype(flat[k].dtype)
        save_checkpoint(self._dir, step, unflatten_params(avg),
                        max_to_keep=2)
        return True
