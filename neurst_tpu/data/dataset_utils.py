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
"""Host-side batching: bucketed, static-shaped batches for XLA.

Parity: /root/reference/neurst/data/dataset_utils.py (bucket boundary
creation 125-147, src/trg boundary association 150-178, token-based
batching, ``adjust_batch_size``).  TPU-first redesign: every emitted
batch has a shape drawn from a *bounded, enumerable set*
``{(bucket_batch_size[i], boundary[i])}``, so jit compiles a fixed
number of programs — this generalizes the reference's
``gpu_efficient_level`` into the default behavior.  Batching runs on the
host over plain python iterators with a background prefetch thread
(replacing tf.data's ``group_by_window``).
"""

import logging
import math
import queue
import random
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["create_batch_bucket_boundaries", "associated_bucket_boundaries",
           "adjust_batch_size", "batch_by_tokens_bucketed", "batch_fixed_size",
           "shuffle_iterator", "prefetch_iterator", "pad_to",
           "clean_by_length", "round_up"]

_MIN_BUCKET_BOUNDARY = 8
_BUCKET_BOUNDARY_SCALE = 1.1


def round_up(x: int, multiple: int) -> int:
    return ((int(x) + multiple - 1) // multiple) * multiple


def create_batch_bucket_boundaries(max_length: int,
                                   min_boundary: int = _MIN_BUCKET_BOUNDARY,
                                   boundary_scale: float = _BUCKET_BOUNDARY_SCALE,
                                   length_multiple: int = 8) -> List[int]:
    """Geometric bucket boundaries covering [min_boundary, max_length].

    Boundaries are rounded up to ``length_multiple`` (and deduplicated) so
    padded shapes tile cleanly onto TPU lanes; the final boundary covers
    ``max_length``.
    """
    raw = []
    x = min_boundary
    while x < max_length:
        raw.append(x)
        x = max(x + 1, int(x * boundary_scale))
    raw.append(max(max_length, min_boundary))
    out = []
    for b in raw:
        b = round_up(b, length_multiple)
        if not out or b > out[-1]:
            out.append(b)
    return out


def associated_bucket_boundaries(a: List[int], b: List[int]
                                 ) -> Tuple[List[int], List[int]]:
    """Resamples two boundary lists to equal length (position-aligned),
    so one bucket index addresses a (src_len, trg_len) pair."""
    la, lb = len(a), len(b)
    if la == lb:
        return a, b
    if la > lb:
        step_a, step_b = la / lb, 1.0
    else:
        step_a, step_b = 1.0, lb / la
    out_a, out_b = [], []
    for i in range(1, min(la, lb) + 1):
        out_a.append(a[int(math.ceil(i * step_a)) - 1])
        out_b.append(b[int(math.ceil(i * step_b)) - 1])
    return out_a, out_b


def adjust_batch_size(batch_size: Optional[int] = None,
                      batch_size_per_replica: Optional[int] = None,
                      num_replicas: int = 1,
                      verbose: bool = True) -> int:
    """Resolves the *global* batch size from either a global value or a
    per-replica value (parity: dataset_utils.adjust_batch_size)."""
    if batch_size_per_replica:
        global_bs = batch_size_per_replica * max(num_replicas, 1)
        if verbose:
            logging.info("Global batch size = %d (%d per replica x %d replicas)",
                         global_bs, batch_size_per_replica, num_replicas)
        return global_bs
    if not batch_size:
        raise ValueError("Either batch_size or batch_size_per_replica "
                         "must be provided.")
    if verbose:
        logging.info("Global batch size = %d", batch_size)
    return batch_size


def clean_by_length(example: dict,
                    max_lens: Dict[str, Optional[int]]) -> Optional[dict]:
    """Drops an example whose listed fields exceed their max length."""
    for key, max_len in max_lens.items():
        if max_len and key in example and len(example[key]) > max_len:
            return None
    return example


def pad_to(ids: Sequence[int], length: int, pad_value) -> np.ndarray:
    arr = np.full([length], pad_value, dtype=np.int32)
    n = min(len(ids), length)
    arr[:n] = np.asarray(ids[:n], dtype=np.int32)
    return arr


def shuffle_iterator(it: Iterator, buffer_size: int, seed: Optional[int] = None
                     ) -> Iterator:
    """Streaming shuffle with a reservoir buffer (tf.data-style)."""
    rng = random.Random(seed)
    buf = []
    for x in it:
        buf.append(x)
        if len(buf) >= buffer_size:
            idx = rng.randrange(len(buf))
            buf[idx], buf[-1] = buf[-1], buf[idx]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf


def prefetch_iterator(it: Iterator, buffer_size: int = 64) -> Iterator:
    """Runs the upstream iterator in a daemon thread; overlaps host
    preprocessing with device steps.  Abandoning the generator (e.g.
    the trainer breaking at train_steps) stops the worker instead of
    leaving it blocked on a full queue."""
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    _END = object()
    err: List[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for x in it:
                while not stop.is_set():
                    try:
                        q.put(x, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            try:
                q.put_nowait(_END)
            except queue.Full:
                pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is _END:
                if err:
                    raise err[0]
                return
            yield x
    finally:
        stop.set()


def batch_by_tokens_bucketed(
        iterator: Iterator[dict],
        batch_size_in_tokens: int,
        bucket_boundaries: Dict[str, List[int]],
        padding_values: Dict[str, int],
        length_fn: Callable[[dict], Dict[str, int]],
        batch_size_multiple: int = 8,
        extra_fields: Sequence[str] = (),
        drop_oversized: bool = True,
        min_bucket_batch_size: int = 8) -> Iterator[Dict[str, np.ndarray]]:
    """Token-budget bucketed batching with STATIC shapes.

    Args:
        iterator: Yields projected example dicts (lists/np arrays of ids).
        batch_size_in_tokens: Global token budget per batch.
        bucket_boundaries: {field: aligned boundary list}; all lists must
            have equal length (use ``associated_bucket_boundaries``).
        padding_values: {field: pad id}.
        length_fn: Maps an example to {field: length}.
        batch_size_multiple: Bucket batch sizes are rounded down to this
            multiple (>= itself) so batch dims tile onto TPU sublanes.
        extra_fields: Fields carried through untouched (stacked as object
            arrays if non-numeric).

    Yields:
        Batches {field: [bucket_batch_size, boundary] int32 array}.  The
        set of distinct output shapes is len(boundaries) — XLA compiles
        each exactly once.
    """
    fields = list(bucket_boundaries.keys())
    num_buckets = len(bucket_boundaries[fields[0]])
    for f in fields:
        assert len(bucket_boundaries[f]) == num_buckets, \
            "bucket boundary lists must be associated (equal length)"

    # per-bucket batch size: token budget split by the max padded length,
    # rounded to batch_size_multiple (>= it, so the batch dim always
    # divides the data-parallel mesh axis)
    bucket_batch_sizes = []
    for i in range(num_buckets):
        max_len = max(bucket_boundaries[f][i] for f in fields)
        bs = max(batch_size_in_tokens // max_len, 1)
        bs = max((bs // batch_size_multiple) * batch_size_multiple,
                 batch_size_multiple)
        bucket_batch_sizes.append(bs)
    shapes = sorted({(bucket_batch_sizes[i],) + tuple(
        bucket_boundaries[f][i] for f in fields) for i in range(num_buckets)})
    logging.info("bucketed batching: %d buckets, %d distinct compiled "
                 "shapes: %s", num_buckets, len(shapes), shapes)

    buckets: List[List[dict]] = [[] for _ in range(num_buckets)]

    def bucket_id_of(lengths: Dict[str, int]) -> Optional[int]:
        for i in range(num_buckets):
            if all(lengths[f] <= bucket_boundaries[f][i] for f in fields):
                return i
        return None

    def emit(i: int) -> Dict[str, np.ndarray]:
        examples = buckets[i]
        buckets[i] = []
        bs = bucket_batch_sizes[i]
        batch: Dict[str, np.ndarray] = {}
        for f in fields:
            boundary = bucket_boundaries[f][i]
            arr = np.full([bs, boundary], padding_values.get(f, 0),
                          dtype=np.int32)
            for j, ex in enumerate(examples):
                ids = ex[f]
                arr[j, :len(ids)] = np.asarray(ids, dtype=np.int32)
            batch[f] = arr
        # per-example true lengths + sample mask (padded rows -> 0)
        for f in fields:
            lens = np.zeros([bs], dtype=np.int32)
            for j, ex in enumerate(examples):
                lens[j] = len(ex[f])
            batch[f + "_length"] = lens
        mask = np.zeros([bs], dtype=np.float32)
        mask[:len(examples)] = 1.0
        batch["sample_mask"] = mask
        for f in extra_fields:
            batch[f] = np.asarray([ex.get(f) for ex in examples] +
                                  [None] * (bs - len(examples)), dtype=object)
        return batch

    for example in iterator:
        lengths = length_fn(example)
        i = bucket_id_of(lengths)
        if i is None:
            if drop_oversized:
                continue
            raise ValueError(f"Example exceeds largest bucket: {lengths}")
        buckets[i].append(example)
        if len(buckets[i]) >= bucket_batch_sizes[i]:
            yield emit(i)
    # flush non-empty buckets (padded rows are masked via sample_mask)
    for i in range(num_buckets):
        if buckets[i]:
            yield emit(i)


def batch_fixed_size(iterator: Iterator[dict],
                     batch_size: int,
                     padding_values: Dict[str, int],
                     fields: Sequence[str],
                     pad_length_multiple: int = 8,
                     fixed_lengths: Optional[Dict[str, int]] = None,
                     extra_fields: Sequence[str] = ()
                     ) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-batch-size padded batching (inference/eval).

    Sequence dims are padded to ``fixed_lengths`` when provided, else to
    the batch max rounded up to ``pad_length_multiple`` (bounding the
    number of compiled shapes).  Short final batches are padded to the
    full batch size and flagged via ``sample_mask``.
    """
    buf: List[dict] = []

    def emit() -> Dict[str, np.ndarray]:
        n = len(buf)
        batch: Dict[str, np.ndarray] = {}
        for f in fields:
            if fixed_lengths and fixed_lengths.get(f):
                length = fixed_lengths[f]
            else:
                length = round_up(max(len(ex[f]) for ex in buf),
                                  pad_length_multiple)
            arr = np.full([batch_size, length], padding_values.get(f, 0),
                          dtype=np.int32)
            lens = np.zeros([batch_size], dtype=np.int32)
            for j, ex in enumerate(buf):
                ids = ex[f][:length]
                arr[j, :len(ids)] = np.asarray(ids, dtype=np.int32)
                lens[j] = len(ids)
            batch[f] = arr
            batch[f + "_length"] = lens
        mask = np.zeros([batch_size], dtype=np.float32)
        mask[:n] = 1.0
        batch["sample_mask"] = mask
        for f in extra_fields:
            batch[f] = np.asarray([ex.get(f) for ex in buf] +
                                  [None] * (batch_size - n), dtype=object)
        buf.clear()
        return batch

    for example in iterator:
        buf.append(example)
        if len(buf) >= batch_size:
            yield emit()
    if buf:
        yield emit()
