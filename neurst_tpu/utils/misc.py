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
"""Small shared helpers (parity: /root/reference/neurst/utils/misc.py)."""

import logging
import os
import time
from typing import Union

import numpy as np

__all__ = ["to_numpy_or_python_type", "flatten_string_list", "assert_equal_numpy",
           "PseudoPool", "Timer"]

from neurst_tpu.utils.configurable import flatten_string_list  # re-export


def to_numpy_or_python_type(tensors):
    """Converts (nested) device arrays to numpy arrays / python scalars."""
    def _convert(t):
        if hasattr(t, "addressable_shards") or hasattr(t, "device_buffer") \
                or type(t).__module__.startswith("jax"):
            t = np.asarray(t)
        if isinstance(t, np.ndarray):
            return t.item() if t.ndim == 0 else t
        if isinstance(t, (np.generic,)):
            return t.item()
        return t
    if isinstance(tensors, dict):
        return {k: to_numpy_or_python_type(v) for k, v in tensors.items()}
    if isinstance(tensors, (list, tuple)):
        return type(tensors)(to_numpy_or_python_type(v) for v in tensors)
    return _convert(tensors)


def assert_equal_numpy(a, b, eps=1e-5):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape}"
    assert float(np.max(np.abs(a - b))) < eps, \
        f"max abs diff {float(np.max(np.abs(a - b)))} >= {eps}"


class PseudoPool(object):
    """Serial stand-in for multiprocessing.Pool (1-CPU hosts, debugging)."""

    def __init__(self, processes=None):
        self._processes = processes

    def map(self, fn, iterable):
        return [fn(x) for x in iterable]

    def imap(self, fn, iterable):
        for x in iterable:
            yield fn(x)

    def close(self):
        pass

    def join(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass


class Timer(object):
    """Context-manager wall-clock timer."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.elapsed = time.perf_counter() - self.start


def download_with_tqdm(url: str, filename: str):
    """Downloads `url` to `filename` with a progress bar when tqdm is
    available (parity: /root/reference/neurst/utils/misc.py:176-206).
    Atomic: writes to <filename>.incomplete then renames."""
    import urllib.request
    tmp = filename + ".incomplete"
    try:
        from tqdm import tqdm

        class _Bar(tqdm):
            def update_to(self, b=1, bsize=1, tsize=None):
                if tsize is not None:
                    self.total = tsize
                self.update(b * bsize - self.n)

        with _Bar(unit="B", unit_scale=True, miniters=1,
                  desc=url.split("/")[-1]) as bar:
            urllib.request.urlretrieve(url, tmp,
                                       reporthook=bar.update_to)
    except ImportError:
        logging.info("Downloading %s ...", url)
        urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, filename)
    return filename
