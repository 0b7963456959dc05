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
"""Process-global settings and mode keys.

Parity with ``/root/reference/neurst/utils/compat.py:40-161``: mode keys,
data status, registered initial step / worker info, and the global float
dtype.  On TPU the compute dtype defaults to bfloat16 with float32
parameters; there is no loss scaling (bf16 has fp32's exponent range).
"""

import logging
import os
import re
from typing import Optional

__all__ = ["ModeKeys", "DataStatus", "GlobalKeys",
           "register_initial_step", "get_registered_initial_step",
           "register_computation_dtype", "get_computation_dtype",
           "FLOAT_MIN", "hack_global_step"]


class ModeKeys(object):
    TRAIN = "train"
    EVAL = "eval"
    INFER = "infer"

    @staticmethod
    def is_train(mode):
        return mode == ModeKeys.TRAIN


class DataStatus(object):
    """Lifecycle of a data field:
    RAW -> (tokenize/extract) PROCESSED -> (map to ids/features) PROJECTED."""
    RAW = "raw"
    PROCESSED = "processed"
    PROJECTED = "projected"


class GlobalKeys(object):
    INITIAL_GLOBAL_STEP = "initial_global_step"
    COMPUTATION_DTYPE = "computation_dtype"
    SUMMARY_WRITER = "summary_writer"
    SAVER = "saver"


_GLOBALS = {}

# Large-magnitude negative for masking in bf16-safe range (|x| < bf16 max).
FLOAT_MIN = -1.0e9


def register_initial_step(step: int):
    _GLOBALS[GlobalKeys.INITIAL_GLOBAL_STEP] = int(step)


def get_registered_initial_step() -> int:
    return int(_GLOBALS.get(GlobalKeys.INITIAL_GLOBAL_STEP, 0))


def register_computation_dtype(dtype: str):
    _GLOBALS[GlobalKeys.COMPUTATION_DTYPE] = dtype


def get_computation_dtype() -> str:
    return _GLOBALS.get(GlobalKeys.COMPUTATION_DTYPE, "bfloat16")


def register_global(key, value):
    _GLOBALS[key] = value


def get_global(key, default=None):
    return _GLOBALS.get(key, default)


def hack_global_step(path: str) -> Optional[int]:
    """Recovers the global step from a checkpoint file/dir name, e.g.
    ``ckpt-1500`` or ``.../checkpoints/1500``."""
    if path is None:
        return None
    base = os.path.basename(str(path).rstrip("/"))
    m = re.search(r"(\d+)$", base)
    if m:
        try:
            return int(m.group(1))
        except ValueError:
            return None
    return None
