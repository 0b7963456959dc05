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
"""FLAC decoding via the native C++ decoder.

The decoder (``native/flac_decoder.cpp``) is compiled on first use with
g++ into a cached shared library and bound through ctypes — the
native-runtime tier for the audio data loader (LibriSpeech/MuST-C ship
as FLAC; no system decoder exists in this environment).
"""

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

__all__ = ["decode_flac", "flac_available"]

_LIB = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "native", "flac_decoder.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NEURST_TPU_CACHE",
        os.path.join(tempfile.gettempdir(), "neurst_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libflacdec-{digest}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + ".build"
        cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, lib_path)
            logging.info("Built native flac decoder: %s", lib_path)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            logging.warning("flac decoder build failed: %s", e)
            _LIB_FAILED = True
            return None
    lib = ctypes.CDLL(lib_path)
    lib.flac_decode.restype = ctypes.c_int
    lib.flac_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def flac_available() -> bool:
    return _build_and_load() is not None


def decode_flac(data: bytes) -> Tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 mono waveform in int16 scale, rate)."""
    lib = _build_and_load()
    if lib is None:
        raise NotImplementedError(
            "native flac decoder unavailable (g++ build failed)")
    samples = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_longlong()
    rate = ctypes.c_int()
    channels = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.flac_decode(data, len(data), ctypes.byref(samples),
                         ctypes.byref(n), ctypes.byref(rate),
                         ctypes.byref(channels), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f"flac decode failed (code {rc})")
    try:
        count = n.value * channels.value
        arr = np.ctypeslib.as_array(samples, shape=(count,)).astype(
            np.float32)
    finally:
        lib.flac_free(samples)
    if channels.value > 1:
        arr = arr.reshape(-1, channels.value).mean(axis=1)
    # normalize to the int16 value range used by the wav path
    shift = bps.value - 16
    if shift > 0:
        arr = arr / float(1 << shift)
    elif shift < 0:
        arr = arr * float(1 << (-shift))
    return arr, rate.value
