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
"""On-device log-mel fbank + CMVN (jit-compatible).

The offline pipeline computes features on the host
(data/audio/log_mel_fbank.py, bit-matched to python_speech_features,
parity: reference log_mel_fbank.py).  This is the same computation
expressed in jax — framing as a strided gather, XLA rfft, mel matmul,
log, per-utterance CMVN — so serving stacks can feed RAW waveforms and
extract features on the TPU itself (batched, fused with the encoder
step; a capability the reference lacks).  Static shapes: the waveform
batch is [B, num_samples] with a ``lengths`` mask; the frame count is
derived from the padded length, matching the host implementation's
formula for each true length.
"""

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurst_tpu.data.audio.log_mel_fbank import get_filterbanks

__all__ = ["device_logfbank", "num_frames"]


def num_frames(n_samples: int, samplerate: int = 16000,
               winlen: float = 0.025, winstep: float = 0.01) -> int:
    """Host formula for the frame count of an n-sample utterance."""
    frame_len = int(round(winlen * samplerate))
    frame_step = int(round(winstep * samplerate))
    if n_samples <= frame_len:
        return 1
    return 1 + int(math.ceil((n_samples - frame_len) / frame_step))


@partial(jax.jit, static_argnames=("samplerate", "winlen", "winstep",
                                   "nfilt", "nfft", "preemph", "cmvn"))
def device_logfbank(signals: jnp.ndarray,
                    lengths: Optional[jnp.ndarray] = None,
                    samplerate: int = 16000, winlen: float = 0.025,
                    winstep: float = 0.01, nfilt: int = 80,
                    nfft: int = 512, preemph: float = 0.97,
                    cmvn: bool = True):
    """[B, S] waveforms (+ lengths [B]) -> ([B, F, nfilt] float32,
    frame_lengths [B]).  Frames past an utterance's true length are
    zeroed; CMVN statistics honor the mask."""
    signals = signals.astype(jnp.float32)
    b, slen = signals.shape
    if lengths is None:
        lengths = jnp.full([b], slen, jnp.int32)
    frame_len = int(round(winlen * samplerate))
    frame_step = int(round(winstep * samplerate))
    total_frames = num_frames(slen, samplerate, winlen, winstep)

    # pre-emphasis: y[0] = x[0], y[t] = x[t] - a*x[t-1]; zero out the
    # padded tail so it cannot leak into the last valid frame
    mask = (jnp.arange(slen)[None, :] < lengths[:, None]) \
        .astype(jnp.float32)
    signals = signals * mask
    emphasized = jnp.concatenate(
        [signals[:, :1], signals[:, 1:] - preemph * signals[:, :-1]],
        axis=1)
    # the host pads AFTER pre-emphasis, so position `length` must stay
    # zero (not -a*x[length-1]); re-apply the mask at the boundary
    emphasized = emphasized * mask
    pad = (total_frames - 1) * frame_step + frame_len - slen
    emphasized = jnp.pad(emphasized, ((0, 0), (0, max(pad, 0))))

    # framing as a gather with static indices
    idx = (np.arange(frame_len)[None, :]
           + np.arange(total_frames)[:, None] * frame_step)
    frames = emphasized[:, idx]                     # [B, F, frame_len]
    spec = jnp.fft.rfft(frames, nfft, axis=-1)
    pspec = (jnp.abs(spec) ** 2) / nfft             # [B, F, nfft//2+1]
    fb = jnp.asarray(get_filterbanks(nfilt, nfft, samplerate).T,
                     jnp.float32)
    feat = pspec @ fb                               # [B, F, nfilt]
    feat = jnp.log(jnp.maximum(feat, np.finfo(np.float64).eps))

    # per-utterance frame count (host formula, traced on lengths)
    fl = jnp.where(
        lengths <= frame_len, 1,
        1 + jnp.ceil((lengths - frame_len) / frame_step).astype(jnp.int32))
    fmask = (jnp.arange(total_frames)[None, :] < fl[:, None]) \
        .astype(jnp.float32)[..., None]
    if cmvn:
        n = jnp.maximum(jnp.sum(fmask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(feat * fmask, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square(feat - mean) * fmask, axis=1,
                      keepdims=True) / n
        feat = (feat - mean) / jnp.sqrt(var + 1e-20)
    return (feat * fmask).astype(jnp.float32), fl
