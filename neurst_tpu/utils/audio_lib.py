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
"""SpecAugment (https://arxiv.org/abs/1904.08779).

Parity: /root/reference/neurst/utils/audio_lib.py:24-257 — LB/LD/SM/SS
presets, n-times frequency/time masking with max widths F/T and the
time-mask upper-bound ratio p; time-warping intentionally not
implemented (same decision and rationale as the reference).

Two implementations:
* ``apply_numpy``: host-side, used in offline preprocessing;
* ``apply_jax``: jit-safe (static shapes, masks built from comparisons
  against uniformly drawn boundaries), used inside the on-device input
  pipeline so augmentation runs on TPU per batch.
"""

from typing import Optional

import numpy as np
import yaml

__all__ = ["SpecAugment"]


class SpecAugment(object):

    _PREDEF_SETTINGS = {
        "LB": {"time_wrap_w": 80, "freq_mask_n": 1, "freq_mask_f": 27,
               "time_mask_n": 1, "time_mask_t": 100, "time_mask_p": 1.},
        "LD": {"time_wrap_w": 80, "freq_mask_n": 2, "freq_mask_f": 27,
               "time_mask_n": 2, "time_mask_t": 100, "time_mask_p": 1.},
        "SM": {"time_wrap_w": 40, "freq_mask_n": 2, "freq_mask_f": 15,
               "time_mask_n": 2, "time_mask_t": 70, "time_mask_p": 0.2},
        "SS": {"time_wrap_w": 40, "freq_mask_n": 2, "freq_mask_f": 27,
               "time_mask_n": 2, "time_mask_t": 70, "time_mask_p": 0.2},
    }

    def __init__(self, time_wrap_w=0, freq_mask_n=1, freq_mask_f=27,
                 time_mask_n=1, time_mask_t=100, time_mask_p=1.0,
                 mask_value=None):
        self._freq_mask_n = freq_mask_n
        self._freq_mask_f = freq_mask_f
        self._time_mask_n = time_mask_n
        self._time_mask_t = time_mask_t
        self._time_mask_p = time_mask_p
        self._mask_value = mask_value
        assert self._time_mask_t > 0 and self._freq_mask_f > 0

    @classmethod
    def build(cls, setting):
        """Accepts a preset name ("LB"), a YAML string, or a dict."""
        if setting is None:
            return None
        if isinstance(setting, str):
            setting = yaml.safe_load(setting)
        if isinstance(setting, str):
            setting = cls._PREDEF_SETTINGS.get(setting)
        if setting is None:
            return None
        assert isinstance(setting, dict), f"Unknown setting: {setting}"
        return cls(**setting)

    # ------------------------- numpy ------------------------- #

    def apply_numpy(self, spectrogram: np.ndarray,
                    rng: Optional[np.random.RandomState] = None
                    ) -> np.ndarray:
        """spectrogram [T, F] -> masked copy."""
        if rng is None:
            rng = np.random
        spec = np.array(spectrogram, copy=True)
        num_t, num_f = spec.shape
        mask_value = (self._mask_value if self._mask_value is not None
                      else float(spec.mean()))
        for _ in range(self._freq_mask_n):
            f = rng.randint(0, self._freq_mask_f)
            if num_f - f <= 0:
                continue
            f0 = rng.randint(0, num_f - f)
            spec[:, f0:f0 + f] = mask_value
        max_t = int(min(self._time_mask_t, self._time_mask_p * num_t))
        for _ in range(self._time_mask_n):
            if max_t <= 0:
                continue
            t = rng.randint(0, max_t)
            if num_t - t <= 0:
                continue
            t0 = rng.randint(0, num_t - t)
            spec[t0:t0 + t, :] = mask_value
        return spec

    __call__ = apply_numpy

    # -------------------------- jax -------------------------- #

    def apply_jax(self, rng, spectrogram, true_length=None):
        """jit-safe masking: spectrogram [T, F] (or [B, T, F] via vmap
        by the caller), `true_length` scalar for padded inputs."""
        import jax
        import jax.numpy as jnp
        num_t, num_f = spectrogram.shape
        length = num_t if true_length is None else true_length
        mask_value = (self._mask_value if self._mask_value is not None
                      else jnp.mean(spectrogram))
        spec = spectrogram
        keys = jax.random.split(rng, 2 * (self._freq_mask_n
                                          + self._time_mask_n))
        ki = 0
        freqs = jnp.arange(num_f)
        for _ in range(self._freq_mask_n):
            f = jax.random.randint(keys[ki], (), 0, self._freq_mask_f)
            f0 = jax.random.randint(keys[ki + 1], (), 0,
                                    jnp.maximum(num_f - f, 1))
            ki += 2
            mask = (freqs >= f0) & (freqs < f0 + f)
            spec = jnp.where(mask[None, :], mask_value, spec)
        times = jnp.arange(num_t)
        max_t = jnp.minimum(self._time_mask_t,
                            (self._time_mask_p
                             * jnp.asarray(length, jnp.float32)
                             ).astype(jnp.int32))
        for _ in range(self._time_mask_n):
            t = jax.random.randint(keys[ki], (), 0, jnp.maximum(max_t, 1))
            t0 = jax.random.randint(keys[ki + 1], (), 0,
                                    jnp.maximum(length - t, 1))
            ki += 2
            mask = (times >= t0) & (times < t0 + t)
            spec = jnp.where(mask[:, None], mask_value, spec)
        return spec
