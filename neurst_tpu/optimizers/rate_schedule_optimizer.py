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
"""Rate-scheduled (windowed) variable updates — the CTNMT controller.

Parity: /root/reference/neurst/optimizers/rate_schedule_optimizer.py:
23-84 — gradients of variables matching ``pattern`` are scaled by a
step-dependent factor: 0 before ``freeze_until``, then linearly ramping
to 1 over ``ramp_steps`` (used to freeze/thaw the fused BERT encoder).

Implemented as an optax gradient transformation wrapped around the
inner optimizer; the reference's dynamic-subclassing "optimizer
controller" (optimizers/__init__.py:31-47) maps to plain optax
composition.
"""

import re
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["rate_scheduled_updates"]


class RateScheduleState(NamedTuple):
    inner: optax.OptState
    step: jnp.ndarray


def rate_scheduled_updates(inner: optax.GradientTransformation,
                           pattern: str,
                           freeze_until: int = 0,
                           ramp_steps: int = 1
                           ) -> optax.GradientTransformation:
    """Scales matching variables' gradients by a schedule in [0, 1]."""
    regex = re.compile(pattern)

    from neurst_tpu.utils.checkpoints import flatten_params, unflatten_params

    def match_tree(params):
        flat = flatten_params(params)
        return unflatten_params({k: bool(regex.search(k)) for k in flat})

    def init(params):
        return RateScheduleState(inner=inner.init(params),
                                 step=jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        step = state.step
        factor = jnp.clip(
            (step - freeze_until) / max(float(ramp_steps), 1.0), 0.0, 1.0)
        matches = match_tree(grads)
        scaled = jax.tree_util.tree_map(
            lambda g, m: g * factor if m else g, grads, matches)
        updates, inner_state = inner.update(scaled, state.inner, params)
        return updates, RateScheduleState(inner=inner_state,
                                          step=step + 1)

    return optax.GradientTransformation(init, update)
