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
"""Magnitude pruning as an optax transform.

Parity: /root/reference/neurst/sparsity/pruning_optimizer.py:22-128 —
wraps ``apply_gradients``: maintains per-variable binary masks,
re-prunes by magnitude every ``pruning_frequency`` steps, and keeps the
mask applied between updates so pruned weights stay exactly zero.
Variable selection by regex include/exclude mirrors trainer.py:136-140.

TPU-first: everything runs inside the jitted train step —
``lax.cond``-gated mask recomputation via per-tensor quantile
thresholds; no host round-trips.
"""

import re
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from neurst_tpu.sparsity.pruning_schedule import PruningSchedule

__all__ = ["prune_gradients", "make_variable_filter"]


class PruneState(NamedTuple):
    inner: optax.OptState
    masks: dict
    step: jnp.ndarray


def make_variable_filter(include: Optional[str] = None,
                         exclude: Optional[str] = None):
    """name -> bool: whether a variable participates in pruning."""
    inc = re.compile(include) if include else None
    exc = re.compile(exclude) if exclude else None

    def f(name: str) -> bool:
        if inc is not None and not inc.search(name):
            return False
        if exc is not None and exc.search(name):
            return False
        return True
    return f


def _mask_for(weight, sparsity):
    """Binary keep-mask pruning the smallest-|w| `sparsity` fraction."""
    flat = jnp.abs(weight.reshape(-1)).astype(jnp.float32)
    threshold = jnp.quantile(flat, sparsity)
    return (jnp.abs(weight) > threshold).astype(weight.dtype)


def prune_gradients(inner: optax.GradientTransformation,
                    schedule: PruningSchedule,
                    variable_filter=None) -> optax.GradientTransformation:
    """Wraps `inner` so that, after its update, masked weights land on
    exactly zero (update' = masked(params + update) - params)."""
    if variable_filter is None:
        variable_filter = lambda name: True

    from neurst_tpu.utils.checkpoints import flatten_params, unflatten_params

    def participates(params):
        flat = flatten_params(params)
        return unflatten_params({k: variable_filter(k) for k in flat})

    def init(params):
        # masks exist for every leaf; non-participating leaves keep ones
        masks = jax.tree_util.tree_map(jnp.ones_like, params)
        return PruneState(inner=inner.init(params), masks=masks,
                          step=jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        assert params is not None, "prune_gradients requires params"
        updates, inner_state = inner.update(grads, state.inner, params)
        new_params = optax.apply_updates(params, updates)
        sparsity = schedule.target_sparsity(state.step)
        should = schedule.should_prune(state.step)
        part = participates(params)  # static bool pytree

        def refresh(args):
            new_params, masks = args
            return jax.tree_util.tree_map(
                lambda w, m, use: _mask_for(w, sparsity) if use else m,
                new_params, masks, part)

        masks = jax.lax.cond(should, refresh, lambda args: args[1],
                             (new_params, state.masks))
        masked = jax.tree_util.tree_map(
            lambda w, m: w * m, new_params, masks)
        final_updates = jax.tree_util.tree_map(
            lambda mp, p: mp - p, masked, params)
        return final_updates, PruneState(inner=inner_state, masks=masks,
                                         step=state.step + 1)

    return optax.GradientTransformation(init, update)
