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
"""bf16 stored parameters with a float32 master copy in the optimizer.

The default policy keeps f32 parameters and casts to bf16 at use
(reference: TF mixed_float16 keeps f32 variables).  This optax wrapper
flips the storage: the live param pytree is bf16 (halving its HBM
reads in forward AND backward) while updates accumulate into an f32
master inside the optimizer state, so small updates are not lost to
bf16 rounding.  Measured at transformer_base [256, 128] the param
traffic is a minor term (~1 ms/step), so this is an option, not the
default — see BENCH_r03 extras for the A/B.
"""

import jax
import jax.numpy as jnp
import optax

__all__ = ["with_bf16_params", "cast_params_bf16"]


def _is_float(x):
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)


def cast_params_bf16(params):
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if _is_float(p) else p, params)


def with_bf16_params(tx: optax.GradientTransformation
                     ) -> optax.GradientTransformation:
    """Wraps `tx` so it can be applied to bf16-stored params.

    init() receives the bf16 params and keeps (f32 master, tx state on
    the master).  update() runs `tx` on the f32 grads/master, advances
    the master, and emits the update that moves the bf16 params to
    round(master'): ``new_params = params + emitted == bf16(master')``.
    """

    def init(params):
        master = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32) if _is_float(p) else p, params)
        return {"master": master, "inner": tx.init(master)}

    def update(updates, state, params=None):
        grads32 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32) if _is_float(g) else g, updates)
        inner_updates, inner_state = tx.update(grads32, state["inner"],
                                               state["master"])
        master = optax.apply_updates(state["master"], inner_updates)
        # emit FLOAT32 deltas: optax.apply_updates adds in the promoted
        # dtype and casts back, so the live bf16 param lands on exactly
        # bf16(master') — a bf16 delta would round (p + (m-p) != m in
        # bf16), letting live params drift a ulp from the master and
        # breaking exact save/restore resume
        emitted = jax.tree_util.tree_map(
            lambda m, p: (m - p.astype(jnp.float32))
            if _is_float(p) else jnp.zeros_like(p),
            master, params)
        return emitted, {"master": master, "inner": inner_state}

    return optax.GradientTransformation(init, update)
