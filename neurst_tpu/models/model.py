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
"""Model abstraction (parity: /root/reference/neurst/models/model.py).

TPU-first redesign: a registered "model" is a *spec object* wrapping a
pure flax.linen module.  It owns the config (`args`), vocabulary metas,
and exposes pure functions over explicit parameter pytrees:

    model.init_params(rng)                  -> params
    model.call(params, inputs, ...)         -> logits (teacher forcing)
    model.prepare_generation(params, ...)   -> (symbols_to_logits_fn, init)

Keeping parameters external (instead of Keras object state) is what
makes jit/pjit, checkpoint averaging, ensembles and beam-search cache
reordering trivial.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from neurst_tpu.utils.registry import setup_registry

__all__ = ["BaseModel", "build_model", "register_model"]


def dtype_by_name(name: Optional[str]):
    return {None: jnp.float32, "float32": jnp.float32, "fp32": jnp.float32,
            "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float16": jnp.float16}[name]


class BaseModel(object):
    """Holds (args, metas) and wraps a linen module."""

    def __init__(self, args: Dict[str, Any], name: Optional[str] = None):
        self._args = dict(args or {})
        self._name = name or type(self).__name__
        self._module = None  # set by subclasses

    @property
    def args(self):
        return self._args

    @property
    def name(self):
        return self._name

    @property
    def module(self):
        return self._module

    @staticmethod
    def class_or_method_args():
        return []

    @classmethod
    def new(cls, args, src_meta=None, trg_meta=None, name=None):
        """Builds the model spec from config + vocab metas."""
        raise NotImplementedError

    @classmethod
    def build_model_args_by_name(cls, name: str) -> Optional[dict]:
        """Resolves a named hparams set (e.g. ``transformer_base``)."""
        return None

    # -------------------- pure-function interface -------------------- #

    def example_inputs(self) -> dict:
        """Tiny inputs for parameter shape inference."""
        raise NotImplementedError

    def init_params(self, rng) -> dict:
        """Initializes the parameter pytree (unboxed plain arrays; the
        partitioning metadata is recovered via ``params_spec``).

        The flax init runs under ``jax.jit``: eager init dispatches one
        tiny op per parameter, which on a remote-RTT device link (the
        TPU tunnel) costs ~90 s for a transformer_base; as ONE compiled
        program it is milliseconds to run and lands in the persistent
        compilation cache like any other program."""
        from flax import linen as nn

        def _init(r, inputs):
            return self._module.init({"params": r}, **inputs)

        variables = jax.jit(_init)(rng, self.example_inputs())
        return nn.meta.unbox(variables["params"])

    def params_spec(self):
        """Logical PartitionSpec pytree for the parameters (no
        allocation; used to build mesh shardings)."""
        from flax import linen as nn

        def _init():
            return self._module.init(
                {"params": jax.random.PRNGKey(0)}, **self.example_inputs())
        shapes = jax.eval_shape(_init)
        return nn.get_partition_spec(shapes)["params"]

    def call(self, params, inputs: dict, is_training: bool = False,
             rngs: Optional[dict] = None):
        """Forward pass -> logits."""
        raise NotImplementedError

    def call_train(self, params, inputs: dict,
                   rngs: Optional[dict] = None,
                   want_prelogits: bool = False):
        """Training forward -> (logits, auxiliary_loss).

        The auxiliary loss is a scalar added to the criterion loss by
        the train step (zero unless the model sows into the "losses"
        collection, e.g. the MoE load-balancing loss).
        ``want_prelogits`` is ignored here — models that can skip the
        logits materialization for the fused softmax+CE train path
        override this AND supports_fused_softmax_ce."""
        del want_prelogits
        return (self.call(params, inputs, is_training=True, rngs=rngs),
                jnp.zeros([], jnp.float32))

    def supports_fused_softmax_ce(self) -> bool:
        return False

    def __call__(self, params, inputs, is_training=False, rngs=None):
        return self.call(params, inputs, is_training=is_training, rngs=rngs)

    def param_count(self, params) -> int:
        return sum(int(np.prod(x.shape)) if hasattr(x, "shape") else 0
                   for x in jax.tree_util.tree_leaves(params))


import numpy as np  # noqa: E402  (used above in param_count)


def _create_model(cls, args, **kwargs):
    return cls.new(args, **kwargs)


build_model, register_model = setup_registry(
    "model", base_class=BaseModel, create_fn=_create_model)
