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
"""Prune-Tune mask-aware generation — a user plug-in example.

Parity: /root/reference/examples/prune_tune/src/mask_sequence_generator.py
(entry names ``mask_predict``/``mask_generation``): decode a
prune-tuned model with the sparsity mask applied to the restored
weights, so the evaluated network is exactly the masked subnetwork the
Prune-Tune recipe trained.

The mask can come from
  * ``--mask_pkl``: a pickle or ``.npz`` of ``{param_name: mask}``
    (the reference uses a pickle aligned with Keras weight order; here
    masks are keyed by the flat parameter name, the same naming the
    checkpoints use), or
  * ``--mask_from_ckpt``: derive the mask from a pruned general-domain
    checkpoint — dense slots are the NONZERO weights there, matching
    how partial_trainer derives its tunable set.

Usage:
    python -m neurst_tpu.cli.run_exp --entry mask_predict \
        --include examples/prune_tune/src/mask_sequence_generator.py \
        --mask_from_ckpt general_ckpt_dir ... (normal predict flags)
"""

import logging
import pickle

import numpy as np

from neurst_tpu.exps.base_experiment import register_exp
from neurst_tpu.exps.sequence_generator import SequenceGenerator
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.flags_core import Flag


def _load_mask(path):
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: np.asarray(data[k]) for k in data.files}
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    if not isinstance(loaded, dict):
        raise ValueError(
            "mask_pkl must hold a {param_name: mask} dict; the "
            "reference's order-aligned list format is ambiguous "
            "against a pytree parameterization")
    return {k: np.asarray(v) for k, v in loaded.items()}


@register_exp(["mask_predict", "mask_generation"])
class MaskSequenceGenerator(SequenceGenerator):
    """Sequence generation with a parameter mask applied post-restore."""

    def __init__(self, args, **kwargs):
        super().__init__(args, **kwargs)
        self._mask_flat = None
        if args.get("mask_pkl"):
            logging.info("Loading mask from %s", args["mask_pkl"])
            self._mask_flat = _load_mask(args["mask_pkl"])
        elif args.get("mask_from_ckpt"):
            path = ckpt_lib.latest_checkpoint(args["mask_from_ckpt"])
            logging.info("Deriving mask from pruned checkpoint %s", path)
            flat = ckpt_lib.restore_checkpoint_params(path)
            self._mask_flat = {
                name: (np.asarray(w) != 0.0).astype(np.float32)
                for name, w in flat.items()}

    @staticmethod
    def class_or_method_args():
        return SequenceGenerator.class_or_method_args() + [
            Flag("mask_pkl", dtype=Flag.TYPE.STRING, default=None,
                 help="Path to a {param_name: mask} pickle/.npz file."),
            Flag("mask_from_ckpt", dtype=Flag.TYPE.STRING, default=None,
                 help="Derive the mask from this pruned checkpoint dir "
                      "(mask = weight != 0)."),
        ]

    def restore_params(self, params):
        params = super().restore_params(params)
        if self._mask_flat is None:
            return params
        flat = ckpt_lib.flatten_params(params)
        applied, skipped = 0, []
        out = {}
        for name, w in flat.items():
            m = self._mask_flat.get(name)
            if m is None:
                out[name] = w
                skipped.append(name)
            else:
                out[name] = np.asarray(w) * m.astype(np.asarray(w).dtype)
                applied += 1
        logging.info("mask applied to %d params (%d unmasked)",
                     applied, len(skipped))
        return ckpt_lib.unflatten_params(out)
