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
"""Config-file loading/merging and model-dir config persistence.

Parity with ``/root/reference/neurst/utils/configurable.py``:
``load_from_config_path`` merges multiple YAML/JSON files in order;
``deep_merge_dict`` recursively merges; ``ModelConfigs`` dumps/loads
``model_configs.yml`` inside a model dir so that inference can rebuild
the exact task+model with no flags.
"""

import copy
import json
import logging
import os
from typing import List, Optional, Union

import yaml

__all__ = ["deep_merge_dict", "load_from_config_path", "ModelConfigs",
           "flatten_string_list"]

MODEL_CONFIG_YAML_FILENAME = "model_configs.yml"


def flatten_string_list(paths: Union[str, List[str], None]) -> List[str]:
    """Accepts 'a,b', ['a', 'b,c'] etc. and returns a flat list."""
    if paths is None:
        return []
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        if isinstance(p, str):
            out.extend(x.strip() for x in p.split(",") if x.strip())
        elif isinstance(p, (list, tuple)):
            out.extend(flatten_string_list(list(p)))
        elif p is not None:
            out.append(p)
    return out


def strip_training_only_model_flags(model_params: Optional[dict]) -> dict:
    """Drops model flags that only make sense inside the training step.

    Pipeline parallelism (``*.pipeline_stages`` /
    ``*.pipeline_microbatches``, layers/pipeline.py) reshapes the layer
    stacks for the GPipe schedule and requires a mesh "stage" axis;
    decode/eval/export entries rebuild the model WITHOUT them and the
    checkpoint bridge (checkpoints._bridge_scan_layouts) reshapes the
    stacked ``[stages, layers_per_stage, ...]`` params transparently.
    Numerics are identical either way.
    """
    out = dict(model_params or {})
    for key in list(out):
        if key.endswith(".pipeline_stages") \
                or key.endswith(".pipeline_microbatches"):
            out.pop(key)
    return out


def deep_merge_dict(base: dict, update: Optional[dict],
                    local_overwrite: bool = True) -> dict:
    """Recursively merges ``update`` into ``base``; update wins on conflicts.

    With ``local_overwrite=False`` a copy is returned and inputs are kept
    intact.
    """
    if not local_overwrite:
        base = copy.deepcopy(base)
    if update is None:
        return base
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_merge_dict(base[k], v, local_overwrite=True)
        else:
            base[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v
    return base


def load_from_config_path(config_paths, ignore_missing: bool = False) -> dict:
    """Loads and merges a list of YAML/JSON config files, in order."""
    merged: dict = {}
    for path in flatten_string_list(config_paths):
        if not os.path.exists(path):
            if ignore_missing:
                logging.warning("Config path not found (ignored): %s", path)
                continue
            raise FileNotFoundError(f"Config file not found: {path}")
        logging.info("Loading config from %s", path)
        with open(path, "r", encoding="utf-8") as f:
            if path.endswith(".json"):
                cfg = json.load(f)
            else:
                cfg = yaml.safe_load(f)
        if cfg:
            if not isinstance(cfg, dict):
                raise ValueError(f"Config file {path} must contain a mapping")
            merged = deep_merge_dict(merged, cfg)
    return merged


class ModelConfigs(object):
    """Persists the full resolved configuration inside a model directory."""

    @staticmethod
    def dump(model_configs: dict, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, MODEL_CONFIG_YAML_FILENAME)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            yaml.safe_dump(_yaml_safe(model_configs), f,
                           default_flow_style=False, sort_keys=False)
        os.replace(tmp, path)
        logging.info("Saved model configs to %s", path)

    @staticmethod
    def load(model_dir: str) -> dict:
        path = model_dir
        if os.path.isdir(model_dir):
            path = os.path.join(model_dir, MODEL_CONFIG_YAML_FILENAME)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Could not find {MODEL_CONFIG_YAML_FILENAME} under "
                f"{model_dir}")
        with open(path, "r", encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
        logging.info("Loaded model configs from %s", path)
        return cfg or {}

    @staticmethod
    def exists(model_dir: str) -> bool:
        return os.path.exists(
            os.path.join(model_dir, MODEL_CONFIG_YAML_FILENAME))


def _yaml_safe(x):
    """Converts numpy / tuples into plain python for YAML dumping."""
    if isinstance(x, dict):
        return {str(k): _yaml_safe(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_yaml_safe(v) for v in x]
    if hasattr(x, "item") and callable(getattr(x, "item")):
        try:
            return x.item()
        except Exception:
            return str(x)
    return x
