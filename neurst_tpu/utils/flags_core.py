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
"""Typed flags with recursive, registry-aware parsing.

Behavioral parity with ``/root/reference/neurst/utils/flags_core.py``:

* ``Flag`` — a typed scalar/list flag (INT/BOOL/FLOAT/STRING), with
  choices and aliases.  String values are YAML-parsed so dict/list
  literals can be passed on the command line.
* ``ModuleFlag`` — a ``{name}.class`` + ``{name}.params`` pair whose
  valid classes come from a registry.  After the class is picked, its
  own ``class_or_method_args()`` flags are parsed from the remaining
  argv and nested into ``{name}.params`` (recursively, so a task's
  pipeline's tokenizer's flags all resolve), mirroring the reference's
  "intelligent" two-level parsing.
* ``COMMON_DATA_ARGS`` — shared batching/shape flags.

The parser here is hand-rolled over argv (``--key value``,
``--key=value``, bare boolean flags) rather than argparse, because the
flag set is only known *after* classes are chosen.
"""

import logging
from typing import Any, Dict, List, Optional

import yaml

from neurst_tpu.utils.registry import REGISTRIES, get_registered_class

__all__ = ["Flag", "ModuleFlag", "COMMON_DATA_ARGS",
           "parse_flags", "extend_parsed_flags", "yaml_load_checking",
           "get_argv_dict", "verbose_flags"]


class Flag(object):
    """A typed flag definition."""

    class TYPE:
        INTEGER = "int"
        FLOAT = "float"
        STRING = "str"
        BOOLEAN = "bool"

    is_module_flag = False

    def __init__(self, name, dtype=None, default=None, help="",
                 multiple=False, choices=None, alias=None, required=False):
        self.name = name
        self.dtype = dtype or Flag.TYPE.STRING
        self.default = default
        self.help = help
        self.multiple = multiple
        self.choices = choices
        self.alias = alias
        self.required = required

    def convert(self, value):
        """Converts a raw (string or python) value to the flag's type."""
        if value is None:
            return None
        if self.multiple:
            if isinstance(value, str):
                value = yaml_load_checking(value)
            if not isinstance(value, (list, tuple)):
                value = [value]
            return [self._convert_one(v) for v in value]
        return self._convert_one(value)

    def _convert_one(self, value):
        if value is None:
            return None
        if self.dtype == Flag.TYPE.INTEGER:
            if isinstance(value, bool):
                return int(value)
            return int(value)
        if self.dtype == Flag.TYPE.FLOAT:
            return float(value)
        if self.dtype == Flag.TYPE.BOOLEAN:
            if isinstance(value, bool):
                return value
            if isinstance(value, str):
                return value.strip().lower() in ("true", "1", "yes", "y")
            return bool(value)
        # STRING: YAML-parse to allow dict/list literal values
        if isinstance(value, str):
            parsed = yaml_load_checking(value)
            return parsed
        return value


class ModuleFlag(object):
    """A ``{name}.class`` + ``{name}.params`` flag pair bound to a registry."""

    is_module_flag = True

    def __init__(self, name, module_name=None, default=None, help="",
                 required=False):
        # ``ModuleFlag("task", ...)`` or ``ModuleFlag("validator", "validator", ...)``
        self.name = name
        self.module_name = module_name or name
        self.default = default
        self.help = help
        self.required = required

    @property
    def cls_key(self):
        return f"{self.name}.class"

    @property
    def params_key(self):
        return f"{self.name}.params"


COMMON_DATA_ARGS = [
    Flag("batch_size", dtype=Flag.TYPE.INTEGER, default=None,
         help="The number of samples (or tokens) per batch (global)."),
    Flag("batch_by_tokens", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Whether to batch the data by the number of tokens."),
    Flag("shuffle_buffer", dtype=Flag.TYPE.INTEGER, default=None,
         help="The buffer size for data shuffling."),
    Flag("cache_dataset", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Whether to cache the processed dataset in memory."),
    Flag("max_src_len", dtype=Flag.TYPE.INTEGER, default=None,
         help="The maximum source length of training data."),
    Flag("max_trg_len", dtype=Flag.TYPE.INTEGER, default=None,
         help="The maximum target length of training data."),
    Flag("truncate_src", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Whether to truncate source to max_src_len."),
    Flag("truncate_trg", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Whether to truncate target to max_trg_len."),
]


def yaml_load_checking(value):
    """YAML-parses a string value, falling back to the raw string."""
    if not isinstance(value, str):
        return value
    try:
        loaded = yaml.safe_load(value)
    except Exception:
        return value
    # yaml parses "no"/"yes" etc. into bool; plain words into str
    if loaded is None and value.strip() not in ("", "null", "~", "None"):
        return value
    return loaded


def get_argv_dict(argv: List[str]):
    """Scans argv into an ordered {key: raw_value} dict.

    Supports ``--key value``, ``--key=value``, repeated keys (kept as a
    list) and bare boolean flags (value True).  Returns (dict, leftovers)
    where leftovers are positional tokens.
    """
    out: Dict[str, Any] = {}
    leftovers = []
    i = 0
    n = len(argv)
    while i < n:
        tok = argv[i]
        if tok.startswith("--"):
            body = tok[2:]
            if "=" in body:
                key, val = body.split("=", 1)
                i += 1
            else:
                key = body
                if i + 1 < n and not argv[i + 1].startswith("--"):
                    val = argv[i + 1]
                    i += 2
                else:
                    val = True
                    i += 1
            if key in out:
                prev = out[key]
                if isinstance(prev, list):
                    prev.append(val)
                else:
                    out[key] = [prev, val]
            else:
                out[key] = val
        else:
            leftovers.append(tok)
            i += 1
    return out, leftovers


def _lookup_argv(argv_dict, consumed, *keys):
    for k in keys:
        if k is None:
            continue
        if k in argv_dict:
            consumed.add(k)
            return argv_dict[k]
    return None


def _parse_flag_list(flag_list, argv_dict, consumed, existing: dict,
                     backtrack: Optional[set] = None):
    """Parses a list of Flag/ModuleFlag against an argv dict, merging over
    ``existing`` (e.g. values from YAML configs). CLI takes precedence."""
    result = dict(existing or {})
    for f in flag_list:
        if f.is_module_flag:
            _parse_module_flag(f, argv_dict, consumed, result)
        else:
            raw = _lookup_argv(argv_dict, consumed, f.name, f.alias)
            if raw is not None:
                result[f.name] = f.convert(raw)
            elif f.name not in result:
                result[f.name] = f.convert(f.default) if f.default is not None \
                    else f.default
            else:
                result[f.name] = f.convert(result[f.name])
            if f.choices and result[f.name] is not None \
                    and result[f.name] not in f.choices:
                raise ValueError(
                    f"--{f.name} must be one of {f.choices}, "
                    f"got {result[f.name]}")
            if f.required and result.get(f.name) is None:
                raise ValueError(f"--{f.name} is required.")
    return result


def _parse_module_flag(mf: ModuleFlag, argv_dict, consumed, result: dict):
    """Resolves a ModuleFlag: picks the class, then recursively parses the
    class's own declared flags into ``{name}.params``."""
    # class name: CLI --{name} or --{name}.class > existing config > default
    raw_cls = _lookup_argv(argv_dict, consumed, mf.name, mf.cls_key)
    cls_name = raw_cls if raw_cls is not None else result.get(
        mf.cls_key, result.get(mf.name))
    existing_params = dict(result.get(mf.params_key) or {})
    # a full {class:..., params:...} dict under the short name (YAML):
    # its params survive even when the CLI re-states the class
    short = result.get(mf.name)
    if isinstance(short, dict):
        existing_params = _deep_merge(
            existing_params, short.get("params") or {})
        if cls_name is raw_cls is None or isinstance(cls_name, dict):
            cls_name = short.get("class")
    if isinstance(cls_name, dict):
        cls_name = cls_name.get("class")
    if cls_name is None:
        cls_name = mf.default
    result.pop(mf.name, None)
    result[mf.cls_key] = cls_name
    # params given wholesale as YAML dict on CLI
    raw_params = _lookup_argv(argv_dict, consumed, mf.params_key)
    if raw_params is not None:
        parsed = yaml_load_checking(raw_params)
        if not isinstance(parsed, dict):
            raise ValueError(f"--{mf.params_key} must be a YAML dict")
        existing_params = _deep_merge(existing_params, parsed)
    if cls_name is None:
        if mf.required:
            raise ValueError(f"--{mf.name} is required.")
        result[mf.params_key] = existing_params
        return
    cls = get_registered_class(cls_name, mf.module_name) \
        if mf.module_name in REGISTRIES else None
    if cls is not None and hasattr(cls, "class_or_method_args"):
        sub_flags = cls.class_or_method_args()
        result[mf.params_key] = _parse_flag_list(
            sub_flags, argv_dict, consumed, existing_params)
    else:
        result[mf.params_key] = existing_params


def _deep_merge(base: dict, update: dict) -> dict:
    out = dict(base)
    for k, v in (update or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def parse_flags(flag_list, argv: List[str], existing: Optional[dict] = None,
                warn_unused: bool = True) -> dict:
    """Top-level entry: parses argv against ``flag_list`` merged over
    ``existing`` (config-file values).  Returns the resolved nested dict.
    """
    argv_dict, _ = get_argv_dict(argv)
    consumed: set = set()
    result = _parse_flag_list(flag_list, argv_dict, consumed, existing or {})
    if warn_unused:
        for k in argv_dict:
            if k not in consumed:
                logging.debug("Unrecognized flag: --%s", k)
    return result


def extend_parsed_flags(result: dict, extra_flags, argv: List[str]) -> dict:
    """Parses additional flags (e.g. entry-specific) into an existing result."""
    argv_dict, _ = get_argv_dict(argv)
    consumed: set = set()
    return _parse_flag_list(extra_flags, argv_dict, consumed, result)


def verbose_flags(args: dict, title="Parsed flags"):
    lines = [f"========== {title} =========="]
    lines.append(yaml.safe_dump(_to_plain(args), default_flow_style=False))
    logging.info("\n".join(lines))


def _to_plain(x):
    if isinstance(x, dict):
        return {k: _to_plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_plain(v) for v in x]
    return x
