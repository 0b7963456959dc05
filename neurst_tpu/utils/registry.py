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
"""Named registries for every pluggable subsystem.

Behavioral parity with the reference registry (see
``/root/reference/neurst/utils/registry.py:20-151``): each subsystem
(task, model, dataset, tokenizer, criterion, optimizer, lr_schedule,
metric, search method, validator, entry, converter, feature_extractor,
hparams set, ...) owns a named registry.  ``setup_registry`` returns a
``(build_fn, register_fn)`` pair.  Registered classes are addressable by
their class name, an auto-derived snake_case alias, and any explicit
aliases.  The builder accepts either a plain name string or a dict with
``{prefix}.class`` / ``{prefix}.params`` keys and fills flag defaults
declared by the class's ``class_or_method_args()``.

Unlike the reference there is a single backend (JAX); the multi-backend
("tf"/"pt") dimension is dropped.
"""

import re
from typing import Any, Callable, Dict, Optional

__all__ = [
    "REGISTRIES",
    "setup_registry",
    "get_registered_class",
    "get_registry",
    "registry_names",
]

# registry name -> {alias -> class}
REGISTRIES: Dict[str, Dict[str, Any]] = {}
# registry name -> base class (for validation / introspection)
_BASE_CLASSES: Dict[str, Any] = {}
# registry name -> create fn
_CREATE_FNS: Dict[str, Callable] = {}


def camel_to_snake(name: str) -> str:
    """CamelCase -> snake_case (``TransformerEncoder`` -> ``transformer_encoder``)."""
    s1 = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s1).lower()


def _default_create(cls, args: Optional[dict], **kwargs):
    if args is None:
        args = {}
    return cls(args, **kwargs)


def registry_names():
    return sorted(REGISTRIES.keys())


def get_registry(registry_name: str) -> Dict[str, Any]:
    if registry_name not in REGISTRIES:
        raise KeyError(f"Unknown registry: {registry_name}. "
                       f"Available: {registry_names()}")
    return REGISTRIES[registry_name]


def get_registered_class(name_or_cls, registry_name: str):
    """Looks up a registered class by (possibly aliased) name.

    Accepts a class (returned as-is if registered), a name string
    (case-insensitive on the snake alias) or None.
    """
    registry = get_registry(registry_name)
    if name_or_cls is None:
        return None
    if isinstance(name_or_cls, type):
        return name_or_cls
    if not isinstance(name_or_cls, str):
        raise ValueError(
            f"Cannot lookup {registry_name} registry with {type(name_or_cls)}")
    if name_or_cls in registry:
        return registry[name_or_cls]
    lowered = name_or_cls.lower()
    if lowered in registry:
        return registry[lowered]
    return None


def setup_registry(registry_name: str,
                   base_class=None,
                   create_fn: Optional[Callable] = None,
                   verbose: bool = False):
    """Creates (or fetches) a registry and returns ``(build, register)``.

    ``register`` may be used as a bare decorator, or called with one or
    more alias names::

        @register_model
        class Transformer(...): ...

        @register_model("seq2seq", "my_alias")
        class EncoderDecoderModel(...): ...

    ``build(args, **kwargs)`` accepts:
      * a name string: builds with default params;
      * a dict holding ``{registry_name}.class`` and optional
        ``{registry_name}.params``;
      * a dict holding ``class``/``params`` directly.
    """
    if registry_name not in REGISTRIES:
        REGISTRIES[registry_name] = {}
        _BASE_CLASSES[registry_name] = base_class
        _CREATE_FNS[registry_name] = create_fn or _default_create
    registry = REGISTRIES[registry_name]

    def do_register(cls, names):
        base = _BASE_CLASSES.get(registry_name)
        if base is not None and isinstance(cls, type) and not issubclass(cls, base):
            raise TypeError(
                f"{cls.__name__} must extend {base.__name__} to be "
                f"registered in '{registry_name}'")
        all_names = list(names) or []
        all_names.append(cls.__name__)
        snake = camel_to_snake(cls.__name__)
        if snake not in all_names:
            all_names.append(snake)
        for n in all_names:
            key = n if n == cls.__name__ else n.lower()
            existing = registry.get(key)
            if existing is not None and existing is not cls:
                raise LookupError(
                    f"name '{n}' already registered in '{registry_name}' "
                    f"by {existing.__name__}")
            registry[key] = cls
        return cls

    def register(*args):
        # bare decorator: @register
        if len(args) == 1 and isinstance(args[0], type):
            return do_register(args[0], [])
        # with alias names: @register("name1", "name2") — also accepts
        # a list/tuple, @register(["name1", "name2"]), like the
        # reference registry (registry.py:107-135)
        names = []
        for a in args:
            names.extend(a if isinstance(a, (list, tuple)) else [a])
        for n in names:
            if not isinstance(n, str):
                raise ValueError(f"register() aliases must be str, got {n}")

        def wrap(cls):
            return do_register(cls, names)
        return wrap

    def build(args, **kwargs):
        cls_key = f"{registry_name}.class"
        params_key = f"{registry_name}.params"
        if args is None:
            return None
        if isinstance(args, str):
            cls_name, params = args, {}
        elif isinstance(args, dict):
            if cls_key in args:
                cls_name = args[cls_key]
                params = args.get(params_key) or {}
            elif "class" in args:
                cls_name = args["class"]
                params = args.get("params") or {}
            else:
                raise ValueError(
                    f"build_{registry_name} requires '{cls_key}' or 'class' "
                    f"in args, got keys: {list(args.keys())}")
        else:
            raise ValueError(
                f"build_{registry_name}: unsupported args {type(args)}")
        if cls_name is None:
            return None
        cls = get_registered_class(cls_name, registry_name)
        if cls is None:
            raise LookupError(
                f"'{cls_name}' is not registered in '{registry_name}'. "
                f"Known: {sorted(registry.keys())}")
        # fill defaults declared by the class's own flags
        params = dict(params)
        if hasattr(cls, "class_or_method_args"):
            declared = set()
            for f in cls.class_or_method_args():
                fname = getattr(f, "name", None)
                if fname is None:
                    continue
                if _is_module_flag(f):
                    declared.update((fname, f"{fname}.class",
                                     f"{fname}.params"))
                    continue
                declared.add(fname)
                alias = getattr(f, "alias", None)
                if alias:
                    declared.add(alias)
                if fname not in params:
                    params[fname] = f.default
            # a typo'd param key would otherwise be dropped silently
            # (e.g. max_decode_length vs maximum_decode_length)
            if not getattr(cls, "ALLOW_UNDECLARED_PARAMS", False):
                unknown = [k for k in params if k not in declared]
                if unknown:
                    import logging
                    logging.warning(
                        "%s '%s' does not declare params %s — they may "
                        "be ignored. Declared: %s", registry_name,
                        cls.__name__, sorted(unknown), sorted(declared))
        if verbose:
            import logging
            logging.info("Building %s: %s with params %s",
                         registry_name, cls.__name__, params)
        return _CREATE_FNS[registry_name](cls, params, **kwargs)

    return build, register


def _is_module_flag(f) -> bool:
    # Avoid a circular import: ModuleFlag duck-typed by attribute.
    return getattr(f, "is_module_flag", False)
