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
"""Registry introspection CLI (parity: neurst/cli/view_registry.py).

Usage:
    python -m neurst_tpu.cli.view_registry            # list registries
    python -m neurst_tpu.cli.view_registry model      # list models
    python -m neurst_tpu.cli.view_registry model transformer   # flags
"""

import sys

import neurst_tpu  # noqa: F401  (registers everything)
from neurst_tpu.utils.registry import (REGISTRIES, get_registered_class,
                                       registry_names)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("Available registries:")
        for name in registry_names():
            print(f"  {name}  ({len(set(REGISTRIES[name].values()))} classes)")
        return
    registry_name = argv[0]
    if registry_name in ("hparams_set", "hparams_sets"):
        from neurst_tpu.utils.hparams_sets import (_HPARAMS_SETS,
                                                   get_hyper_parameters)
        if len(argv) > 1:
            import yaml
            print(yaml.dump(get_hyper_parameters(argv[1])))
            return
        print("Registered hparams sets (parametric names like "
              "transformer_<d>_<e>e_<d>d resolve dynamically):")
        for name in sorted(_HPARAMS_SETS):
            print(f"  {name}")
        return
    if registry_name not in REGISTRIES:
        print(f"Unknown registry '{registry_name}'. "
              f"Available: {registry_names()}")
        sys.exit(1)
    if len(argv) == 1:
        classes = {}
        for alias, cls in REGISTRIES[registry_name].items():
            classes.setdefault(cls, []).append(alias)
        print(f"Registered '{registry_name}' classes:")
        for cls, aliases in classes.items():
            print(f"  {cls.__name__}: aliases={sorted(aliases)}")
        return
    cls = get_registered_class(argv[1], registry_name)
    if cls is None:
        print(f"'{argv[1]}' is not registered in '{registry_name}'")
        sys.exit(1)
    print(f"{cls.__name__} ({cls.__module__})")
    doc = (cls.__doc__ or "").strip()
    if doc:
        print(doc.split("\n")[0])
    if hasattr(cls, "class_or_method_args"):
        print("Flags:")
        for f in cls.class_or_method_args():
            if getattr(f, "is_module_flag", False):
                print(f"  --{f.name} (module: {f.module_name}, "
                      f"default={f.default})")
            else:
                print(f"  --{f.name} ({f.dtype}, default={f.default})"
                      f" : {f.help}")


if __name__ == "__main__":
    main()
