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
"""The main CLI: ``python -m neurst_tpu.cli.run_exp --entry train ...``

Parity: /root/reference/neurst/cli/run_exp.py — config precedence
CLI > config_paths YAML > hparams_set > saved model_configs.yml
(run_exp.py:53-76); hparams-set leftovers (optimizer/lr_schedule) nest
into entry.params; the dtype/distribution flags are accepted for recipe
compatibility (the mesh and bf16 policy replace them).
"""

import logging
import sys

from neurst_tpu.exps.base_experiment import build_exp
from neurst_tpu.data.datasets.dataset import build_dataset
from neurst_tpu.tasks.task import build_task
from neurst_tpu.utils import flags_core
from neurst_tpu.utils.configurable import (ModelConfigs, deep_merge_dict,
                                           flatten_string_list,
                                           load_from_config_path)
from neurst_tpu.utils.flags_core import Flag, ModuleFlag
from neurst_tpu.utils.hparams_sets import get_hyper_parameters

FLAG_LIST = [
    Flag("config_paths", dtype=Flag.TYPE.STRING, default=None, multiple=True,
         help="Path(s) to YAML/JSON configuration files."),
    Flag("hparams_set", dtype=Flag.TYPE.STRING, default=None,
         help="A set of predefined hyper-parameters (e.g. "
              "transformer_base, transformer_768_16e_3d)."),
    Flag("model_dir", dtype=Flag.TYPE.STRING, default=None,
         help="The path for saving/loading checkpoints."),
    Flag("distribution_strategy", dtype=Flag.TYPE.STRING, default=None,
         help="Kept for recipe compatibility (mesh-based parallelism "
              "is always on)."),
    Flag("dtype", dtype=Flag.TYPE.STRING, default=None,
         help="The computation dtype (bfloat16/float32)."),
    Flag("enable_check_numerics", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Enable jax_debug_nans for NaN checking."),
    Flag("enable_xla", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Kept for recipe compatibility (everything is XLA)."),
    Flag("enable_quant", dtype=Flag.TYPE.BOOLEAN, default=False,
         help="Whether to enable quantization-aware training."),
    Flag("quant_params", dtype=Flag.TYPE.STRING, default=None,
         help="A dict of parameters for quantization."),
    Flag("int8_serving", dtype=Flag.TYPE.BOOLEAN, default=False,
         help="Serve with int8-stored dense kernels (weight-only "
              "absmax-per-channel quantization applied to the f32 "
              "checkpoint at restore; inference entries only)."),
    Flag("int8_activations", dtype=Flag.TYPE.BOOLEAN, default=False,
         help="With --int8_serving: also quantize dense-layer "
              "activations dynamically (per-token absmax) and run "
              "full int8 x int8 matmuls — the MXU's double-rate int8 "
              "path."),
    Flag("int8_static_activations", dtype=Flag.TYPE.BOOLEAN, default=False,
         help="With --int8_activations: replace the per-token absmax "
              "reduction with static per-tensor activation scales, "
              "calibrated at predict startup by teacher-forcing the "
              "model's own first-pass hypotheses (PTQ calibration)."),
    Flag("int8_calibration_batches", dtype=Flag.TYPE.INTEGER, default=4,
         help="Number of leading batches used to calibrate the static "
              "int8 activation scales."),
    Flag("include", dtype=Flag.TYPE.STRING, default=None, multiple=True,
         help="Python files/modules with custom @register components to "
              "import before building."),
    Flag("seed", dtype=Flag.TYPE.INTEGER, default=0,
         help="The global random seed."),
    Flag("distributed_init", dtype=Flag.TYPE.BOOLEAN, default=None,
         help="Call jax.distributed.initialize() for multi-host meshes "
              "(cluster from --worker_hosts/--task_index or the "
              "WORKER_HOSTS/TASK_ID env vars; bare auto-discovery "
              "otherwise)."),
    Flag("compilation_cache_dir", dtype=Flag.TYPE.STRING, default=None,
         help="Persistent XLA compilation cache directory: bucketed "
              "batching compiles one executable per input shape, and "
              "the cache carries them across runs/restarts (TPU "
              "compiles are tens of seconds each)."),
    Flag("worker_hosts", dtype=Flag.TYPE.STRING, default=None,
         help="Comma-separated worker addresses; the first is the "
              "coordinator (parity: reference distribution_utils "
              "WORKER_HOSTS)."),
    Flag("task_index", dtype=Flag.TYPE.INTEGER, default=None,
         help="This process's index into worker_hosts (parity: "
              "TASK_ID)."),
    ModuleFlag("entry", "entry", help="The program entry."),
    ModuleFlag("task", "task", help="The binding task."),
    ModuleFlag("model", "model", help="The model."),
    ModuleFlag("dataset", "dataset", help="The dataset."),
]


def _load_includes(paths):
    """Imports user plug-in files so their @register calls run
    (parity: flags_core.py:207-247 --include)."""
    import importlib.util
    import os
    for path in flatten_string_list(paths):
        if os.path.exists(path):
            spec = importlib.util.spec_from_file_location(
                "neurst_tpu_userdef_" + os.path.basename(path).split(".")[0],
                path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            logging.info("Imported plug-in file %s", path)
        else:
            __import__(path)
            logging.info("Imported plug-in module %s", path)


def _format_hparams(predefined: dict) -> dict:
    """hparams-set dict -> top-level config (model.* kept, the rest
    nested into entry.params)."""
    out = {}
    predefined = dict(predefined or {})
    for key in ("model.class", "model", "model.params"):
        if key in predefined:
            out[key] = predefined.pop(key)
    if predefined:
        out["entry.params"] = predefined
    return out


def parse_and_merge(argv):
    """Resolves the full configuration from argv."""
    argv_dict, _ = flags_core.get_argv_dict(argv)
    _load_includes(argv_dict.get("include"))
    cfg_files = load_from_config_path(
        flatten_string_list(argv_dict.get("config_paths")))
    model_dir = argv_dict.get("model_dir") or cfg_files.get("model_dir")
    hparams_name = argv_dict.get("hparams_set") \
        or cfg_files.get("hparams_set")
    hparams = _format_hparams(get_hyper_parameters(hparams_name))

    base = {}
    model_dirs = flatten_string_list(model_dir)
    if model_dirs and ModelConfigs.exists(model_dirs[0]):
        base = ModelConfigs.load(model_dirs[0])
    merged = deep_merge_dict(deep_merge_dict(base, hparams), cfg_files)
    # entries also read their flags from the top level (reference
    # recipes mix both styles): seed entry.params with the top-level
    # config so the recursive default-filling never overrides user
    # values set there
    top_level = {k: v for k, v in merged.items()
                 if k not in ("entry", "entry.class", "entry.params")}
    merged["entry.params"] = deep_merge_dict(
        top_level, merged.get("entry.params") or {}, local_overwrite=False)
    args = flags_core.parse_flags(FLAG_LIST, argv, existing=merged)
    return args


def run_experiment(args):
    if args.get("distributed_init"):
        # one call replaces all five reference DP backends' cluster
        # bootstrap (SURVEY.md §2.7): cluster spec from flags or the
        # reference's WORKER_HOSTS/TASK_ID env vars, then the same
        # Mesh code spans all hosts.
        from neurst_tpu.parallel.cluster import distributed_initialize
        distributed_initialize(args.get("worker_hosts"),
                               args.get("task_index"))
    if args.get("enable_check_numerics"):
        import jax
        jax.config.update("jax_debug_nans", True)
    if args.get("compilation_cache_dir"):
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          args["compilation_cache_dir"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # quantization config must be global before any module is built
    # (parity: reference run_exp.py:87-90 QuantLayer.global_init)
    from neurst_tpu.layers.quantization.quant_layers import global_init
    qp = args.get("quant_params")
    if isinstance(qp, str):
        import yaml as _yaml
        qp = _yaml.safe_load(qp)
    global_init(bool(args.get("enable_quant")), **(qp or {}))
    if args.get("int8_serving"):
        # int8 weight-only serving: must flip the dense factory before
        # the model is built; the f32 checkpoint is quantized at
        # restore (SequenceGenerator.restore_params)
        from neurst_tpu.exps.trainer import Trainer as _Trainer
        from neurst_tpu.layers.quantization.quant_layers import (
            quant_enabled, set_int8_serving)
        from neurst_tpu.utils.registry import get_registered_class
        _entry = get_registered_class(args.get("entry.class"), "entry")
        if isinstance(_entry, type) and issubclass(_entry, _Trainer):
            raise ValueError("--int8_serving is inference-only")
        qat_bits = 8
        if quant_enabled():
            # QAT checkpoint: serve real int8 instead of fake-quant —
            # the learned *_clip_max vars drive the int8 ranges at
            # restore (on the grid the checkpoint trained with);
            # activation fake-quant is dropped (weight-only)
            from neurst_tpu.layers.quantization.quant_layers import \
                get_global_config
            qat_bits = int(get_global_config().get("quant_bits") or 8)
            logging.info("int8_serving of a QAT checkpoint: learned "
                         "clip ranges drive the int8 scales "
                         "(quant_bits=%d); activation fake-quant is "
                         "dropped", qat_bits)
            global_init(False)
        set_int8_serving(True, qat_bits=qat_bits,
                         activations=bool(args.get("int8_activations")),
                         static_activation_scales=bool(
                             args.get("int8_static_activations")))
    task = build_task(args)
    custom_dataset = build_dataset(args) if args.get("dataset.class") \
        else None
    model = None
    if args.get("model.class"):
        model_params = dict(args.get("model.params") or {})
        if args.get("dtype"):
            # explicit top-level dtype (CLI or config) wins over the
            # model flag's default
            model_params["dtype"] = args["dtype"]
        from neurst_tpu.exps.trainer import Trainer
        from neurst_tpu.utils.registry import get_registered_class
        entry_cls = get_registered_class(args.get("entry.class"), "entry")
        is_train = isinstance(entry_cls, type) \
            and issubclass(entry_cls, Trainer)
        if not is_train:
            # pipeline parallelism is a training-step layout; decode/
            # eval/export rebuild the sequential model and the restore
            # bridge reshapes pipeline-trained checkpoints
            from neurst_tpu.utils.configurable import \
                strip_training_only_model_flags
            model_params = strip_training_only_model_flags(model_params)
        model = task.build_model({"model.class": args["model.class"],
                                  "model.params": model_params})
    entry_args = deep_merge_dict(dict(args), args.get("entry.params") or {})
    entry = build_exp({"entry.class": args.get("entry.class"),
                       "entry.params": entry_args},
                      task=task, model=model,
                      custom_dataset=custom_dataset,
                      model_dir=args.get("model_dir"))
    return entry.run()


def cli_main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s")
    if argv is None:
        argv = sys.argv[1:]
    args = parse_and_merge(argv)
    if not args.get("entry.class"):
        raise ValueError("--entry must be specified "
                         "(train/eval/predict/validation/...).")
    flags_core.verbose_flags(args)
    return run_experiment(args)


if __name__ == "__main__":
    cli_main()
