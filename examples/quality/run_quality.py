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
"""Drives the committed quality recipes end-to-end on the current chip
and writes a trajectory artifact (QUALITY_r{N}.json entry).

Each recipe runs the UNMODIFIED CLI: train with the inline
seq-generation validator (keep-best + averaged checkpoints), then
decode dev with the final, best, and averaged-best checkpoints.  The
dev dataset, search method and metric are read from the recipe's own
``validator.params`` block — the post-training decodes use exactly
what the validator used.

Usage:
    python examples/quality/run_quality.py                  # full SUITE
    python examples/quality/run_quality.py <recipe_yml> [model_dir] [out_json]

Suite mode (no recipe argument) runs, deadline-gated
(NEURST_QUALITY_DEADLINE seconds, default 5400):
  1. mt_synth.yml       — 2-layer d=128 toy (recipe-surface sanity)
  2. mt_synth_base.yml  — transformer_base SCALE: bf16 params + f32
                          master, grad accumulation, 6+6 layers
  3. asr_synth.yml      — SPEECH: LogMelFbank, SpecAugment, 2-D
                          bucketing, conv front end, WER validator
                          (generates the tone corpus first if absent)
  4. mt_synth_qat.yml   — QAT: trains mt_synth under min/max QAT, then
                          serves the SAME model_dir fake-quant / int8
                          weight-only / int8-dynamic / int8-STATIC
                          (learned clips -> act scales) and records
                          each BLEU (VERDICT r4 #9)
and writes ONE combined artifact {"suite": {name: run_artifact}}.
"""

import json
import logging
import os
import re
import sys
import time

_START = time.time()
DEADLINE_S = float(os.environ.get("NEURST_QUALITY_DEADLINE", 5400))

SUITE = [
    ("mt_synth", "examples/quality/mt_synth.yml", 600),
    ("mt_synth_base", "examples/quality/mt_synth_base.yml", 1500),
    ("asr_synth", "examples/quality/asr_synth.yml", 1800),
    ("mt_synth_qat", "examples/quality/mt_synth_qat.yml", 700),
]


def _remaining():
    return DEADLINE_S - (time.time() - _START)


def _backend():
    import jax
    return f"{jax.default_backend()}:{jax.devices()[0].device_kind}"


def run_recipe(recipe, model_dir):
    """Trains + decodes one recipe; returns the trajectory artifact."""
    from neurst_tpu.utils.configurable import load_from_config_path
    recipe_cfg = load_from_config_path(recipe)  # comma-list ok
    vparams = (recipe_cfg.get("entry.params") or {}).get(
        "validator.params") or {}
    metric_cls = vparams.get("eval_metric.class") or "bleu"
    eval_ds_cls = vparams.get("eval_dataset.class")
    eval_ds_params = vparams.get("eval_dataset.params") or {}
    search_params = vparams.get("eval_search_method.params") or {}

    records = {"loss": [], "valid_metric": []}

    class Capture(logging.Handler):
        # trainer:   "step 50 | loss 3.4172 | ..."
        # validator: "validation @250: BLEU=85.2000 (best ...)"
        LOSS = re.compile(r"step (\d+) \| loss ([0-9.]+)")
        VALID = re.compile(r"validation @(\d+).*?" + re.escape(metric_cls)
                           + r"[^0-9-]*(-?[0-9.]+)", re.I)

        def emit(self, record):
            msg = record.getMessage()
            m = self.LOSS.search(msg)
            if m:
                records["loss"].append(
                    [int(m.group(1)), float(m.group(2))])
            m = self.VALID.search(msg)
            if m:
                records["valid_metric"].append(
                    [int(m.group(1)), float(m.group(2))])

    capture = Capture()
    root = logging.getLogger()
    prev_level = root.level
    # the trainer's "step N | loss X" lines are INFO: capture must see
    # them even when run_recipe is driven programmatically (not via
    # main(), which raises the root level itself)
    if root.level > logging.INFO or root.level == logging.NOTSET:
        root.setLevel(logging.INFO)
    root.addHandler(capture)

    from neurst_tpu.cli.run_exp import cli_main

    try:
        cli_main(["--entry", "train", "--config_paths", recipe,
                  "--model_dir", model_dir])

        def metric_of(md):
            # keep-best/avg subdirs hold checkpoints only; predict
            # rebuilds the task+model from model_configs.yml, so
            # mirror it in
            import shutil
            cfg = os.path.join(model_dir, "model_configs.yml")
            target = os.path.join(md, "model_configs.yml")
            if md != model_dir and os.path.exists(cfg) \
                    and not os.path.exists(target):
                shutil.copy(cfg, target)
            argv = ["--entry", "predict", "--model_dir", md,
                    "--metric", metric_cls]
            if eval_ds_cls:
                argv += ["--dataset.class", eval_ds_cls,
                         "--dataset.params", json.dumps(eval_ds_params)]
            if search_params:
                argv += ["--search_method.params",
                         json.dumps(search_params)]
            res = cli_main(argv)
            for k, v in res.items():
                if metric_cls.lower() in k.lower() \
                        and isinstance(v, (int, float)):
                    return float(v)
            return None

        def safe_metric(md):
            try:
                return metric_of(md) if os.path.isdir(md) else None
            except Exception as e:  # keep the artifact if one decode dies
                logging.exception("decode of %s failed: %s", md, e)
                return None

        final_m = safe_metric(model_dir)
        best_dir = os.path.join(model_dir, "best")
        avg_dir = os.path.join(model_dir, "best_avg")
        best_m = safe_metric(best_dir)
        avg_m = safe_metric(avg_dir)
    finally:
        root.removeHandler(capture)
        root.setLevel(prev_level)

    # the validator's own record is the authoritative trajectory
    metrics_path = os.path.join(best_dir, "metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            rec = json.load(f)
        records["valid_metric"] = sorted(
            [[int(k), float(v)] for k, v in rec.items()])

    losses = records["loss"]
    monotone = None
    if len(losses) >= 4:
        # quarter-averaged trajectory must be strictly decreasing
        q = max(1, len(losses) // 4)
        quarters = [sum(v for _, v in losses[i * q:(i + 1) * q]) / q
                    for i in range(4)]
        monotone = all(a > b for a, b in zip(quarters, quarters[1:]))
        records["loss_quarters"] = [round(x, 4) for x in quarters]

    return {
        "recipe": recipe,
        "metric": metric_cls,
        "backend": _backend(),
        "loss_trajectory": losses,
        "loss_quarters": records.get("loss_quarters"),
        "loss_monotone_by_quarter": monotone,
        f"valid_{metric_cls}_trajectory": records["valid_metric"],
        f"final_{metric_cls}": final_m,
        f"keep_best_{metric_cls}": best_m,
        f"avg_ckpt_{metric_cls}": avg_m,
    }


def run_qat_recipe(model_dir,
                   base_recipe="examples/quality/mt_synth.yml",
                   overlay="examples/quality/mt_synth_qat.yml",
                   dev_src="examples/quality/dev.src",
                   dev_trg="examples/quality/dev.trg"):
    """VERDICT r4 #9 — the QAT -> static-int8 path on a TRAINED model:
    trains mt_synth under min/max QAT (the reference's quantization
    recipe, /root/reference/examples/quantization/README.md), then
    decodes dev from the SAME model_dir four ways and records each
    BLEU: fake-quant (the reference's only serving mode), real int8
    weight-only, full int8 with dynamic per-token activation scales,
    and full int8 with STATIC scales where the learned QAT clips drive
    the FFN act_scales (quant_layers.int8ify_flat_params) and the rest
    self-calibrates.  Static-vs-dynamic BLEU must agree within 1 point
    on a converged model — that is the claim this entry checks."""
    from neurst_tpu.cli.run_exp import cli_main
    from neurst_tpu.layers.quantization.quant_layers import (
        _INT8_SERVING, global_init, set_int8_serving)

    base = run_recipe(f"{base_recipe},{overlay}", model_dir)
    base["recipe"] = overlay

    predict_argv = [
        "--entry", "predict", "--model_dir", model_dir,
        "--metric", "bleu",
        "--dataset.class", "parallel_text",
        "--dataset.params", json.dumps(
            {"src_file": dev_src, "trg_file": dev_trg}),
        "--search_method.params", json.dumps(
            {"beam_size": 4, "maximum_decode_length": 20})]

    qat_paths = []

    def bleu_of(extra):
        try:
            res = cli_main(predict_argv + extra)
            # the learned clips must actually have driven static scales
            # (read before set_int8_serving(False) clears the record)
            qat_paths.extend(sorted(
                _INT8_SERVING.get("qat_act_paths") or []))
            for k, v in res.items():
                if "bleu" in k.lower() and isinstance(v, (int, float)):
                    return float(v)
        except Exception as e:  # keep partial artifacts
            logging.exception("QAT int8 decode %s failed", extra)
            return f"error: {e!r}"
        finally:
            set_int8_serving(False)
            global_init(False)

    base["int8_weight_only_bleu"] = bleu_of(["--int8_serving"])
    base["int8_dynamic_bleu"] = bleu_of(
        ["--int8_serving", "--int8_activations"])
    del qat_paths[:]
    base["int8_static_bleu"] = bleu_of(
        ["--int8_serving", "--int8_activations",
         "--int8_static_activations"])
    base["qat_act_scale_paths"] = list(qat_paths)
    return base


def _ensure_speech_corpus(repo):
    speech_dir = os.path.join(repo, "examples/quality/speech")
    if os.path.exists(os.path.join(speech_dir, "train.tfrecords")):
        return
    logging.info("generating the synthetic tone ASR corpus ...")
    import subprocess
    subprocess.run(
        [sys.executable,
         os.path.join(repo, "examples/quality/gen_speech_corpus.py")],
        check=True, cwd=repo)


def run_suite(out_json):
    repo = os.getcwd()
    suite = {}
    for name, recipe, need_s in SUITE:
        if _remaining() < need_s:
            suite[name] = (f"skipped (deadline: {_remaining():.0f}s "
                           f"left, needs ~{need_s}s)")
            continue
        try:
            if name == "asr_synth":
                _ensure_speech_corpus(repo)
            t0 = time.time()
            if name == "mt_synth_qat":
                suite[name] = run_qat_recipe(f"/tmp/quality_{name}")
            else:
                suite[name] = run_recipe(recipe, f"/tmp/quality_{name}")
            suite[name]["wall_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001 — keep partial artifacts
            logging.exception("quality run %s failed", name)
            suite[name] = f"error: {e!r}"
    out = {"suite": suite, "backend": _backend()}
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (v if isinstance(v, str)
                          else {kk: v[kk] for kk in
                                ("recipe", f"final_{v['metric']}",
                                 f"keep_best_{v['metric']}",
                                 "loss_monotone_by_quarter", "wall_s")})
                      for k, v in suite.items()}))


def main():
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    os.chdir(repo)
    logging.getLogger().setLevel(logging.INFO)
    logging.getLogger().addHandler(logging.StreamHandler())

    if len(sys.argv) > 1:
        recipe = sys.argv[1]
        model_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/quality_run"
        out_json = sys.argv[3] if len(sys.argv) > 3 else "QUALITY.json"
        if recipe.endswith("mt_synth_qat.yml"):
            out = run_qat_recipe(model_dir)  # overlay needs its base
        else:
            out = run_recipe(recipe, model_dir)
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out)[:2000])
    else:
        run_suite(os.environ.get("NEURST_QUALITY_OUT", "QUALITY.json"))


if __name__ == "__main__":
    main()
