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
"""Drives a committed quality recipe end-to-end on the current chip
and writes a trajectory artifact (QUALITY_r{N}.json entry).

Runs the UNMODIFIED CLI with the given recipe yml: train with the
inline seq-generation validator (keep-best + averaged checkpoints),
then decode dev with the final, best, and averaged-best checkpoints.
The dev dataset, search method and metric are read from the recipe's
own ``validator.params`` block — the post-training decodes use exactly
what the validator used.

Usage:
    python examples/quality/run_quality.py [recipe_yml] [model_dir] [out_json]

Recipes: mt_synth.yml (2-layer toy), mt_synth_base.yml
(transformer_base-scale, bf16 + grad accum), asr_synth.yml (speech —
run gen_speech_corpus.py first).
"""

import json
import logging
import os
import re
import sys


def main():
    recipe = sys.argv[1] if len(sys.argv) > 1 \
        else "examples/quality/mt_synth.yml"
    model_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/quality_run"
    out_json = sys.argv[3] if len(sys.argv) > 3 else "QUALITY.json"
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    os.chdir(repo)

    import yaml
    with open(recipe) as f:
        recipe_cfg = yaml.safe_load(f)
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

    logging.getLogger().addHandler(Capture())

    logging.getLogger().setLevel(logging.INFO)
    logging.getLogger().addHandler(logging.StreamHandler())

    from neurst_tpu.cli.run_exp import cli_main

    cli_main(["--entry", "train", "--config_paths", recipe,
              "--model_dir", model_dir])

    def metric_of(md):
        # keep-best/avg subdirs hold checkpoints only; predict rebuilds
        # the task+model from model_configs.yml, so mirror it in
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
            argv += ["--search_method.params", json.dumps(search_params)]
        res = cli_main(argv)
        for k, v in res.items():
            if metric_cls.lower() in k.lower() \
                    and isinstance(v, (int, float)):
                return float(v)
        return None

    def safe_metric(md):
        try:
            return metric_of(md) if os.path.isdir(md) else None
        except Exception as e:  # keep the artifact even if one decode dies
            logging.exception("decode of %s failed: %s", md, e)
            return None

    final_m = safe_metric(model_dir)
    best_dir = os.path.join(model_dir, "best")
    avg_dir = os.path.join(model_dir, "best_avg")
    best_m = safe_metric(best_dir)
    avg_m = safe_metric(avg_dir)

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

    out = {
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
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out)[:2000])


def _backend():
    import jax
    return f"{jax.default_backend()}:{jax.devices()[0].device_kind}"


if __name__ == "__main__":
    main()
