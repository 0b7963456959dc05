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
"""Drives the committed quality recipe end-to-end on the current chip
and writes a trajectory artifact (QUALITY_r{N}.json).

Runs the UNMODIFIED CLI with examples/quality/mt_synth.yml: train with
the inline seq-generation validator (keep-best + averaged checkpoints),
then decode dev with the final, best, and averaged-best checkpoints.

Usage: python examples/quality/run_quality.py <model_dir> <out_json>
"""

import json
import logging
import os
import re
import sys


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quality_run"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "QUALITY.json"
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    os.chdir(repo)

    records = {"loss": [], "valid_bleu": []}

    class Capture(logging.Handler):
        # trainer:   "step 50 | loss 3.4172 | ..."
        # validator: "validation @250: BLEU=85.2000 (best ...)"
        LOSS = re.compile(r"step (\d+) \| loss ([0-9.]+)")
        BLEU = re.compile(r"validation @(\d+).*?bleu[^0-9]*([0-9.]+)", re.I)

        def emit(self, record):
            msg = record.getMessage()
            m = self.LOSS.search(msg)
            if m:
                records["loss"].append(
                    [int(m.group(1)), float(m.group(2))])
            m = self.BLEU.search(msg)
            if m:
                records["valid_bleu"].append(
                    [int(m.group(1)), float(m.group(2))])

    logging.getLogger().addHandler(Capture())

    logging.getLogger().setLevel(logging.INFO)
    logging.getLogger().addHandler(logging.StreamHandler())

    from neurst_tpu.cli.run_exp import cli_main

    cli_main(["--entry", "train",
              "--config_paths", "examples/quality/mt_synth.yml",
              "--model_dir", model_dir])

    def bleu_of(md):
        # keep-best/avg subdirs hold checkpoints only; predict rebuilds
        # the task+model from model_configs.yml, so mirror it in
        import shutil
        cfg = os.path.join(model_dir, "model_configs.yml")
        target = os.path.join(md, "model_configs.yml")
        if md != model_dir and os.path.exists(cfg) \
                and not os.path.exists(target):
            shutil.copy(cfg, target)
        res = cli_main(
            ["--entry", "predict", "--model_dir", md,
             "--dataset.class", "parallel_text",
             "--dataset.params",
             "{src_file: examples/quality/dev.src, "
             "trg_file: examples/quality/dev.trg}",
             "--search_method.params",
             "{beam_size: 4, maximum_decode_length: 20}",
             "--metric", "bleu"])
        for k, v in res.items():
            if "bleu" in k.lower() and isinstance(v, (int, float)):
                return float(v)
        return None

    def safe_bleu(md):
        try:
            return bleu_of(md) if os.path.isdir(md) else None
        except Exception as e:  # keep the artifact even if one decode dies
            logging.exception("decode of %s failed: %s", md, e)
            return None

    final_bleu = safe_bleu(model_dir)
    best_dir = os.path.join(model_dir, "best")
    avg_dir = os.path.join(model_dir, "best_avg")
    best_bleu = safe_bleu(best_dir)
    avg_bleu = safe_bleu(avg_dir)

    # the validator's own record is the authoritative BLEU trajectory
    import json as _json
    metrics_path = os.path.join(best_dir, "metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            rec = _json.load(f)
        records["valid_bleu"] = sorted(
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
        "recipe": "examples/quality/mt_synth.yml",
        "corpus": "examples/quality (synthetic reversal, BLEU ceiling 100)",
        "backend": _backend(),
        "loss_trajectory": losses,
        "loss_quarters": records.get("loss_quarters"),
        "loss_monotone_by_quarter": monotone,
        "valid_bleu_trajectory": records["valid_bleu"],
        "final_bleu": final_bleu,
        "keep_best_bleu": best_bleu,
        "avg_ckpt_bleu": avg_bleu,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out)[:2000])


def _backend():
    import jax
    return f"{jax.default_backend()}:{jax.devices()[0].device_kind}"


if __name__ == "__main__":
    main()
