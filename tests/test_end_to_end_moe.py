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
"""End-to-end MoE recipe: train a Switch-FFN transformer through the
CLI on the committed miniature corpus, then beam-decode it — the
examples/moe recipe surface (router/expert vars in the checkpoint,
config persisted through model_configs.yml) the way
test_end_to_end_cli.py drives the dense MT recipe."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_moe_train_and_predict(tmp_path):
    from neurst_tpu.cli.run_exp import cli_main
    model_dir = str(tmp_path / "model")
    os.chdir(REPO)
    cli_main(["--entry", "train",
              "--config_paths", "tests/examples/example_train_moe.yml",
              "--model_dir", model_dir])
    ckpt = os.path.join(model_dir, "ckpt-60.npz")
    assert os.path.exists(ckpt)

    # the checkpoint holds per-layer router + stacked expert weights
    flat = dict(np.load(ckpt))
    router = [k for k in flat if "router" in k]
    experts = [k for k in flat if "expert" in k]
    assert router, f"no router vars in checkpoint: {sorted(flat)[:20]}"
    assert experts
    # expert kernels carry the leading [E] axis
    assert any(v.shape[0] == 4 for k, v in flat.items() if k in experts)

    # MoE flags round-trip through model_configs.yml into predict
    with open(os.path.join(model_dir, "model_configs.yml")) as f:
        cfg_text = f.read()
    assert "moe_num_experts: 4" in cfg_text

    result = cli_main(
        ["--config_paths", "tests/examples/example_predict_seq2seq.yml",
         "--model_dir", model_dir,
         "--output_file", str(tmp_path / "hypo.txt")])
    assert len(result["hypotheses"]) == 24
    assert "BLEU" in result
