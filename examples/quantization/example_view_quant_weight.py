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
"""Views the int8-quantized weights of a QAT checkpoint.

Parity: /root/reference/examples/quantization/example_view_quant_weight.py
— loads a ``--enable_quant``-trained model_dir, reconstructs the
quantization range of encoder layer 0's first FFN kernel from its
learned ``kernel_clip_max`` variable, and prints the integer weights a
deployment runtime would ship.

Usage:  python examples/quantization/example_view_quant_weight.py MODEL_DIR
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import neurst_tpu  # noqa: F401,E402
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.configurable import ModelConfigs


def main(model_dir):
    cfg = ModelConfigs.load(model_dir)
    assert cfg.get("enable_quant"), f"{model_dir} was not QAT-trained"
    bits = int((cfg.get("quant_params") or {}).get("quant_bits", 8))

    flat = ckpt_lib.restore_checkpoint_params(
        ckpt_lib.latest_checkpoint(model_dir))
    kernel_name = "encoder/layer_0/ffn/dense1/kernel"
    kernel = np.asarray(flat[kernel_name], np.float32)
    clip_max = max(float(flat[kernel_name + "_clip_max"]), 0.0)
    bits_tmp = float(2 ** (bits - 1))
    clip_min = -clip_max * bits_tmp / (bits_tmp - 1.0)

    # uniform quantization over [clip_min, clip_max] (the same grid
    # fake_quant_minmax trains against)
    scale = (clip_max - clip_min) / float(2 ** bits - 1)
    q = np.round((np.clip(kernel, clip_min, clip_max) - clip_min) / scale)
    q_int8 = (q + np.round(clip_min / scale)).astype(np.int8)

    print("The quantized weight of encoder layer0's first ffn")
    print(f"  clip range: [{clip_min:.6f}, {clip_max:.6f}], "
          f"scale={scale:.8f}, bits={bits}")
    print(q_int8)
    return q_int8


if __name__ == "__main__":
    main(sys.argv[1])
