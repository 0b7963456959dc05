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
"""Checkpoint inspection CLI (parity: neurst/cli/inspect_checkpoint.py)."""

import argparse

import numpy as np

from neurst_tpu.utils.checkpoints import restore_checkpoint_params


def main(argv=None):
    p = argparse.ArgumentParser(description="Inspect a checkpoint.")
    p.add_argument("checkpoint", help="Path to a .npz checkpoint or dir.")
    p.add_argument("--pattern", default=None,
                   help="Only show names matching this regex.")
    p.add_argument("--values", action="store_true",
                   help="Print tensor values (small tensors only).")
    args = p.parse_args(argv)

    flat = restore_checkpoint_params(args.checkpoint)
    import re
    pat = re.compile(args.pattern) if args.pattern else None
    total = 0
    for name in sorted(flat):
        if pat and not pat.search(name):
            continue
        arr = flat[name]
        total += arr.size
        line = f"{name}  shape={list(arr.shape)} dtype={arr.dtype} " \
               f"norm={float(np.linalg.norm(arr)):.4f}"
        print(line)
        if args.values and arr.size <= 32:
            print("   ", arr)
    print(f"Total parameters: {total} ({total / 1e6:.2f}M)")


if __name__ == "__main__":
    main()
