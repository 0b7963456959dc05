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
"""Offline checkpoint averaging (parity: neurst/cli/avg_checkpoint.py)."""

import argparse
import logging
import os

from neurst_tpu.utils.checkpoints import (average_checkpoints,
                                          latest_checkpoint,
                                          list_checkpoints, save_checkpoint,
                                          unflatten_params)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Average checkpoints.")
    p.add_argument("--checkpoint_paths", nargs="+", default=None,
                   help="Explicit .npz checkpoint paths to average.")
    p.add_argument("--model_dir", default=None,
                   help="Average the latest N checkpoints in this dir.")
    p.add_argument("--last_n", type=int, default=5,
                   help="How many latest checkpoints to average.")
    p.add_argument("--output_dir", required=True,
                   help="Where to write the averaged checkpoint.")
    args = p.parse_args(argv)

    paths = args.checkpoint_paths
    if not paths:
        if not args.model_dir:
            raise ValueError("Provide --checkpoint_paths or --model_dir")
        steps = list_checkpoints(args.model_dir)[-args.last_n:]
        paths = [os.path.join(args.model_dir, f"ckpt-{s}.npz")
                 for s in steps]
    logging.info("Averaging %d checkpoints: %s", len(paths), paths)
    avg = average_checkpoints(paths)
    step = max(int(os.path.basename(p).split("-")[1].split(".")[0])
               for p in paths)
    save_checkpoint(args.output_dir, step, unflatten_params(avg),
                    max_to_keep=None)
    # copy model_configs.yml so the averaged dir is self-contained
    if args.model_dir:
        src_cfg = os.path.join(args.model_dir, "model_configs.yml")
        if os.path.exists(src_cfg):
            import shutil
            shutil.copy(src_cfg,
                        os.path.join(args.output_dir, "model_configs.yml"))
    logging.info("Averaged checkpoint written to %s", args.output_dir)


if __name__ == "__main__":
    main()
