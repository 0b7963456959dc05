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
"""Download and assemble the WMT14 En->De corpus.

Parity: /root/reference/examples/translation/download_wmt14en2de.py —
same corpora (news-commentary v12, commoncrawl, europarl v7), same dev
(newstest2013) / test (newstest2014 from SGM) assembly, same output
file names, optional T2T wordpiece vocabulary via --learn_wordpiece.
TF-free.
"""

import argparse
import logging
import os
import re
import tarfile

_TRAIN = [
    {"URL": "http://data.statmt.org/wmt17/translation-task/"
            "training-parallel-nc-v12.tgz",
     "TAR": "training-parallel-nc-v12.tgz",
     "SRC": "training/news-commentary-v12.de-en.en",
     "TRG": "training/news-commentary-v12.de-en.de"},
    {"URL": "http://www.statmt.org/wmt13/"
            "training-parallel-commoncrawl.tgz",
     "TAR": "training-parallel-commoncrawl.tgz",
     "SRC": "commoncrawl.de-en.en",
     "TRG": "commoncrawl.de-en.de"},
    {"URL": "http://www.statmt.org/wmt13/"
            "training-parallel-europarl-v7.tgz",
     "TAR": "training-parallel-europarl-v7.tgz",
     "SRC": "training/europarl-v7.de-en.en",
     "TRG": "training/europarl-v7.de-en.de"},
]
_DEV = {"URL": "http://data.statmt.org/wmt17/translation-task/dev.tgz",
        "TAR": "dev.tgz",
        "SRC": "dev/newstest2013.en", "TRG": "dev/newstest2013.de"}
_TEST = {"URL": "http://statmt.org/wmt14/test-full.tgz",
         "TAR": "test-full.tgz",
         "SRC": "test-full/newstest2014-deen-src.en.sgm",
         "TRG": "test-full/newstest2014-deen-ref.de.sgm"}

_SEG = re.compile(r'<seg id="[0-9]*">')


def _unwrap_sgm(text: str) -> str:
    return _SEG.sub("", text.replace("</seg>", ""))


def _fetch(resource, output_dir, download):
    src = os.path.join(output_dir, resource["SRC"])
    trg = os.path.join(output_dir, resource["TRG"])
    if os.path.exists(src) and os.path.exists(trg):
        return src, trg
    tar_path = os.path.join(output_dir, resource["TAR"])
    if not os.path.exists(tar_path):
        download(resource["URL"], tar_path)
    with tarfile.open(tar_path, "r:*") as tar:
        for info in tar:
            if info.name.endswith(resource["SRC"]) \
                    or info.name.endswith(resource["TRG"]):
                tar.extract(info, output_dir)
    return src, trg


def download_to(output_dir):
    from neurst_tpu.utils.misc import download_with_tqdm as download
    srcs, trgs = [], []
    for res in _TRAIN:
        s, t = _fetch(res, output_dir, download)
        srcs.append(s)
        trgs.append(t)
    with open(os.path.join(output_dir, "train.en.txt"), "w",
              encoding="utf-8") as fw_s, \
            open(os.path.join(output_dir, "train.de.txt"), "w",
                 encoding="utf-8") as fw_t:
        for s_path, t_path in zip(srcs, trgs):
            with open(s_path, encoding="utf-8") as fs, \
                    open(t_path, encoding="utf-8") as ft:
                for s, t in zip(fs, ft):
                    fw_s.write(" ".join(s.strip().split()) + "\n")
                    fw_t.write(" ".join(t.strip().split()) + "\n")

    dev_s, dev_t = _fetch(_DEV, output_dir, download)
    for in_path, out_name in ((dev_s, "newstest2013.en.txt"),
                              (dev_t, "newstest2013.de.txt")):
        with open(in_path, encoding="utf-8") as f, \
                open(os.path.join(output_dir, out_name), "w",
                     encoding="utf-8") as fw:
            for line in f:
                fw.write(line.strip() + "\n")

    test_s, test_t = _fetch(_TEST, output_dir, download)
    with open(test_s, encoding="utf-8") as fs, \
            open(test_t, encoding="utf-8") as ft, \
            open(os.path.join(output_dir, "newstest2014.en.txt"), "w",
                 encoding="utf-8") as fw_s, \
            open(os.path.join(output_dir, "newstest2014.de.txt"), "w",
                 encoding="utf-8") as fw_t:
        for s, t in zip(fs, ft):
            if s.startswith("<seg id"):
                fw_s.write(_unwrap_sgm(s.strip()) + "\n")
                fw_t.write(_unwrap_sgm(t.strip()) + "\n")
    return srcs, trgs


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", "-o", type=str, required=True)
    parser.add_argument("--learn_wordpiece", action="store_true",
                        default=False)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    srcs, trgs = download_to(args.output_dir)
    if args.learn_wordpiece:
        from neurst_tpu.data.text.subtokenizer import Subtokenizer

        def corpus():
            for path in srcs + trgs:
                with open(path, encoding="utf-8") as f:
                    yield from f

        logging.info("Learning wordpiece vocab on %s", srcs + trgs)
        sub = Subtokenizer.build_from_corpus(
            corpus(), target_vocab_size=32768)
        sub.save_vocab(os.path.join(args.output_dir, "vocab"))


if __name__ == "__main__":
    main()
