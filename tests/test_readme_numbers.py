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
"""Perf-claim hygiene: every throughput/MFU/RTF number in README.md
must equal a driver-captured value from some BENCH_r*.json (rounded the
way the README quotes it).  Builder-side mid-round measurements belong
in CHANGELOG.md, which must carry the provenance disclaimer instead.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_values():
    """Flat list of (key, value) from every BENCH_r*.json, recursing
    into the nested extra dicts."""
    out = []

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}", v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}[{i}]", v)
        elif isinstance(node, (int, float)):
            out.append((prefix, float(node)))

    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        walk(os.path.basename(path), data.get("parsed", data))
    return out


def _readme():
    with open(os.path.join(REPO, "README.md")) as f:
        return f.read()


def _assert_backed(claims, values, match):
    missing = [c for c in claims if not any(match(c, v) for _, v in values)]
    assert not missing, (
        f"README perf claims with no matching BENCH_r*.json value: "
        f"{missing} — quote only driver-captured numbers")


def test_readme_mfu_claims_match_bench():
    values = [(k, v) for k, v in _bench_values() if "mfu" in k.lower()]
    claims = [float(m) for m in re.findall(
        r"MFU (\d\.\d+)", _readme(), re.I)]
    assert claims, "README should state the headline MFU"
    _assert_backed(claims, values,
                   lambda c, v: abs(round(v, 3) - c) < 5e-4)


def test_readme_tokens_per_sec_claims_match_bench():
    values = [(k, v) for k, v in _bench_values()
              if "tokens_per_sec" in k or "tok_s" in k]
    # quoted as "176k target-tokens/s" / "183k tok/s" — match on the
    # rounded-to-k value
    claims = [float(m) for m in re.findall(
        r"(\d+)k (?:target-)?tok(?:ens)?/s", _readme())]
    assert claims, "README should state the headline tokens/s"
    _assert_backed(claims, values,
                   lambda c, v: round(v / 1000) == c)


def test_readme_utt_per_sec_claims_match_bench():
    values = [(k, v) for k, v in _bench_values()
              if "utt" in k.lower() or k.endswith(".value")]
    claims = [float(m) for m in re.findall(
        r"(\d+(?:\.\d+)?) utterances/s", _readme())]
    assert claims, "README should state the headline utt/s"
    _assert_backed(claims, values,
                   lambda c, v: abs(round(v) - c) < 1.0)


def test_readme_rtf_claims_match_bench():
    values = [(k, v) for k, v in _bench_values() if "rtf" in k.lower()]
    claims = [float(m) for m in re.findall(
        r"RTF (\d(?:\.\d+)?e-\d+)", _readme())]
    _assert_backed(claims, values,
                   lambda c, v: abs(v - c) < 0.051 * max(c, 1e-9))


def test_readme_ms_claims_match_bench():
    """Millisecond A/B claims (e.g. 'flash 36.9 vs dense 41.0 ms')."""
    values = [(k, v) for k, v in _bench_values()
              if k.endswith("_ms") or "_ms." in k]
    claims = [float(m) for m in re.findall(
        r"(\d+(?:\.\d+)?) ms", _readme())]
    _assert_backed(claims, values,
                   lambda c, v: abs(v - c) < 0.05 + 1e-9)


def _newest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert paths, "no BENCH_r*.json committed"
    with open(paths[-1]) as f:
        data = json.load(f)
    return data.get("parsed", data)


def test_readme_headline_decode_is_fresh():
    """The hole round 4 fell through: the README quoted round 3's
    714 utt/s while the NEWEST bench said 551 (a 23% regression), and
    the match-against-any-historical-file tests stayed green.  The
    headline decode claim must now track the newest driver-captured
    value within the stated ±5% tunnel variance plus margin (10%)."""
    newest = _newest_bench()
    value = newest.get("value")
    if not isinstance(value, (int, float)):
        return  # bench errored (e.g. tunnel down) — nothing to compare
    readme = _readme()
    claims = [float(m) for m in re.findall(
        r"(\d+(?:\.\d+)?) utterances/s", readme)]
    assert claims, "README should state the headline utt/s"
    headline = claims[0]
    fresh = abs(headline - value) / max(value, 1e-9) <= 0.10
    # a disagreement is allowed ONLY when the README explicitly quotes
    # the newest number (i.e. acknowledges and accounts for it) — the
    # round-4 failure mode was quoting an older round's number while
    # staying silent about the newest one
    acknowledged = str(int(round(value))) in readme
    assert fresh or acknowledged, (
        f"README headline decode claim {headline} utt/s is stale: the "
        f"newest bench measured {value} utt/s (>10% apart) and the "
        "README never mentions that value.  Update README.md — and if "
        "this is a regression, account for it.")


def test_readme_headline_mfu_is_fresh():
    newest = _newest_bench()
    mfu = (newest.get("extra") or {}).get("mfu")
    if not isinstance(mfu, (int, float)):
        return
    claims = [float(m) for m in re.findall(r"MFU (\d\.\d+)", _readme())]
    assert claims, "README should state the headline MFU"
    headline = max(claims)
    assert abs(headline - mfu) / max(mfu, 1e-9) <= 0.10, (
        f"README headline MFU claim {headline} is stale vs the newest "
        f"bench's {mfu} (>10% apart)")


def test_changelog_carries_provenance_disclaimer():
    with open(os.path.join(REPO, "CHANGELOG.md")) as f:
        text = f.read()
    head = text[:600]
    assert "BENCH_r*.json" in head and "numbers" in head.lower(), (
        "CHANGELOG.md must state near the top that its perf numbers "
        "are builder-side mid-round measurements and the "
        "driver-captured values live in BENCH_r*.json")
