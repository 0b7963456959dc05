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
"""SimulEval v1.0 REST client (no dependency on the simuleval package).

The reference evaluates simultaneous agents through SimulEval's
client/server loop (/root/reference/neurst/cli/simuleval_cli.py:35-40,
simuleval.online.start_client).  This speaks the same wire protocol so
our wait-k agent can be scored by an unmodified SimulEval server:

  GET  /                          -> corpus info {"num_sentences": N}
  GET  /src?instance_id=i         -> {"instance_id", "segment_id",
                                      "segment"} (one source unit;
                                      "</s>" when exhausted)
  PUT  /hypo?instance_id=i        -> body: the predicted unit ("</s>"
                                      terminates the instance)
  GET  /result                    -> evaluation scores JSON

Uses stdlib urllib only, so the client works in hermetic environments.
"""

import json
import urllib.parse
import urllib.request
from typing import Optional

__all__ = ["SimulEvalClient", "DEFAULT_EOS", "READ_ACTION", "WRITE_ACTION"]

DEFAULT_EOS = "</s>"
READ_ACTION = "read"
WRITE_ACTION = "write"


class SimulEvalClient(object):

    def __init__(self, hostname: str = "localhost", port: int = 12321,
                 timeout: float = 60.0):
        self._base = f"http://{hostname}:{port}"
        self._timeout = timeout

    def _get(self, path: str, params: Optional[dict] = None):
        url = self._base + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        with urllib.request.urlopen(url, timeout=self._timeout) as r:
            body = r.read().decode("utf-8")
        return json.loads(body) if body else {}

    def corpus_info(self) -> dict:
        return self._get("")

    def get_source(self, instance_id: int,
                   extra_params: Optional[dict] = None) -> dict:
        params = {"instance_id": instance_id}
        if extra_params:
            params.update(extra_params)
        return self._get("/src", params)

    def send_hypo(self, instance_id: int, hypo: str) -> None:
        url = (f"{self._base}/hypo?"
               + urllib.parse.urlencode({"instance_id": instance_id}))
        req = urllib.request.Request(
            url, data=hypo.encode("utf-8"), method="PUT")
        with urllib.request.urlopen(req, timeout=self._timeout):
            pass

    def get_scores(self) -> dict:
        return self._get("/result")
