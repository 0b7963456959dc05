"""SimulEval v1 protocol compatibility: our wait-k agent evaluated by
an (emulated) external SimulEval server over the real REST wire
protocol (parity: /root/reference/neurst/cli/simuleval_cli.py:35-40 —
the reference forks simuleval's client/server loop; here the client is
reimplemented in neurst_tpu/utils/simuleval_agents/online_client.py).
"""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

jax = pytest.importorskip("jax")

DEFAULT_EOS = "</s>"


class MockSimulEvalServer:
    """Speaks the SimulEval v1 REST surface: GET /, GET /src,
    PUT /hypo, GET /result."""

    def __init__(self, sources):
        self.sources = [s.split() for s in sources]
        self.read_ptr = [0] * len(sources)
        self.hypos = [[] for _ in sources]
        self.log = []  # (action, instance_id) in arrival order
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, obj):
                body = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query))
                if parsed.path in ("", "/"):
                    self._json({"num_sentences": len(outer.sources)})
                elif parsed.path == "/src":
                    i = int(q["instance_id"])
                    outer.log.append(("read", i))
                    ptr = outer.read_ptr[i]
                    if ptr >= len(outer.sources[i]):
                        seg = DEFAULT_EOS
                    else:
                        seg = outer.sources[i][ptr]
                        outer.read_ptr[i] += 1
                    self._json({"instance_id": i, "segment_id": ptr,
                                "segment": seg})
                elif parsed.path == "/result":
                    self._json({"BLEU": 0.0, "AL": 1.5,
                                "instances": len(outer.sources)})
                else:
                    self.send_error(404)

            def do_PUT(self):
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query))
                if parsed.path == "/hypo":
                    i = int(q["instance_id"])
                    n = int(self.headers.get("Content-Length", 0))
                    unit = self.rfile.read(n).decode("utf-8")
                    outer.log.append(("write", i))
                    outer.hypos[i].append(unit)
                    self._json({})
                else:
                    self.send_error(404)

        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *a):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_waitk_agent_against_simuleval_server():
    import os

    from neurst_tpu.cli.simuleval_cli import run_online
    from neurst_tpu.models.model import build_model
    from neurst_tpu.models.transformer import Transformer
    from neurst_tpu.tasks.task import build_task
    from neurst_tpu.utils.simuleval_agents.simul_trans_text_agent import \
        SimulTransTextAgent

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    task = build_task({
        "task.class": "waitk_translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {
                "vocab_path": "tests/examples/vocab.txt"},
            "wait_k": 2,
        }})
    cfg = dict(Transformer.build_model_args_by_name(
        "transformer_toy")["model.params"])
    cfg.update({"dtype": "float32", "wait_k": 2,
                "encoder.attention_monotonic": True})
    model = build_model(
        {"model.class": "waitk_transformer", "model.params": cfg},
        src_meta=task.src_pipeline.meta, trg_meta=task.trg_pipeline.meta)
    params = model.init_params(jax.random.PRNGKey(0))
    agent = SimulTransTextAgent(model, params, k=2, max_decode_len=6)

    sources = ["tok1 tok2 tok3 tok4", "tok5 tok6 tok7"]
    with MockSimulEvalServer(sources) as server:
        scores = run_online(agent, task, "127.0.0.1", server.port)

    assert scores["instances"] == 2
    for i, hyp in enumerate(server.hypos):
        # every instance terminated with the protocol EOS
        assert hyp[-1] == DEFAULT_EOS, (i, hyp)
        # emitted units are real vocabulary tokens
        for unit in hyp[:-1]:
            assert unit.startswith("tok"), unit

    # wait-k schedule on the wire: for each instance the first write
    # comes only after k=2 source reads (the k+1-th read may arrive
    # before the first write, never a write before 2 reads)
    for i in range(len(sources)):
        events = [a for a, j in server.log if j == i]
        first_write = events.index("write")
        assert events[:first_write].count("read") >= 2, events
        # and reads continue after writing begins (true streaming,
        # not read-all-then-write) for the longer first source
    events0 = [a for a, j in server.log if j == 0]
    assert "read" in events0[events0.index("write"):], events0


def test_online_merges_subwords_and_feeds_source_eos(tmp_path):
    """Protocol-level regression for two round-2 review findings: the
    client must (a) merge BPE continuation units into full words before
    PUT /hypo, and (b) feed the source-final eos to the agent when the
    server's segments run out."""
    import os

    from neurst_tpu.cli.simuleval_cli import run_online
    from neurst_tpu.tasks.task import build_task

    vocab = tmp_path / "v.txt"
    vocab.write_text("he@@\nllo\nworld\nsrc1\nsrc2\n")
    task = build_task({
        "task.class": "waitk_translation",
        "task.params": {
            "src_data_pipeline.class": "TextDataPipeline",
            "src_data_pipeline.params": {"vocab_path": str(vocab)},
            "trg_data_pipeline.class": "TextDataPipeline",
            "trg_data_pipeline.params": {"vocab_path": str(vocab),
                                         "subtokenizer": "bpe"},
            "wait_k": 1}})
    pipe = task.trg_pipeline
    ids = {t: pipe.vocab.map_token_to_id(t)
           for t in ("he@@", "llo", "world")}
    src_eos = task.src_pipeline.meta["eos_id"]

    class FakeAgent:
        def __init__(self):
            self.read_ids = []

        def translate_stream(self, read_fn, eos_id, bos_id=None,
                             on_write=None):
            while True:
                seg = read_fn()
                if seg is None:
                    break
                self.read_ids.extend(seg)
            for t in ("he@@", "llo", "world"):
                on_write(ids[t])
            return [ids[t] for t in ("he@@", "llo", "world")], [1, 1, 1]

    agent = FakeAgent()
    with MockSimulEvalServer(["src1 src2"]) as server:
        run_online(agent, task, "127.0.0.1", server.port)

    # (b) the stream ended with the source-final eos token
    assert agent.read_ids[-1] == src_eos
    # (a) 'he@@' buffered and merged with 'llo' into one unit 'hello'
    assert server.hypos[0] == ["hello", "world", DEFAULT_EOS]
