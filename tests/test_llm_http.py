"""Live-transport contract for HTTPLLMClient against an in-process
localhost HTTP stub (zero external network): request JSON shape + bearer
auth (mirroring the reference's call, 01_extract_features.R:40-53),
retry-on-500 with backoff, exhausted-retry failure, and the
bounded-concurrency guarantee of complete_batch."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ml_training_data_pipeline_spark.functions.llm import HTTPLLMClient


class _Stub:
    """Configurable completion endpoint: records every request, can fail
    the first N with HTTP 500, and tracks the max number of requests
    in flight at once."""

    def __init__(self, fail_first: int = 0, delay_s: float = 0.0):
        self.fail_first = fail_first
        self.delay_s = delay_s
        self.requests: list[dict] = []
        self.headers: list[dict] = []
        self._lock = threading.Lock()
        self._in_flight = 0
        self.max_in_flight = 0
        self.n_seen = 0

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — http.server contract
                with stub._lock:
                    stub.n_seen += 1
                    seq = stub.n_seen
                    stub._in_flight += 1
                    stub.max_in_flight = max(stub.max_in_flight, stub._in_flight)
                try:
                    body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
                    with stub._lock:
                        stub.requests.append(body)
                        stub.headers.append(dict(self.headers))
                    if stub.delay_s:
                        time.sleep(stub.delay_s)
                    if seq <= stub.fail_first:
                        self.send_response(500)
                        self.end_headers()
                        return
                    payload = json.dumps(
                        {"choices": [{"text": f"  echo:{body['prompt']}  "}]}
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                finally:
                    with stub._lock:
                        stub._in_flight -= 1

            def log_message(self, *a):  # silence per-request stderr lines
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self.server.server_address[1]}/v1/completions"
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture
def stub_factory():
    stubs: list[_Stub] = []

    def make(**kw) -> _Stub:
        s = _Stub(**kw)
        stubs.append(s)
        return s

    yield make
    for s in stubs:
        s.close()


def test_request_shape_and_auth(stub_factory):
    stub = stub_factory()
    client = HTTPLLMClient(stub.endpoint, api_key="sk-test", model="test-model", max_tokens=150)
    out = client.complete("hello world")
    assert out == "echo:hello world"  # .strip() applied to the raw text
    body = stub.requests[0]
    assert body == {"model": "test-model", "prompt": "hello world", "max_tokens": 150}
    headers = {k.lower(): v for k, v in stub.headers[0].items()}
    assert headers["authorization"] == "Bearer sk-test"
    assert headers["content-type"] == "application/json"


def test_retry_on_500_with_backoff(stub_factory):
    stub = stub_factory(fail_first=2)
    client = HTTPLLMClient(stub.endpoint, api_key="k", retries=3, backoff_base=0.01)
    t0 = time.time()
    assert client.complete("p") == "echo:p"
    assert stub.n_seen == 3
    # two backoff sleeps: 0.01 + 0.02
    assert time.time() - t0 >= 0.03


def test_exhausted_retries_raise(stub_factory):
    stub = stub_factory(fail_first=100)
    client = HTTPLLMClient(stub.endpoint, api_key="k", retries=2, backoff_base=0.01)
    with pytest.raises(RuntimeError, match="failed after 2 retries"):
        client.complete("p")
    assert stub.n_seen == 2


def test_batch_concurrency_is_bounded(stub_factory):
    # delay_s=0.25: the lower-bound assertion (overlap actually happens)
    # is timing-sensitive — at 0.05s a fully loaded host can schedule the
    # pool's threads serially and max_in_flight stays 1 (observed once
    # under a concurrent full-suite run). A 0.25s hold per request makes
    # serial scheduling of 4 ready threads across 20 requests implausible
    # even under load, without materially slowing the test (~1.3s).
    stub = stub_factory(delay_s=0.25)
    client = HTTPLLMClient(stub.endpoint, api_key="k", max_concurrency=4)
    prompts = [f"p{i}" for i in range(20)]
    out = client.complete_batch(prompts)
    assert out == [f"echo:p{i}" for i in range(20)]
    assert stub.n_seen == 20
    assert 1 < stub.max_in_flight <= 4, stub.max_in_flight
