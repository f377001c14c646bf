"""OpenAI-compatible HTTP backend against a local mock server (reference
contract: src/dbt_osmosis/core/llm.py:186-260 env config, :341-676
prompt/response shapes). Hermetic — no network beyond 127.0.0.1."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from dbt_osmosis_spark.llm import (
    HeuristicBackend,
    LLMResponseError,
    OpenAICompatBackend,
    backend_from_env,
    default_backend,
    generate_model_spec_json,
    strip_json_fences,
    with_retries,
)


class _MockOpenAI(BaseHTTPRequestHandler):
    """Scriptable chat-completions endpoint: responses queue on the server
    object; each POST pops one. An int means 'reply with that HTTP error'."""

    def do_POST(self):  # noqa: N802 - http.server contract
        n = int(self.headers["Content-Length"])
        self.server.requests.append(json.loads(self.rfile.read(n)))
        script = self.server.responses.pop(0) if self.server.responses else "ok"
        if isinstance(script, int):
            self.send_response(script)
            self.end_headers()
            return
        body = json.dumps(
            {"choices": [{"message": {"role": "assistant", "content": script}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def mock_server():
    srv = HTTPServer(("127.0.0.1", 0), _MockOpenAI)
    srv.requests, srv.responses = [], []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _backend(srv) -> OpenAICompatBackend:
    return OpenAICompatBackend(
        base_url=f"http://127.0.0.1:{srv.server_address[1]}/v1",
        api_key="test-key",
        model="test-model",
    )


def test_chat_sends_openai_wire_shape(mock_server):
    mock_server.responses = ["the description"]
    b = _backend(mock_server)
    out = b.chat([{"role": "user", "content": "describe col"}])
    assert out == "the description"
    req = mock_server.requests[0]
    assert req["model"] == "test-model"
    assert req["messages"][0]["content"] == "describe col"


def test_chat_malformed_payload_raises(mock_server):
    # 200 with empty content → LLMResponseError (not a silent empty doc)
    mock_server.responses = [None]
    with pytest.raises(LLMResponseError):
        _backend(mock_server).chat([{"role": "user", "content": "x"}])


def test_retry_on_server_error_then_success(mock_server):
    mock_server.responses = [500, 500, "recovered"]
    b = _backend(mock_server)
    out = with_retries(
        lambda: b.chat([{"role": "user", "content": "x"}]), sleep=lambda _s: None
    )
    assert out == "recovered"
    assert len(mock_server.requests) == 3


def test_generate_model_spec_real_backend(mock_server):
    spec = {
        "description": "orders per customer",
        "columns": [{"name": "customer_id", "description": "the customer"}],
    }
    # fence-wrapped on purpose: providers do this despite instructions
    mock_server.responses = ["```json\n" + json.dumps(spec) + "\n```"]
    out = generate_model_spec_json(
        "select customer_id from orders", backend=_backend(mock_server)
    )
    assert out == spec
    # bulk = ONE request documents the whole model
    assert len(mock_server.requests) == 1
    assert "JSON" in mock_server.requests[0]["messages"][0]["content"]


def test_generate_model_spec_retries_non_json(mock_server):
    mock_server.responses = ["sorry, here you go:", json.dumps({"description": "d", "columns": []})]
    out = generate_model_spec_json("select 1 as a from t", backend=_backend(mock_server))
    assert out["description"] == "d"
    assert len(mock_server.requests) == 2


def test_generate_model_spec_heuristic_backend():
    out = generate_model_spec_json(
        "select o_orderkey as order_id, o_total as total_amount from orders",
        backend=HeuristicBackend(),
    )
    names = {c["name"] for c in out["columns"]}
    assert names == {"order_id", "total_amount"}
    assert all(c["description"] for c in out["columns"])


def test_backend_from_env(monkeypatch, mock_server):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert backend_from_env() is None
    assert isinstance(default_backend(), HeuristicBackend)
    monkeypatch.setenv("OPENAI_API_KEY", "k")
    monkeypatch.setenv("OPENAI_BASE_URL", f"http://127.0.0.1:{mock_server.server_address[1]}/v1")
    monkeypatch.setenv("OPENAI_MODEL", "m1")
    b = backend_from_env()
    assert isinstance(b, OpenAICompatBackend)
    assert b.model == "m1"
    mock_server.responses = ["env-driven"]
    assert b.complete("hello") == "env-driven"


def test_strip_json_fences_variants():
    assert strip_json_fences('{"a": 1}') == '{"a": 1}'
    assert strip_json_fences('```json\n{"a": 1}\n```') == '{"a": 1}'
    assert strip_json_fences('```\n{"a": 1}\n```') == '{"a": 1}'
