"""Browser workbench (SURVEY M35 — the reference's Streamlit app shell).

The reference ships a Streamlit app (reference: src/dbt_osmosis/workbench/
app.py:423-489) around the compile-on-edit / preview / profile loop.
Streamlit is a third-party UI framework; the loop itself is already a
server-side operator here (`SqlSession.workbench`, serving.py). This
module completes the user-facing shell with zero dependencies: a stdlib
`http.server` that serves a single-page editor UI and a JSON API.

Endpoints:
  GET  /              -> the single-page workbench (editor, panes)
  POST /api/workbench -> {"sql": ..., "preview": N} -> compile+lint+
                         preview+profile JSON (SqlSession.workbench)
  GET  /api/schema    -> db -> table -> [columns] map (sidebar tree)

Hardening (ADVICE r4):
  - every value the page renders (cells, column names, lint messages,
    schema names) is inserted via DOM ``textContent`` — never string-built
    ``innerHTML`` — so HTML/JS living in table data cannot execute in the
    workbench page (stored XSS);
  - the server validates the ``Host`` header against the bound address on
    every request (DNS-rebinding defence) and requires a per-process
    ``X-Workbench-Token`` — embedded in the served page, unknown to other
    origins — on ``/api/*`` POSTs (CSRF defence).

Scale note: same bound as the wire servers — preview is a pushed-down
LIMIT (CollectLimit), so each editor save against a 100 TB table costs
one bounded scan.
"""

from __future__ import annotations

import json
import secrets
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from dbt_osmosis_spark.project import Manifest
from dbt_osmosis_spark.serving import SqlSession

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>dbt-osmosis-spark workbench</title>
<style>
  body { font-family: ui-monospace, monospace; margin: 0; display: flex; height: 100vh; }
  #side { width: 220px; overflow: auto; border-right: 1px solid #ccc; padding: 8px; font-size: 12px; }
  #main { flex: 1; display: flex; flex-direction: column; padding: 8px; overflow: auto; }
  textarea { width: 100%; height: 180px; font: inherit; }
  pre { background: #f6f6f6; padding: 8px; overflow: auto; }
  table { border-collapse: collapse; font-size: 12px; }
  td, th { border: 1px solid #ddd; padding: 2px 6px; }
  .lint { color: #a40; }
  h4 { margin: 10px 0 4px; }
</style></head>
<body>
<div id="side"><h4>schema</h4><div id="tree">loading…</div></div>
<div id="main">
  <textarea id="sql">select 1 as one</textarea>
  <div><button onclick="run()">Run (compile + preview + profile)</button></div>
  <h4>compiled</h4><pre id="compiled"></pre>
  <h4>lint</h4><div id="lint"></div>
  <h4>preview</h4><div id="preview"></div>
  <h4>profile</h4><div id="profile"></div>
</div>
<script>
const TOKEN = "__WORKBENCH_TOKEN__";
// All server-derived strings go through el()/textContent — never string-built
// innerHTML — so HTML living in table data renders inert (stored-XSS defence).
function el(tag, text, cls) {
  const e = document.createElement(tag);
  if (text !== undefined && text !== null) e.textContent = text;
  if (cls) e.className = cls;
  return e;
}
function table(headers, rows) {
  const t = el('table');
  const hr = el('tr');
  headers.forEach(h => hr.appendChild(el('th', h)));
  t.appendChild(hr);
  rows.forEach(r => {
    const tr = el('tr');
    r.forEach(v => tr.appendChild(el('td', v === null ? 'NULL' : String(v))));
    t.appendChild(tr);
  });
  return t;
}
function replace(id, ...nodes) {
  const e = document.getElementById(id);
  e.replaceChildren(...nodes);
}
async function run() {
  const sql = document.getElementById('sql').value;
  const r = await fetch('/api/workbench', {method: 'POST',
    headers: {'Content-Type': 'application/json', 'X-Workbench-Token': TOKEN},
    body: JSON.stringify({sql: sql, preview: 200})});
  const d = await r.json();
  if (d.error) { replace('compiled', el('span', 'ERROR: ' + d.error)); return; }
  document.getElementById('compiled').textContent = d.compiled_sql;
  replace('lint', ...(d.lint.length
    ? d.lint.map(f => el('div', 'L' + f.line + ' [' + f.rule + '] ' + f.message, 'lint'))
    : [el('i', 'clean')]));
  replace('preview', table(d.columns, d.rows), el('span', ' (' + d.rowcount + ' rows)'));
  replace('profile', table(['column', 'nulls', 'distinct', 'min', 'max'],
    Object.entries(d.profile).map(([c, p]) => [c, p.nulls, p.distinct, p.min, p.max])));
}
fetch('/api/schema').then(r => r.json()).then(d => {
  const nodes = [];
  Object.entries(d.schema).forEach(([db, tables]) => {
    nodes.push(el('b', db));
    Object.entries(tables).forEach(([t, cols]) => {
      const tdiv = el('div', '\\u00a0' + t);
      const cdiv = el('div');
      cdiv.style.color = '#888';
      cols.forEach(c => { cdiv.appendChild(el('div', '\\u00a0\\u00a0' + c)); });
      tdiv.appendChild(cdiv);
      nodes.push(tdiv);
    });
  });
  replace('tree', ...nodes);
});
</script>
</body></html>
"""


def serve_workbench(
    spark: SparkSession,
    manifest: Manifest,
    host: str = "127.0.0.1",
    port: int = 0,
    max_rows: int = 1000,
):
    """Start the workbench HTTP server; returns it (caller drives
    serve_forever; .server_address exposes the bound port, .workbench_token
    the per-process CSRF token)."""
    # one shared session: workbench is stateless per request, and comment
    # intercepts should mutate the shared manifest like the wire servers
    session = SqlSession(spark=spark, manifest=manifest)
    lock = threading.Lock()  # Spark driver calls serialized per process
    token = secrets.token_hex(16)
    page = _PAGE.replace("__WORKBENCH_TOKEN__", token).encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj, code: int = 200) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _host_ok(self) -> bool:
            # DNS-rebinding defence: a rebound hostname resolves here but
            # carries the attacker's Host header; only the bound address
            # (or localhost aliases of it) may address this server. The
            # check applies to LOOPBACK binds — that is the rebinding
            # threat model; an explicit non-local bind (0.0.0.0, LAN IP)
            # is reachable under names the server can't enumerate, and
            # the API token still gates every mutating request there.
            if host not in {"127.0.0.1", "localhost", "::1"}:
                return True
            raw = self.headers.get("Host") or ""
            bound_port = str(self.server.server_address[1])
            if raw.startswith("["):
                # bracketed IPv6 literal: the colons inside the brackets are
                # part of the address — strip an optional :port only after
                # the closing bracket (a bare "[::1]" must parse as host
                # "[::1]", not host "[:" / port "1]").
                end = raw.find("]")
                if end < 0:
                    return False
                name, tail = raw[: end + 1], raw[end + 1 :]
                if tail and (not tail.startswith(":") or tail[1:] != bound_port):
                    return False
            else:
                got = raw.rsplit(":", 1)
                if len(got) == 2 and got[1] != bound_port:
                    return False
                name = got[0]
            return name in {host, "localhost", "127.0.0.1", "[::1]"}

        def do_GET(self):
            if not self._host_ok():
                self._send_json({"error": "forbidden: bad Host header"}, 403)
            elif self.path == "/" or self.path == "/index.html":
                self._send(200, page, "text/html; charset=utf-8")
            elif self.path == "/api/schema":
                with lock:
                    try:
                        self._send_json({"schema": session.schema_map()})
                    except Exception as exc:  # noqa: BLE001 - http boundary
                        self._send_json({"error": str(exc)}, 500)
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if not self._host_ok():
                self._send_json({"error": "forbidden: bad Host header"}, 403)
                return
            if self.path != "/api/workbench":
                self._send(404, b"not found", "text/plain")
                return
            if self.headers.get("X-Workbench-Token") != token:
                # CSRF defence: the token lives only in the served page, so
                # a cross-origin form/fetch cannot present it.
                self._send_json({"error": "forbidden: missing or bad token"}, 403)
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                preview = max(1, min(int(req.get("preview", 200)), max_rows))
                with lock:
                    out = session.workbench(req["sql"], preview)
                self._send_json(out)
            except Exception as exc:  # noqa: BLE001 - http boundary
                self._send_json({"error": f"{type(exc).__name__}: {exc}"}, 200)

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.workbench_token = token
    return srv
