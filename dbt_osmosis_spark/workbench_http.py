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

Scale note: same bound as the wire servers — preview is a pushed-down
LIMIT (CollectLimit), so each editor save against a 100 TB table costs
one bounded scan.
"""

from __future__ import annotations

import json
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
async function run() {
  const sql = document.getElementById('sql').value;
  const r = await fetch('/api/workbench', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({sql: sql, preview: 200})});
  const d = await r.json();
  if (d.error) { document.getElementById('compiled').textContent = 'ERROR: ' + d.error; return; }
  document.getElementById('compiled').textContent = d.compiled_sql;
  document.getElementById('lint').innerHTML = d.lint.length
    ? d.lint.map(f => `<div class="lint">L${f.line} [${f.rule}] ${f.message}</div>`).join('')
    : '<i>clean</i>';
  const head = '<tr>' + d.columns.map(c => `<th>${c}</th>`).join('') + '</tr>';
  const rows = d.rows.map(r => '<tr>' + r.map(v => `<td>${v === null ? 'NULL' : v}</td>`).join('') + '</tr>').join('');
  document.getElementById('preview').innerHTML = `<table>${head}${rows}</table> (${d.rowcount} rows)`;
  const prof = Object.entries(d.profile).map(([c, p]) =>
    `<tr><td>${c}</td><td>${p.nulls}</td><td>${p.distinct}</td><td>${p.min}</td><td>${p.max}</td></tr>`).join('');
  document.getElementById('profile').innerHTML =
    `<table><tr><th>column</th><th>nulls</th><th>distinct</th><th>min</th><th>max</th></tr>${prof}</table>`;
}
fetch('/api/schema').then(r => r.json()).then(d => {
  document.getElementById('tree').innerHTML = Object.entries(d.schema).map(([db, tables]) =>
    `<b>${db}</b>` + Object.entries(tables).map(([t, cols]) =>
      `<div>&nbsp;${t}<div style="color:#888">${cols.map(c => '&nbsp;&nbsp;' + c).join('<br>')}</div></div>`).join('')
  ).join('');
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
    serve_forever; .server_address exposes the bound port)."""
    # one shared session: workbench is stateless per request, and comment
    # intercepts should mutate the shared manifest like the wire servers
    session = SqlSession(spark=spark, manifest=manifest)
    lock = threading.Lock()  # Spark driver calls serialized per process

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

        def do_GET(self):
            if self.path == "/" or self.path == "/index.html":
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            elif self.path == "/api/schema":
                with lock:
                    try:
                        self._send_json({"schema": session.schema_map()})
                    except Exception as exc:  # noqa: BLE001 - http boundary
                        self._send_json({"error": str(exc)}, 500)
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/api/workbench":
                self._send(404, b"not found", "text/plain")
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

    return ThreadingHTTPServer((host, port), Handler)
