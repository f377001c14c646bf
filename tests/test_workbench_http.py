"""M35 browser workbench: the http.server shell over SqlSession.workbench —
page serve, schema API, workbench round-trip, error path."""

from __future__ import annotations

import json
import threading
import urllib.request


def _get(url: str) -> tuple[int, bytes]:
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read()


def _post_json(url: str, payload: dict, token: str | None = None, host: str | None = None) -> dict:
    headers = {"Content-Type": "application/json"}
    if token:
        headers["X-Workbench-Token"] = token
    if host:
        headers["Host"] = host
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers=headers,
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_workbench_http_roundtrip(spark):
    from dbt_osmosis_spark.project import Manifest, ModelNode
    from dbt_osmosis_spark.workbench_http import serve_workbench

    m = Manifest()
    m.models["wb_model"] = ModelNode(
        name="wb_model", raw_sql="select 1 as one", path="wb.sql"
    )
    spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, tag string"
    ).createOrReplaceTempView("wb_http_demo")

    srv = serve_workbench(spark, m)
    port = srv.server_address[1]
    token = srv.workbench_token
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        # the single-page UI
        status, body = _get(base + "/")
        assert status == 200
        assert b"workbench" in body and b"/api/workbench" in body
        assert token.encode() in body  # page embeds the per-process CSRF token
        # stored-XSS defence: the page never string-builds HTML from data —
        # all server-derived values land via textContent / createElement
        assert b"textContent" in body and b".innerHTML" not in body

        # schema sidebar API
        status, body = _get(base + "/api/schema")
        schema = json.loads(body)["schema"]
        tables = schema.get("default", schema.get("", {}))
        assert "wb_http_demo" in tables
        assert tables["wb_http_demo"] == ["id", "tag"]

        # the compile+lint+preview+profile round-trip
        d = _post_json(
            base + "/api/workbench",
            {"sql": "SELECT id, tag from wb_http_demo where id > 0", "preview": 10},
            token=token,
        )
        assert "SELECT" in d["compiled_sql"]
        assert d["columns"] == ["id", "tag"] and d["rowcount"] == 2
        assert any(f["rule"] == "keyword-case" for f in d["lint"])
        assert d["profile"]["tag"]["nulls"] == 1

        # jinja compiles through the manifest
        d = _post_json(
            base + "/api/workbench",
            {"sql": "select one from {{ ref('wb_model') }}"},
            token=token,
        )
        assert "wb_model" in d.get("compiled_sql", "") or "error" in d

        # error path returns a structured error, not a 500 crash
        d = _post_json(base + "/api/workbench", {"sql": "select broken from"}, token=token)
        assert "error" in d

        # CSRF defence: no token (or a wrong one) -> 403, nothing executes
        for bad in (None, "deadbeef"):
            try:
                _post_json(base + "/api/workbench", {"sql": "select 1"}, token=bad)
                raise AssertionError("expected 403 without the page token")
            except urllib.error.HTTPError as e:
                assert e.code == 403

        # DNS-rebinding defence: a foreign Host header is refused even
        # with the token
        try:
            _post_json(base + "/api/workbench", {"sql": "select 1"},
                       token=token, host="evil.example:80")
            raise AssertionError("expected 403 for foreign Host")
        except urllib.error.HTTPError as e:
            assert e.code == 403

        # bracketed IPv6 loopback Host headers are allowed — with the
        # bound port, or bare (ADVICE r5: '[::1]' must not parse as
        # host '[:' + port '1]')
        port = srv.server_address[1]
        for ok_host in (f"[::1]:{port}", "[::1]"):
            d = _post_json(base + "/api/workbench", {"sql": "select 1 as one"},
                           token=token, host=ok_host)
            assert "error" not in d, (ok_host, d)
        # wrong port / unclosed bracket still refused
        for bad_host in ("[::1]:9", "[::1"):
            try:
                _post_json(base + "/api/workbench", {"sql": "select 1"},
                           token=token, host=bad_host)
                raise AssertionError(f"expected 403 for Host {bad_host!r}")
            except urllib.error.HTTPError as e:
                assert e.code == 403

        # 404 for unknown path
        try:
            _get(base + "/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
