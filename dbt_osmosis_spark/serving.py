"""SQL serving session: info-schema emulation + DDL-comment intercept
(SURVEY M34, S19, S20).

The reference runs a MySQL-wire proxy whose sessions (a) regex-intercept
`ALTER TABLE ... COMMENT` statements into in-memory manifest description
updates and (b) serve an information_schema synthesized from the manifest
(reference: src/dbt_osmosis/sql/proxy.py:37-171). Spark fills the wire-
protocol role natively (Spark Connect / Thrift server); what we port is the
session layer those servers would mount: compile-jinja → intercept-DDL →
execute, plus information_schema DataFrames built from spark.catalog so
metadata is queryable *as tables* (joinable, filterable — S19).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dbt_osmosis_spark.compile import JinjaCompiler, has_jinja
from dbt_osmosis_spark.project import Manifest

# ALTER TABLE <tbl> ALTER|MODIFY [COLUMN] <col> COMMENT '<text>'
_COLUMN_COMMENT_RE = re.compile(
    r"alter\s+table\s+`?(?P<table>\w+)`?\s+(?:alter|modify)\s+(?:column\s+)?"
    r"`?(?P<column>\w+)`?\s+comment\s+'(?P<comment>[^']*)'",
    re.IGNORECASE,
)
# COMMENT ON TABLE <tbl> IS '<text>'
_TABLE_COMMENT_RE = re.compile(
    r"comment\s+on\s+table\s+`?(?P<table>\w+)`?\s+is\s+'(?P<comment>[^']*)'",
    re.IGNORECASE,
)


@dataclass
class CommentUpdate:
    table: str
    column: str | None
    comment: str


def intercept_ddl_comment(sql: str) -> CommentUpdate | None:
    """Middleware: recognize comment DDL that should mutate the manifest
    instead of reaching the engine (reference: proxy.py:37-43, :72-110)."""
    m = _COLUMN_COMMENT_RE.search(sql)
    if m:
        return CommentUpdate(m.group("table"), m.group("column"), m.group("comment"))
    m = _TABLE_COMMENT_RE.search(sql)
    if m:
        return CommentUpdate(m.group("table"), None, m.group("comment"))
    return None


def information_schema_tables(spark: SparkSession) -> DataFrame:
    """`information_schema.tables` as a DataFrame from spark.catalog."""
    rows = [
        (t.catalog or "spark_catalog", t.namespace[0] if t.namespace else "default",
         t.name, "TEMPORARY" if t.isTemporary else "TABLE")
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(
        rows, "table_catalog string, table_schema string, table_name string, table_type string"
    )


def information_schema_columns(spark: SparkSession) -> DataFrame:
    """`information_schema.columns` equivalent: one sweep over listTables,
    schema per table from the catalog (no data scan)."""
    rows = []
    for t in spark.catalog.listTables():
        for i, f in enumerate(spark.table(t.name).schema.fields, start=1):
            rows.append(
                (t.name, f.name, i, f.dataType.simpleString(),
                 "YES" if f.nullable else "NO")
            )
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, ordinal_position int, "
        "data_type string, is_nullable string",
    )


@dataclass
class SqlSession:
    """One serving session: what a Spark-Connect-mounted handler runs per
    query (reference session lifecycle: proxy.py:60-127)."""

    spark: SparkSession
    manifest: Manifest
    comments: dict[tuple[str, str | None], str] = field(default_factory=dict)

    def query(self, sql: str) -> DataFrame | None:
        """Compile jinja if present, intercept comment DDL (returns None —
        metadata mutation only), else execute on Spark."""
        update = intercept_ddl_comment(sql)
        if update is not None:
            self.comments[(update.table, update.column)] = update.comment
            if update.column is None and update.table in self.manifest.models:
                self.manifest.models[update.table].description = update.comment
            return None
        if has_jinja(sql):
            sql = JinjaCompiler(self.manifest).compile(sql).compiled_sql
        return self.spark.sql(sql)

    def workbench(self, sql: str, preview_rows: int = 200) -> dict:
        """One compile-on-edit round-trip (SURVEY M35 — the reference's
        interactive workbench loop, src/dbt_osmosis/workbench/app.py:423-489,
        without the UI framework): compile the Jinja-SQL, lint it, execute a
        bounded preview, and profile the preview columns. Stateless per
        call — every editor keystroke-save is one request.

        Scale note: the preview is `LIMIT preview_rows` pushed into the plan
        (CollectLimit — no full scan barrier), and the profile runs over the
        already-collected preview rows driver-side, so a workbench session
        against a 100 TB table costs one bounded scan per edit."""
        from dbt_osmosis_spark.lint import lint_sql

        compiled = (
            JinjaCompiler(self.manifest).compile(sql).compiled_sql
            if has_jinja(sql)
            else sql
        )
        out: dict = {"compiled_sql": compiled}
        out["lint"] = [
            {"rule": f.rule, "line": f.line, "message": f.message}
            for f in lint_sql(compiled)
        ]
        df = self.spark.sql(compiled)
        rows = df.limit(preview_rows).collect()
        out["columns"] = list(df.columns)
        out["rows"] = [[_json_cell(v) for v in r] for r in rows]
        out["rowcount"] = len(rows)
        # per-column preview profile (the workbench's profile pane):
        # null/distinct counts and min/max over the collected sample
        profile = {}
        for i, col in enumerate(df.columns):
            vals = [r[i] for r in rows]
            non_null = [v for v in vals if v is not None]
            orderable = [v for v in non_null if not isinstance(v, (list, dict, set, bytes))]
            try:
                lo = _json_cell(min(orderable)) if orderable else None
                hi = _json_cell(max(orderable)) if orderable else None
            except TypeError:
                lo = hi = None
            profile[col] = {
                "nulls": len(vals) - len(non_null),
                "distinct": len({repr(v) for v in non_null}),
                "min": lo,
                "max": hi,
            }
        out["profile"] = profile
        return out

    def schema_map(self) -> dict[str, dict[str, list[str]]]:
        """db → table → [columns] map, the shape the proxy serves over the
        wire (reference: proxy.py:129-141)."""
        out: dict[str, dict[str, list[str]]] = {}
        for t in self.spark.catalog.listTables():
            db = t.namespace[0] if t.namespace else "default"
            out.setdefault(db, {})[t.name] = [
                f.name for f in self.spark.table(t.name).schema.fields
            ]
        return out


# ---- wire server loop (M34) ------------------------------------------------
# The reference mounts its session on a MySQL-wire proxy (a third-party
# protocol library; reference: src/dbt_osmosis/sql/proxy.py:174-179). The
# Spark-first equivalents for real deployments are Spark Connect / the
# Thrift JDBC server; for the reference's lightweight-proxy use case we
# ship a self-contained newline-delimited-JSON TCP loop over the same
# SqlSession: one request per line {"sql": "..."}, one response per line
# {"columns": [...], "rows": [[...]]} | {"ok": true} (intercepted DDL) |
# {"error": "..."}. Threaded accept loop; each connection gets its own
# session view over the shared manifest (comment intercepts are shared,
# like the reference's project-level mutations).

def serve_wire(
    spark: SparkSession,
    manifest: Manifest,
    host: str = "127.0.0.1",
    port: int = 0,
    max_rows: int = 1000,
):
    """Start the wire server; returns the server object (serve_forever on
    the caller's schedule; .server_address exposes the bound port)."""
    import json
    import socketserver

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            # per-connection session over the SHARED manifest: comment DDL
            # mutates the manifest (visible to every session, like the
            # reference's project-level mutations) while session-local
            # state stays isolated per client
            session = SqlSession(spark=spark, manifest=manifest)
            for raw in self.rfile:
                line = raw.decode().strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                    if req.get("op") == "schema":
                        resp = {"schema": session.schema_map()}
                    elif req.get("op") == "workbench":
                        # client-supplied preview size is clamped to the
                        # server's cap: the workbench path must not become a
                        # driver-OOM bypass of the plain-query max_rows limit
                        raw_preview = req.get("preview")
                        preview = 200 if raw_preview is None else int(raw_preview)
                        resp = session.workbench(req["sql"], max(1, min(preview, max_rows)))
                    else:
                        df = session.query(req["sql"])
                        if df is None:
                            resp = {"ok": True}
                        else:
                            rows = df.limit(max_rows).collect()
                            resp = {
                                "columns": list(df.columns),
                                "rows": [[_json_cell(v) for v in r] for r in rows],
                                "rowcount": len(rows),
                            }
                except Exception as exc:  # noqa: BLE001 - wire boundary
                    resp = {"error": f"{type(exc).__name__}: {exc}"}
                self.wfile.write((json.dumps(resp) + "\n").encode())
                self.wfile.flush()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    return Server((host, port), Handler)


def _json_cell(v):
    """JSON-safe cell encoding for wire responses."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return v
