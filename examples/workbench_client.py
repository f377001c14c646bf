"""Workbench-lite client (SURVEY M35 demo): one compile+preview+profile
round-trip against `python -m dbt_osmosis_spark serve --protocol json`.

The reference ships this loop as a Streamlit app (workbench/app.py:423-489);
the server op is the same — this renders the round-trip as text so M35 is
demonstrable end-to-end without a UI framework.

Usage:
    python examples/workbench_client.py HOST PORT "select ... {{ ref('x') }}"
"""

from __future__ import annotations

import json
import socket
import sys


def workbench_roundtrip(host: str, port: int, sql: str, preview: int = 20) -> dict:
    with socket.create_connection((host, port), timeout=60) as sock:
        f = sock.makefile("rw")
        f.write(json.dumps({"op": "workbench", "sql": sql, "preview": preview}) + "\n")
        f.flush()
        return json.loads(f.readline())


def render(resp: dict) -> str:
    if "error" in resp:
        return f"ERROR: {resp['error']}"
    lines = ["-- compiled --", resp["compiled_sql"], ""]
    if resp["lint"]:
        lines.append("-- lint --")
        lines += [f"  L{f_['line']} [{f_['rule']}] {f_['message']}" for f_ in resp["lint"]]
        lines.append("")
    lines.append(f"-- preview ({resp['rowcount']} rows) --")
    lines.append(" | ".join(resp["columns"]))
    for row in resp["rows"][:20]:
        lines.append(" | ".join("NULL" if v is None else str(v) for v in row))
    lines.append("")
    lines.append("-- profile --")
    for col, p in resp["profile"].items():
        lines.append(
            f"  {col}: nulls={p['nulls']} distinct={p['distinct']}"
            f" min={p['min']} max={p['max']}"
        )
    return "\n".join(lines)


def main() -> int:
    host, port = sys.argv[1], int(sys.argv[2])
    sql = sys.argv[3] if len(sys.argv) > 3 else "select 1 as one"
    print(render(workbench_roundtrip(host, port, sql)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
