#!/usr/bin/env python3
"""Rewrite the registry-count fragment in README.md from the live registry.

Run this after registering a new query so the counts quoted in the docs can
never drift from ``dbt_osmosis_spark.operators.QUERIES`` / ``ORACLES``.  The
drift guard ``tests/test_docs_counts.py`` fails the suite when they do and
points here.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
README = REPO / "README.md"

_PATTERN = re.compile(
    r"\(\d+ registered queries, \d+(\s*\n?\s*)DuckDB-oracle-matched"
)


def sync(check_only: bool = False) -> int:
    sys.path.insert(0, str(REPO))
    from dbt_osmosis_spark.operators import ORACLES, QUERIES, load_all

    load_all()
    text = README.read_text()
    m = _PATTERN.search(text)
    if not m:
        print("README.md no longer contains the registry-count fragment", file=sys.stderr)
        return 2
    replacement = f"({len(QUERIES)} registered queries, {len(ORACLES)}{m.group(1)}DuckDB-oracle-matched"
    new_text = _PATTERN.sub(lambda _: replacement, text, count=1)
    if new_text == text:
        print(f"README.md already in sync: {len(QUERIES)} registered / {len(ORACLES)} oracle-matched")
        return 0
    if check_only:
        print(
            f"README.md is STALE; run `python tools/sync_readme_counts.py` "
            f"(live registry: {len(QUERIES)} / {len(ORACLES)})",
            file=sys.stderr,
        )
        return 1
    README.write_text(new_text)
    print(f"README.md updated: {len(QUERIES)} registered / {len(ORACLES)} oracle-matched")
    return 0


if __name__ == "__main__":
    raise SystemExit(sync(check_only="--check" in sys.argv[1:]))
