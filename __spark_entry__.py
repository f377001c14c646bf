"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``dbt_osmosis_spark``; this module only adapts the
operator registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dbt_osmosis_spark.operators import ORACLES, QUERIES, load_all  # noqa: E402

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (jaffle_shop `customers`-mart analog) on sf0.001."""
    return QUERIES["q03_customer_ltv"](spark, "/root/testdata/sf0.001")


def _driver_last_round() -> dict[str, int]:
    """Per query name, the latest round with a committed driver row.

    Derived from the CORRECTNESS_r*.json artifacts the driver itself
    commits, so the rotation needs no hand-maintained list and can never
    go stale: a query absent from every file has never been sampled.
    """
    import glob
    import json
    import re

    last: dict[str, int] = {}
    for path in glob.glob(str(Path(_REPO) / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered_names() -> list[str]:
    """Registry names, staleness-first (judge r5 item 2).

    The driver samples the first ~50 entries of ``queries()`` per round.
    Ordering never/oldest-driver-row first guarantees every registered
    query gets a fresh driver CORRECTNESS row at least once every
    ceil(len(registry)/50) rounds, with no bookkeeping: new queries have
    no committed row (round 0) and automatically lead; after the driver
    commits CORRECTNESS_r{N}.json they rotate to the back of the queue.
    Ties break on registry order, which is deterministic.
    """
    return _ordered_by_staleness(_driver_last_round())


def _ordered_by_staleness(last: dict[str, int]) -> list[str]:
    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last.get(n, 0), pos[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
