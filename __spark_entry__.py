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


def _row_green(row: object) -> bool:
    """True iff a committed driver CORRECTNESS row records a pass.

    Full-oracle rows are green when no error was recorded and none of the
    match flags is explicitly false.  Rows-only checks (``err ==
    "no_oracle"``) are green when the Spark side produced a row count.
    Anything else — a traceback in ``err``, a false flag, a malformed
    row — is red.
    """
    if not isinstance(row, dict):
        return False
    err = row.get("err") or row.get("error")
    if err == "no_oracle":
        return row.get("spark_rows") is not None
    if err:
        return False
    return all(row.get(f) is not False for f in ("rows_match", "schema_match", "hash_match"))


def _driver_last_round() -> dict[str, int]:
    """Per query name, the effective staleness round for the rotation.

    Derived from the CORRECTNESS_r*.json artifacts the driver itself
    commits, so the rotation needs no hand-maintained list and can never
    go stale: a query absent from every file has never been sampled.

    A query whose LATEST committed row is non-green sorts as round 0
    (judge r8 item 2): a fixed failure must be the first thing the next
    driver window re-checks, not the last — otherwise a red row earns the
    same back-of-queue rotation as a green one and confirmation of the
    fix is deferred by ceil(registry/50) rounds.
    """
    import glob
    import json
    import re

    latest: dict[str, tuple[int, bool]] = {}
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
        for name, row in rows.items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, _row_green(row))
    return {name: (rnd if green else 0) for name, (rnd, green) in latest.items()}


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
