"""Timestamp-type-agnostic time helpers.

Spark 4 reads parquet timestamps without tz metadata as TIMESTAMP_NTZ by
default (``spark.sql.parquet.inferTimestampNTZ.enabled=true``), while this
engine's own session pins the legacy TIMESTAMP read (session.py). Query code
must work under BOTH sessions — the driver's verify harness builds its own
default-config SparkSession — and ``unix_micros``/``unix_seconds``/
``unix_millis`` hard-fail on TIMESTAMP_NTZ (DATATYPE_MISMATCH).

``epoch_us_sql`` computes epoch microseconds from wall-clock FIELDS
(unix_date / hour / minute / date_part('SECOND')), which Spark defines for
both timestamp types:

- on TIMESTAMP_NTZ it is fully timezone-free — exactly DuckDB's
  ``epoch_us(ts)`` on a naive timestamp, even across DST gaps where any
  NTZ→LTZ cast corrupts nonexistent wall times;
- on TIMESTAMP it equals ``unix_micros`` whenever the session timezone is
  UTC (session.py pins UTC precisely so the two interpretations coincide).

date_part('SECOND') returns DECIMAL(8,6), so sub-second micros survive
exactly; all arithmetic stays in BIGINT (no float rounding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us_sql(col: str) -> str:
    """SQL fragment: epoch microseconds of ``col``'s wall clock.

    ``col`` may be any SQL expression yielding TIMESTAMP or TIMESTAMP_NTZ
    (including an aggregate like ``MAX(ts)``); it is substituted verbatim,
    so pass a trusted fragment, not user input.
    """
    # Every multiplier is written as an explicit BIGINT literal: 60000000
    # fits INT32, so under ANSI mode `minute(ts) * 60000000` would be an
    # INT32 multiply that overflows for minute >= 36.
    return (
        f"(unix_date(CAST(({col}) AS DATE)) * CAST(86400000000 AS BIGINT)"
        f" + hour({col}) * CAST(3600000000 AS BIGINT)"
        f" + minute({col}) * CAST(60000000 AS BIGINT)"
        f" + CAST(date_part('SECOND', {col}) * 1000000 AS BIGINT))"
    )


def epoch_us(col: str) -> Column:
    """Column form of :func:`epoch_us_sql` for a named column."""
    return F.expr(epoch_us_sql(col))
