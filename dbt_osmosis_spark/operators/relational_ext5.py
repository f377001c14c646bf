"""Relational surface, part 6: monitoring analytics.

- q84 rolling z-score anomalies — trailing-window outlier detection over
  the event stream with pure-integer deviation arithmetic

Shared disciplines (the relational_ext4 contract): money/values are
integer cents quantized half-up BEFORE any aggregation, deviations
compare cross-multiplied integer squares instead of dividing by a float
sigma, timestamps go through the NTZ-agnostic epoch_us helpers, and
every reported quantity is an exact integer.

Reference parity: the reference ships arbitrary SQL to a warehouse
(src/dbt_osmosis/core/sql_operations.py — execute_sql_code); these are
engine-side members of that query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.functions.timeutil import epoch_us_sql as _eus
from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.relational import t

# --------------------------------------------------------------------------
# q84: rolling z-score anomalies — trailing 72 h window per event type
# --------------------------------------------------------------------------
# The streaming-monitoring staple: flag events whose value deviates from
# the trailing-window mean by more than k sigma. Exactness discipline:
# with mean = s/n and var = (n*q - s^2)/n^2 over integer cents, the test
# |x - mean| > k*sigma is equivalent (n > 0, both sides >= 0 after
# squaring) to
#     (x*n - s)^2 > k^2 * (n*q - s^2)
# — no division, no sqrt, no float anywhere.
#
# Overflow discipline: the window sums (s, q) and the deviation
# dev = x*n - s stay in BIGINT (safe to n ~ 10^14 rows per window), but
# the SQUARES are taken in 128-bit integer space — DECIMAL(38,0) in
# Spark, HUGEINT in DuckDB, both exact — because dev^2 alone exceeds
# 2^63 once a 72 h window holds ~4*10^4 events of this cents magnitude,
# which a 100x scale-up of the observed per-type rate would reach. The
# reported deviation magnitude is |dev| DIV n (whole cents from the
# mean): abs() first, so floor and truncate agree across engines, and
# the quotient is bounded by the cents domain — no second overflow
# surface. A severity RATIO is deliberately not emitted: dev^2*10^4/thr
# would re-enter 128-bit space only to round back to 64, and Spark's
# `div` is not defined for DECIMAL(38,0) operands (observed returning
# wrong results rather than failing) — downstream ranking can divide
# the two reported exact quantities at whatever precision it wants.
#
# The RANGE frame is over epoch MICROS (bigint), so tie handling and
# frame membership are identical in Spark and DuckDB by value, not by
# row order.

_Q84_WIN_US = 259_200_000_000  # trailing 72 h
_Q84_MIN_N = 12  # below this the window mean is noise, not a baseline
_Q84_K2 = 9  # k = 3 sigma

_Q84_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type,
         epoch_us(ts) AS t_us,
         (CAST(round(value * 1e6) AS BIGINT) + 5000) // 10000 AS cents
  FROM events
),
win AS (
  SELECT event_id, event_type, t_us, cents,
         COUNT(*) OVER w AS n,
         SUM(cents) OVER w AS s,
         SUM(cents * cents) OVER w AS q
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY t_us
               RANGE BETWEEN {_Q84_WIN_US} PRECEDING AND CURRENT ROW)
),
tested AS (
  SELECT event_id, event_type, t_us, cents, n, s, q,
         CAST(cents * n - s AS HUGEINT) AS dev,
         CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
           - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS var_n2
  FROM win
  WHERE n >= {_Q84_MIN_N}
)
SELECT event_id, event_type, t_us, cents,
       CAST(n AS BIGINT) AS win_n,
       CAST(abs(cents * n - s) // n AS BIGINT) AS dev_cents
FROM tested
WHERE var_n2 > 0 AND dev * dev > {_Q84_K2} * var_n2
ORDER BY event_type, t_us, event_id
"""


@register("q84_rolling_zscore_anomalies", oracle=_Q84_ORACLE)
def q84_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose cents value deviates > 3 sigma from the trailing-72h
    per-type window (n >= 12), with the exact whole-cent deviation from
    the window mean — all arithmetic integer, squares in 128-bit space
    (module header).

    Scale shape: one scan, one window exchange on (event_type); the
    trailing frame is value-bounded so per-row state is O(window rate),
    never corpus-sized; no join, no collect.
    """
    base = t(spark, sf_dir, "events").selectExpr(
        "event_id",
        "event_type",
        f"{_eus('ts')} AS t_us",
        "(CAST(round(value * 1e6) AS BIGINT) + 5000) DIV 10000 AS cents",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t_us")
        .rangeBetween(-_Q84_WIN_US, 0)
    )
    win = base.select(
        "event_id",
        "event_type",
        "t_us",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s"),
        F.sum(F.expr("cents * cents")).over(w).alias("q"),
    ).filter(F.col("n") >= _Q84_MIN_N)
    tested = win.selectExpr(
        "event_id",
        "event_type",
        "t_us",
        "cents",
        "n",
        "s",
        "CAST(cents * n - s AS DECIMAL(38,0)) AS dev",
        "CAST(n AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))"
        " - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)) AS var_n2",
    )
    return (
        tested.filter(
            (F.col("var_n2") > 0)
            & (F.expr(f"dev * dev > CAST({_Q84_K2} AS DECIMAL(38,0)) * var_n2"))
        )
        .selectExpr(
            "event_id",
            "event_type",
            "t_us",
            "cents",
            "CAST(n AS BIGINT) AS win_n",
            "CAST(abs(cents * n - s) DIV n AS BIGINT) AS dev_cents",
        )
        .orderBy("event_type", "t_us", "event_id")
    )
