"""Relational surface, part 6: monitoring analytics.

- q84 rolling z-score anomalies — trailing-window outlier detection over
  the event stream with pure-integer deviation arithmetic
- q85 CUSUM drift detection — q77's clamp-scan identity over the
  gap-filled hourly series, fully integerized by 2H scaling

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

    Scale shape: one scan, one LINEAR cumulative-window exchange on
    (event_type) over the event+probe union, one event_id re-pairing
    aggregate; no collect. The naive sliding RANGE frame is quadratic in
    Spark (inline comment) — found hanging at the 100x probe and
    replaced by the prefix-sum decomposition, output byte-identical.

    PRECONDITION: event_id is unique (the events table's key). The
    re-pairing groupBy(event_id) would silently merge duplicated ids
    into garbage sums; tests/test_round11_ops.py pins distinctness
    against the generator at both test SFs.
    """
    base = t(spark, sf_dir, "events").selectExpr(
        "event_id",
        "event_type",
        f"{_eus('ts')} AS t_us",
        "(CAST(round(value * 1e6) AS BIGINT) + 5000) DIV 10000 AS cents",
    )
    # Trailing-window sums by PREFIX-SUM DECOMPOSITION, not a sliding
    # RANGE frame. Spark's SlidingWindowFunctionFrame re-aggregates the
    # whole buffer every time the frame slides (no inverse-update), so a
    # value-bounded trailing frame costs O(rows x frame_rows) per
    # partition — measured as a >35 min hang at the 100x probe, where
    # both row count AND window occupancy grow 100x (10,000x work; the
    # same plan finished in ~1 s at sf0.1). The identity
    #     sum over (t-W, t]  =  cum(t) - cum(t - W - 1)
    # needs only UNBOUNDED PRECEDING frames, which Spark evaluates
    # incrementally in O(rows): union each event with a zero-weight
    # PROBE row at t - W - 1, take RANGE-cumulative sums (RANGE, not
    # ROWS, so ties at the same micro are peers exactly as the original
    # frame counted them; probes weigh nothing, so their peer order is
    # irrelevant), and re-pair the two readings per event with one
    # event_id aggregate. Cost: one window exchange + one group-by
    # shuffle, both linear — the plan a 100 TB event stream needs.
    # w_s / w_q accumulate as DECIMAL(38,0): unlike the old bounded frame,
    # the cumulative sums grow with FULL partition history, so at 100 TB
    # the running sum of squares would blow past 2^63 (ANSI
    # ARITHMETIC_OVERFLOW under Spark 4 defaults). Per-row values are
    # BIGINT-safe (cents^2 <= ~1e16); only the accumulators need 128-bit
    # space. n and s cast back to BIGINT after the cum(t)-cum(t-W-1)
    # subtraction (window-local, bounded); q stays DECIMAL(38,0) into the
    # variance arithmetic, which already runs in that space.
    data = base.selectExpr(
        "event_type", "t_us", "event_id", "cents",
        "CAST(1 AS BIGINT) AS w_n",
        "CAST(cents AS DECIMAL(38,0)) AS w_s",
        "CAST(cents * cents AS DECIMAL(38,0)) AS w_q",
        "true AS is_data",
    )
    probe = base.selectExpr(
        "event_type",
        f"t_us - {_Q84_WIN_US} - 1 AS t_us",
        "event_id", "cents",
        "CAST(0 AS BIGINT) AS w_n",
        "CAST(0 AS DECIMAL(38,0)) AS w_s",
        "CAST(0 AS DECIMAL(38,0)) AS w_q",
        "false AS is_data",
    )
    cw = (
        W.partitionBy("event_type")
        .orderBy("t_us")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    cum = data.unionByName(probe).select(
        "event_type", "t_us", "event_id", "cents", "is_data",
        F.sum("w_n").over(cw).alias("cn"),
        F.sum("w_s").over(cw).alias("cs"),
        F.sum("w_q").over(cw).alias("cq"),
    )
    sign = F.when(F.col("is_data"), F.lit(1)).otherwise(F.lit(-1))
    win = (
        cum.groupBy("event_id")
        .agg(
            F.max(F.when(F.col("is_data"), F.col("event_type"))).alias("event_type"),
            F.max(F.when(F.col("is_data"), F.col("t_us"))).alias("t_us"),
            F.max(F.when(F.col("is_data"), F.col("cents"))).alias("cents"),
            F.sum(sign * F.col("cn")).cast("bigint").alias("n"),
            F.sum(sign * F.col("cs")).cast("bigint").alias("s"),
            F.sum(sign * F.coalesce(F.col("cq"), F.lit(0)))
            .cast("decimal(38,0)")
            .alias("q"),
        )
        .filter(F.col("n") >= _Q84_MIN_N)
    )
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


# --------------------------------------------------------------------------
# q85: CUSUM drift detection over the gap-filled hourly event series
# --------------------------------------------------------------------------
# q84 flags POINT anomalies; CUSUM (Page 1954) flags SUSTAINED drift —
# the one-sided cumulative sum C_i = max(0, C_{i-1} + (x_i - mu - kappa))
# alarms when a rate stays above baseline long enough, however modest
# each hour looks. Two established moves compose:
#   - the recurrence is q77's non-associative clamp scan, so it is
#     window-expressible via C_i = P_i - min(0, min_{j<=i} P_j);
#   - with kappa = mu/2 and mu = T/H (T events over H grid hours),
#     scaling by 2H integerizes everything: d_i = 2H*x_i - 3T, and the
#     alarm threshold is pure integer too: the committed threshold
#     2*mu is C_scaled > 4T (chosen against the observed corpus so both
#     test scales emit alarms; a production deployment tunes it like any
#     CUSUM h).
# The hourly series is GAP-FILLED per type (missing hours count 0 — a
# drift detector that skips quiet hours never decays); the grid comes
# from a per-type sequence explode, |grid| = hours in range, independent
# of event volume.
#
# Magnitude bound: |P| <= 2H*T + 3T*H ~ 5*H*T; at T = 10^12 events/type
# and a 10-year hourly grid (H ~ 9*10^4) that is ~5*10^17 < 2^63 —
# BIGINT-safe at any realistic scale because H is a GRID size, not a
# data size.

_Q85_THRESH_NUM = 4  # alarm when C_scaled > 4*T  (i.e. CUSUM > 2*mu)

_Q85_ORACLE = f"""
WITH base AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h
  FROM events
),
cnt AS (SELECT event_type, h, COUNT(*) AS x FROM base GROUP BY event_type, h),
bounds AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM base GROUP BY event_type),
grid AS (
  SELECT b.event_type, g.h
  FROM bounds b, UNNEST(range(b.h0, b.h1 + 1)) AS g(h)
),
series AS (
  SELECT g.event_type, g.h, COALESCE(c.x, 0) AS x
  FROM grid g LEFT JOIN cnt c ON g.event_type = c.event_type AND g.h = c.h
),
stats AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS t_all, COUNT(*) AS n_hours
  FROM series GROUP BY event_type
),
d AS (
  SELECT s.event_type, s.h, s.x,
         2 * st.n_hours * s.x - 3 * st.t_all AS dd, st.t_all
  FROM series s JOIN stats st USING (event_type)
),
p AS (
  SELECT event_type, h, x, t_all,
         SUM(dd) OVER (PARTITION BY event_type ORDER BY h) AS pp
  FROM d
),
c AS (
  SELECT event_type, h, x, t_all,
         pp - LEAST(0, MIN(pp) OVER (PARTITION BY event_type ORDER BY h)) AS cus
  FROM p
)
SELECT event_type, CAST(h AS BIGINT) AS hour_idx, CAST(x AS BIGINT) AS x,
       CAST(cus AS BIGINT) AS cusum_scaled
FROM c
WHERE cus > {_Q85_THRESH_NUM} * t_all
ORDER BY event_type, hour_idx
"""


@register("q85_cusum_drift", oracle=_Q85_ORACLE)
def q85_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours where the one-sided CUSUM of the per-type event rate exceeds
    its alarm threshold — sustained-drift detection, all arithmetic in
    scaled BIGINTs (module comment).

    Scale shape: one scan -> per-(type, hour) partial-aggregated counts;
    the grid explode is |hours|-sized; two window passes keyed on
    event_type. The per-type window holds grid hours, not events."""
    base = t(spark, sf_dir, "events").selectExpr(
        "event_type", f"{_eus('ts')} DIV 3600000000 AS h"
    )
    cnt = base.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("x"))
    grid = (
        base.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select("event_type", F.explode(F.expr("sequence(h0, h1)")).alias("h"))
    )
    series = grid.join(cnt, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("x", F.lit(0)).alias("x")
    )
    stats = series.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("t_all"), F.count(F.lit(1)).alias("n_hours")
    )
    d = series.join(F.broadcast(stats), "event_type").selectExpr(
        "event_type", "h", "x", "t_all", "2 * n_hours * x - 3 * t_all AS dd"
    )
    wp = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    p = d.select(
        "event_type", "h", "x", "t_all", F.sum("dd").over(wp).alias("pp")
    )
    c = p.select(
        "event_type",
        "h",
        "x",
        "t_all",
        (
            F.col("pp")
            - F.least(F.lit(0).cast("bigint"), F.min("pp").over(wp))
        ).alias("cus"),
    )
    return (
        c.filter(F.col("cus") > _Q85_THRESH_NUM * F.col("t_all"))
        .selectExpr(
            "event_type",
            "CAST(h AS BIGINT) AS hour_idx",
            "CAST(x AS BIGINT) AS x",
            "CAST(cus AS BIGINT) AS cusum_scaled",
        )
        .orderBy("event_type", "hour_idx")
    )


# --------------------------------------------------------------------------
# q86: greedy interval scheduling — max non-overlapping fulfillment windows
# --------------------------------------------------------------------------
# Activity selection (Kleinberg & Tardos ch. 4): per customer, each order
# spans [o_orderdate, greatest(max(l_shipdate), o_orderdate)] — clamped,
# because the synthetic data ships 291 orders (sf0.001) BEFORE the order
# date, and an inverted interval (s > e) satisfies its own "starts after
# my end" test, so the greedy chain (and the oracle's recursion) would
# revisit it forever. Pick the maximum number of
# pairwise non-overlapping windows. The earliest-deadline greedy —
# repeatedly take the interval with the smallest end among those starting
# strictly after the last selected end — is provably optimal for the
# count objective. Ties break deterministically on (end, start, orderkey).
#
# The selection chain is inherently sequential per key (each pick depends
# on the previous pick's end), so this is the documented custom-operator
# path (b): `applyInPandas` over customer groups — per-key state stays
# tiny (a customer's orders), parallelism comes from key partitioning,
# and the only shuffle is the groupBy(custkey) that any per-key
# formulation needs. The interval build itself is one lineitem rollup.
# The oracle expresses the same greedy as a recursive CTE whose step
# picks, per key, the argmin-(end,start,id) interval starting after the
# previous pick (argmin via NOT EXISTS, since aggregates are not allowed
# in a recursive term).
#
# Scale: at 100 TB the groupBy(custkey) shuffle is the cost; per-key
# payloads are order-count-bounded (no skew beyond the busiest customer),
# and the arrow batches stream group-at-a-time, so memory per task is
# O(max orders per customer).
#
# Reference parity: engine-side member of the reference's SQL query
# surface (src/dbt_osmosis/core/sql_operations.py).

_Q86_ORACLE = """
WITH RECURSIVE iv AS (
  SELECT o.o_custkey AS k, o.o_orderkey AS id,
         CAST(o.o_orderdate AS DATE) AS s,
         GREATEST(CAST(MAX(l.l_shipdate) AS DATE),
                  CAST(o.o_orderdate AS DATE)) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
),
pick AS (
  SELECT k, id, s, e FROM iv x
  WHERE NOT EXISTS (
    SELECT 1 FROM iv y WHERE y.k = x.k
      AND (y.e < x.e OR (y.e = x.e AND (y.s < x.s
           OR (y.s = x.s AND y.id < x.id))))
  )
  UNION ALL
  SELECT c.k, c.id, c.s, c.e
  FROM pick p JOIN iv c ON c.k = p.k AND c.s > p.e
  WHERE NOT EXISTS (
    SELECT 1 FROM iv y WHERE y.k = p.k AND y.s > p.e
      AND (y.e < c.e OR (y.e = c.e AND (y.s < c.s
           OR (y.s = c.s AND y.id < c.id))))
  )
),
base AS (SELECT k, COUNT(*) AS n_windows FROM iv GROUP BY k)
SELECT b.k AS c_custkey,
       b.n_windows,
       COUNT(*) AS n_selected,
       MIN(p.s) AS first_start,
       MAX(p.e) AS last_end,
       CAST(SUM(p.e - p.s) AS BIGINT) AS utilized_days
FROM pick p JOIN base b ON b.k = p.k
GROUP BY b.k, b.n_windows
ORDER BY c_custkey
"""


@register("q86_interval_scheduling", oracle=_Q86_ORACLE)
def q86_interval_scheduling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer maximum non-overlapping fulfillment windows via the
    earliest-deadline greedy (module comment); applyInPandas per key."""
    import pandas as pd

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").cast("date").alias("s"),
    )
    li = t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("e")
    )
    iv = orders.join(li, orders.id == li.l_orderkey).select(
        "k",
        "id",
        F.datediff("s", F.lit("1970-01-01").cast("date")).alias("s_d"),
        F.datediff(F.greatest("e", "s"), F.lit("1970-01-01").cast("date")).alias(
            "e_d"
        ),
    )
    # One shuffle co-locating each customer's intervals, an in-partition
    # sort, then a single streaming Arrow pass. groupBy().applyInPandas
    # would build one pandas frame PER CUSTOMER (measured 38 s at sf0.1
    # from per-group overhead alone); mapInPandas sees ~10k-row batches,
    # carrying the per-key greedy state across batch boundaries. Dates
    # travel as epoch-day ints (cheap numpy columns), back to DATE at the
    # end.
    part = iv.repartition(F.col("k")).sortWithinPartitions("k", "e_d", "s_d", "id")

    def greedy_stream(batches):
        cols = ("c_custkey", "n_windows", "n_selected", "first_d", "last_d", "util")
        out = {c: [] for c in cols}
        cur_k = None
        n_win = n_sel = first_d = last_e = util = 0

        def flush():
            out["c_custkey"].append(cur_k)
            out["n_windows"].append(n_win)
            out["n_selected"].append(n_sel)
            out["first_d"].append(first_d)
            out["last_d"].append(last_e)
            out["util"].append(util)

        for pdf in batches:
            # .tolist() gives native ints — iterating numpy scalars is
            # 2-3x slower in a tight loop
            for k, s, e in zip(
                pdf["k"].tolist(), pdf["s_d"].tolist(), pdf["e_d"].tolist()
            ):
                if k != cur_k:
                    if cur_k is not None:
                        flush()
                    cur_k = k
                    n_win = n_sel = util = 0
                    last_e = None
                n_win += 1
                if last_e is None or s > last_e:
                    if n_sel == 0:
                        first_d = s
                    n_sel += 1
                    util += e - s
                    last_e = e
            if len(out["c_custkey"]) >= 65536:
                yield pd.DataFrame(out)
                out = {c: [] for c in cols}
        if cur_k is not None:
            flush()
        if out["c_custkey"]:
            yield pd.DataFrame(out)

    raw = part.mapInPandas(
        greedy_stream,
        schema=(
            "c_custkey bigint, n_windows bigint, n_selected bigint, "
            "first_d bigint, last_d bigint, util bigint"
        ),
    )
    return raw.select(
        "c_custkey",
        "n_windows",
        "n_selected",
        F.expr("date_add(DATE'1970-01-01', CAST(first_d AS INT))").alias(
            "first_start"
        ),
        F.expr("date_add(DATE'1970-01-01', CAST(last_d AS INT))").alias("last_end"),
        F.col("util").alias("utilized_days"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# q87: largest-remainder apportionment of a fixed budget by revenue share
# --------------------------------------------------------------------------
# The proration primitive every finance/allocation pipeline needs:
# distribute an integer budget (10 000 units) across nations proportional
# to revenue such that the parts sum EXACTLY to the budget. Hamilton's
# largest-remainder method: floor the exact proportional share, then hand
# the leftover units to the largest fractional remainders (ties broken by
# nation name — deterministic). All arithmetic is integer: revenue is
# exact cents (the q01 decimal discipline), the floor share is
# (budget * rev_c) DIV total_c, and the remainder comparison is the
# integer modulus (budget * rev_c) % total_c — no float ever exists, so
# the invariant SUM(alloc) == budget is provable, not approximate.
#
# Scale shape: one lineitem->orders->customer->nation rollup (the q04
# join chain, dimension sides broadcast); the apportionment itself runs
# on a nation-sized frame (25 rows) — rank-by-remainder is a single tiny
# window. The heavy work is the revenue rollup, which shuffles once on
# the group key.
#
# Overflow bound: budget * rev_c stays in BIGINT while total revenue is
# under 2^63/10^4 cents (~$9.2e12); past that the share and remainder
# columns widen to DECIMAL(38,0) — same expressions, wider type.

_Q87_BUDGET = 10000

_Q87_ORACLE = f"""
WITH rev AS (
  SELECT n.n_name,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
),
tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS t FROM rev),
base AS (
  SELECT n_name, rev_c,
         ({_Q87_BUDGET} * rev_c) // t AS fl,
         ({_Q87_BUDGET} * rev_c) % t AS rem,
         t
  FROM rev CROSS JOIN tot
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, n_name) AS rk,
         {_Q87_BUDGET} - SUM(fl) OVER () AS leftover
  FROM base
)
SELECT n_name, rev_c,
       CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc,
       CAST(fl AS BIGINT) AS floor_share,
       CAST(rem * 10000 // t AS BIGINT) AS remainder_bp
FROM ranked
ORDER BY n_name
"""


@register("q87_largest_remainder_alloc", oracle=_Q87_ORACLE)
def q87_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 10 000-unit budget
    across nations by exact-cents revenue share (module comment)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
        ).alias("rev_c"),
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    )
    tot = rev.agg(F.sum("rev_c").cast("bigint").alias("t"))
    base = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "rev_c",
        F.expr(f"({_Q87_BUDGET} * rev_c) DIV t").alias("fl"),
        F.expr(f"({_Q87_BUDGET} * rev_c) % t").alias("rem"),
        "t",
    )
    ranked = base.select(
        "*",
        F.row_number().over(W.orderBy(F.desc("rem"), "n_name")).alias("rk"),
        (F.lit(_Q87_BUDGET) - F.sum("fl").over(W.partitionBy())).alias("leftover"),
    )
    return ranked.select(
        "n_name",
        "rev_c",
        F.expr("CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)").alias(
            "alloc"
        ),
        F.col("fl").cast("bigint").alias("floor_share"),
        F.expr("CAST(rem * 10000 DIV t AS BIGINT)").alias("remainder_bp"),
    ).orderBy("n_name")


# --------------------------------------------------------------------------
# q88: Gini concentration of customer revenue within each nation
# --------------------------------------------------------------------------
# The inequality/concentration metric every marketplace-analytics stack
# reports: per nation, the Gini coefficient of its customers' revenue.
# With x_1 <= ... <= x_n the sorted customer totals (exact cents) the
# closed form  G = (2*SUM(i*x_i) - (n+1)*SUM(x)) / (n*SUM(x))  is pure
# BIGINT except the final division, emitted in basis points by integer
# DIV — no float anywhere. Tie order among equal x cannot change
# SUM(i*x_i) (swapping equal values permutes identical products), so
# row_number is safe despite being non-deterministic among ties.
#
# Scale shape: one revenue rollup (lineitem -> orders -> customer joins,
# dimension side broadcast), then a per-nation window — partition count
# = nations, so at extreme scale the rank becomes the two-phase
# distributed selection (the p40 note); the rollup output (one row per
# customer) is what the window actually sorts, already 4 orders of
# magnitude smaller than the fact table.
#
# Overflow: SUM(i*x_i) <= n^2 * max_x — safe through ~10^7 customers per
# nation at $10^5 revenue; past that widen to DECIMAL(38,0).

_Q88_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey, o.o_custkey AS cust,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_nationkey, x,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY x, cust) AS i
  FROM rev
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(r.x) AS BIGINT) AS total_rev_c,
       CAST((2 * SUM(CAST(r.i AS HUGEINT) * r.x)
             - (COUNT(*) + 1) * CAST(SUM(r.x) AS HUGEINT)) * 10000
            // (COUNT(*) * CAST(SUM(r.x) AS HUGEINT)) AS BIGINT) AS gini_bp
FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("q88_revenue_gini", oracle=_Q88_ORACLE)
def q88_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer revenue in exact integer
    arithmetic, basis points (module comment)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
        ).alias("rev_c"),
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_nationkey", F.col("o_custkey").alias("cust"))
        .agg(F.sum("rev_c").cast("bigint").alias("x"))
    )
    ranked = rev.withColumn(
        "i", F.row_number().over(W.partitionBy("c_nationkey").orderBy("x", "cust"))
    )
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("x").cast("bigint").alias("total_rev_c"),
            # 128-bit integer space (DECIMAL38 here, HUGEINT in the
            # oracle): SUM(i*x) ~ n^2/2 * avg_x overflowed BIGINT at the
            # 100x probe (~60k customers/nation -> 2e19 > 2^63). The DIV
            # result (gini_bp <= 10000) stays a safe BIGINT.
            F.expr(
                "CAST((2 * SUM(CAST(i AS DECIMAL(38,0)) * x)"
                " - (COUNT(*) + 1) * CAST(SUM(x) AS DECIMAL(38,0))) * 10000"
                " DIV (COUNT(*) * CAST(SUM(x) AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("gini_bp"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("n_name", "n_customers", "total_rev_c", "gini_bp")
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# q89: weekday-aligned year-over-year revenue (lag-364 comparison)
# --------------------------------------------------------------------------
# Naive YoY compares a Tuesday to a Monday and reports weekday mix as
# growth; retail/fin analytics therefore aligns on 364 days (52 weeks
# exactly), the standard "same weekday last year" comparison. Per month:
# sum the daily revenue of days WHOSE ALIGNED DAY EXISTS, the aligned
# sum, and the growth in basis points — integer cents throughout, one
# integer DIV at the end.
#
# Scale shape: one fact rollup to DAILY grain (the only corpus-sized
# shuffle); the 364-day self-join runs on the date-cardinality rollup
# (thousands of rows at any corpus size — calendar-bounded, not
# data-bounded) and is an exact 1:1 equi-join on the shifted date.

_Q89_ORACLE = """
WITH daily AS (
  SELECT CAST(o.o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1
),
aligned AS (
  SELECT cur.d, cur.rev_c, prev.rev_c AS prev_rev_c
  FROM daily cur JOIN daily prev ON prev.d = cur.d - INTERVAL 364 DAY
)
SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM d) AS BIGINT) AS mo,
       CAST(COUNT(*) AS BIGINT) AS n_days_aligned,
       CAST(SUM(rev_c) AS BIGINT) AS rev_c,
       CAST(SUM(prev_rev_c) AS BIGINT) AS aligned_rev_c,
       CAST((SUM(rev_c) - SUM(prev_rev_c)) * 10000 // SUM(prev_rev_c) AS BIGINT)
         AS yoy_bp
FROM aligned
GROUP BY 1, 2
ORDER BY yr, mo
"""


@register("q89_weekday_aligned_yoy", oracle=_Q89_ORACLE)
def q89_weekday_aligned_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue vs the same-weekday (lag-364) prior-year days,
    growth in basis points, exact cents (module comment)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
        ).alias("rev_c"),
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("d")
        .agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    )
    prev = daily.select(
        F.date_add("d", 364).alias("d"), F.col("rev_c").alias("prev_rev_c")
    )
    aligned = daily.join(prev, "d")
    return (
        aligned.groupBy(
            F.year("d").cast("bigint").alias("yr"),
            F.month("d").cast("bigint").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_aligned"),
            F.sum("rev_c").cast("bigint").alias("rev_c"),
            F.sum("prev_rev_c").cast("bigint").alias("aligned_rev_c"),
            F.expr(
                "CAST((SUM(rev_c) - SUM(prev_rev_c)) * 10000"
                " DIV SUM(prev_rev_c) AS BIGINT)"
            ).alias("yoy_bp"),
        )
        .orderBy("yr", "mo")
    )


# --------------------------------------------------------------------------
# q90: cohort LTV curve — cumulative revenue per signup cohort by month age
# --------------------------------------------------------------------------
# The subscription-analytics companion to q57's retention matrix: group
# customers by FIRST-ORDER month (the cohort), then for each cohort age
# (months since first order) report active customers, period revenue,
# cumulative revenue, and cumulative LTV per cohort member — the curve a
# growth team reads to see whether newer cohorts monetize faster. All
# integer: cents, month arithmetic as y*12+m, and the per-member LTV by
# integer DIV over the FULL cohort size (not just active members — LTV
# divides by everyone acquired, the standard definition).
#
# Scale shape: one fact rollup to (customer, month); the cohort
# assignment is a per-customer min (same rollup grain); the curve is a
# cohort-month-sized frame with one cumulative window partitioned by
# cohort — calendar-bounded, not data-bounded.

_Q90_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey AS cust,
         EXTRACT(year FROM o.o_orderdate) * 12
           + EXTRACT(month FROM o.o_orderdate) AS ym,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
cohort AS (SELECT cust, MIN(ym) AS c_ym FROM rev GROUP BY cust),
csize AS (SELECT c_ym, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM cohort GROUP BY c_ym),
aged AS (
  SELECT c.c_ym, r.ym - c.c_ym AS age, r.cust, r.rev_c
  FROM rev r JOIN cohort c ON c.cust = r.cust
),
curve AS (
  SELECT c_ym, age,
         CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_active,
         CAST(SUM(rev_c) AS BIGINT) AS rev_c
  FROM aged GROUP BY c_ym, age
)
SELECT CAST(v.c_ym // 12 AS BIGINT) AS cohort_year,
       CAST(v.c_ym % 12 AS BIGINT) AS cohort_month0,
       CAST(v.age AS BIGINT) AS age_months,
       s.cohort_n,
       v.n_active,
       v.rev_c,
       CAST(SUM(v.rev_c) OVER (PARTITION BY v.c_ym ORDER BY v.age) AS BIGINT)
         AS cum_rev_c,
       CAST(SUM(v.rev_c) OVER (PARTITION BY v.c_ym ORDER BY v.age)
            // s.cohort_n AS BIGINT) AS cum_ltv_per_member_c
FROM curve v JOIN csize s ON s.c_ym = v.c_ym
ORDER BY cohort_year, cohort_month0, age_months
"""


@register("q90_cohort_ltv_curve", oracle=_Q90_ORACLE)
def q90_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-revenue LTV curve per first-order-month cohort, exact
    cents and integer month ages (module comment)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
        ).alias("rev_c"),
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("cust"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("cust", "ym")
        .agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    )
    cohort = rev.groupBy("cust").agg(F.min("ym").alias("c_ym"))
    csize = cohort.groupBy("c_ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_n")
    )
    aged = rev.join(cohort, "cust").select(
        "c_ym", (F.col("ym") - F.col("c_ym")).alias("age"), "cust", "rev_c"
    )
    curve = aged.groupBy("c_ym", "age").agg(
        F.countDistinct("cust").cast("bigint").alias("n_active"),
        F.sum("rev_c").cast("bigint").alias("rev_c"),
    )
    cum_w = W.partitionBy("c_ym").orderBy("age")
    return (
        curve.join(F.broadcast(csize), "c_ym")
        .select(
            F.expr("CAST(c_ym DIV 12 AS BIGINT)").alias("cohort_year"),
            F.expr("CAST(c_ym % 12 AS BIGINT)").alias("cohort_month0"),
            F.col("age").cast("bigint").alias("age_months"),
            "cohort_n",
            "n_active",
            "rev_c",
            F.sum("rev_c").over(cum_w).cast("bigint").alias("cum_rev_c"),
            F.expr("CAST(SUM(rev_c) OVER (PARTITION BY c_ym ORDER BY age)"
                   " DIV cohort_n AS BIGINT)").alias("cum_ltv_per_member_c"),
        )
        .orderBy("cohort_year", "cohort_month0", "age_months")
    )
