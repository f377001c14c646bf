"""Second extension band of the relational surface (q41+): statistical
aggregates, gaps-and-islands, time-grid resampling with forward fill, string
edit distance, JSON extraction, exact median/mode.

Same contract as relational_ext.py: every query is a Spark-first DataFrame
plan with a DuckDB oracle twin (identical aliases, identical deterministic
arithmetic — the decimal-sum convention from functions.numeric), registered
for the driver's hash-match harness. The reference ships SQL like this to a
warehouse verbatim (SURVEY §2A: the proxy/workbench accept arbitrary SQL,
reference src/dbt_osmosis/sql/proxy.py:112-127); here each shape runs
natively on Spark with the plan you would want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.relational import t

# --------------------------------------------------------------------------
# q41: statistical aggregates — stddev/variance/corr/covariance per group
# --------------------------------------------------------------------------
# Spark's stddev/corr built-ins fold doubles in partition order, so their
# last ulp is partitioning-dependent. For hash parity AND cluster-stable
# results we compute the moment sums exactly (per-row double expression →
# decimal cast → decimal SUM, associative) and derive the statistics from
# those exact scalars with identical IEEE double arithmetic in both engines.
# Same single-shuffle plan as a plain groupBy — the moments are just five
# map-side partial aggregates.

def _q41_moments() -> dict:
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": F.count(F.lit(1)),
        "sx": F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double"),
        "sy": F.sum(F.col("l_extendedprice").cast("decimal(28,4)")).cast("double"),
        "sxx": F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,4)")).cast(
            "double"
        ),
        "syy": F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(28,4)")
        ).cast("double"),
        "sxy": F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(28,4)")
        ).cast("double"),
    }


_Q41_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       round((syy - sy * sy / n) / (n - 1), 4) AS var_price,
       round((sxy - sx * sy / n) / n, 6) AS covar_pop,
       round((n * sxy - sx * sy)
         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


@register("q41_stats_aggregates", oracle=_Q41_ORACLE)
def q41_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        *[c.alias(k) for k, c in _q41_moments().items()]
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round((syy - sy * sy / n) / (n - 1), 4).alias("var_price"),
        F.round((sxy - sx * sy / n) / n, 6).alias("covar_pop"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# q42: gaps and islands — consecutive same-event-type streaks per user
# --------------------------------------------------------------------------
# The classic two-row_number difference: rn(user) - rn(user,type) is
# constant within a run of equal types. Both windows shuffle on user_id
# ONCE (same partitioning key, Spark reuses the exchange); the island
# aggregation is a second small shuffle on the island key. Deterministic
# order inside a user via (ts, event_id) — event_id breaks ts ties.

_Q42_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
  FROM events
),
islands AS (
  SELECT user_id, event_type, grp, COUNT(*) AS len
  FROM seq GROUP BY user_id, event_type, grp
)
SELECT event_type,
       COUNT(*) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS max_len,
       CAST(SUM(CAST(len AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS avg_len
FROM islands
GROUP BY event_type
ORDER BY event_type
"""


@register("q42_gaps_islands", oracle=_Q42_ORACLE)
def q42_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_user) - F.row_number().over(w_type)).alias("grp"),
    )
    islands = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("len").cast("bigint").alias("max_len"),
            (F.sum(F.col("len").cast("decimal(18,0)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_len"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q43: time-grid resample + forward fill (LOCF) per user
# --------------------------------------------------------------------------
# Downsample irregular events onto a 6-hour grid, carrying the last
# observation forward — the feature-store/training-snapshot shape. The
# scalable pattern (NO per-grid-point range join): union(observations,
# grid) sorted per user by (time, is_grid) and last_value(ignorenulls)
# over unbounded-preceding — one shuffle on user_id. The grid bounds come
# from a 1-row global agg (broadcast cross join). Users capped to a fixed
# panel (user_id < 8) so output size is grid×panel, independent of corpus
# row count.

_Q43_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, MAX(ts) AS hi FROM events
),
grid AS (
  SELECT u.user_id, g.gts
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 8) u,
       (SELECT unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS gts FROM bounds) g
),
obs AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE user_id < 8 GROUP BY user_id, ts
),
unioned AS (
  SELECT user_id, ts AS time, 0 AS is_grid, value FROM obs
  UNION ALL
  SELECT user_id, gts AS time, 1 AS is_grid, NULL AS value FROM grid
),
filled AS (
  SELECT user_id, time, is_grid,
         last_value(value IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY time, is_grid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
  FROM unioned
)
SELECT user_id, time AS grid_ts, round(value, 6) AS value
FROM filled WHERE is_grid = 1
ORDER BY user_id, grid_ts
"""


@register("q43_resample_ffill", oracle=_Q43_ORACLE)
def q43_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    panel = ev.filter(F.col("user_id") < 8)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = (
        panel.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))
            ).alias("gts"),
        )
    )
    obs = panel.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("value")
    )
    unioned = obs.select(
        "user_id", F.col("ts").alias("time"), F.lit(0).alias("is_grid"), "value"
    ).unionByName(
        grid.select(
            "user_id",
            F.col("gts").alias("time"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("time", "is_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("value", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select("user_id", F.col("time").alias("grid_ts"), F.round("value", 6).alias("value"))
        .orderBy("user_id", "grid_ts")
    )


# --------------------------------------------------------------------------
# q44: string edit distance — near-matching reference data values
# --------------------------------------------------------------------------
# Pairwise levenshtein over the DISTINCT brand domain (fixed cardinality in
# TPC-H regardless of SF — the distinct-first shape is what makes a fuzzy
# value-match feasible at 100 TB: dedupe to the domain, THEN go quadratic
# on the tiny domain, broadcast both sides).

_Q44_MAX_DIST = 2

_Q44_ORACLE = f"""
WITH b AS (SELECT DISTINCT p_brand FROM part)
SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
       CAST(levenshtein(a.p_brand, c.p_brand) AS INT) AS dist
FROM b a JOIN b c ON a.p_brand < c.p_brand
WHERE levenshtein(a.p_brand, c.p_brand) <= {_Q44_MAX_DIST}
ORDER BY brand_a, brand_b
"""


@register("q44_edit_distance", oracle=_Q44_ORACLE)
def q44_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = t(spark, sf_dir, "part").select("p_brand").distinct()
    a = b.select(F.col("p_brand").alias("brand_a"))
    c = b.select(F.col("p_brand").alias("brand_b"))
    return (
        a.join(F.broadcast(c), F.col("brand_a") < F.col("brand_b"))
        .withColumn("dist", F.levenshtein("brand_a", "brand_b").cast("int"))
        .filter(F.col("dist") <= _Q44_MAX_DIST)
        .orderBy("brand_a", "brand_b")
    )


# --------------------------------------------------------------------------
# q45: JSON extraction — semi-structured props column
# --------------------------------------------------------------------------
# get_json_object is JVM-side (Jackson) and whole-stage-codegen friendly;
# the JSON never leaves the executors and the extraction happens during the
# scan projection — at 100 TB this is a single map-side pass + one agg
# shuffle on the (tiny) event_type key.

_Q45_ORACLE = """
WITH x AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_with_k,
       CAST(MIN(k) AS INT) AS min_k,
       CAST(MAX(k) AS INT) AS max_k,
       CAST(SUM(CAST(k AS DECIMAL(18,0))) AS DOUBLE) / COUNT(k) AS avg_k,
       CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_50
FROM x
GROUP BY event_type
ORDER BY event_type
"""


@register("q45_json_extract", oracle=_Q45_ORACLE)
def q45_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            (F.sum(F.col("k").cast("decimal(18,0)")).cast("double") / F.count("k")).alias(
                "avg_k"
            ),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint").alias("n_gt_50"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q46: exact median + deterministic mode per group
# --------------------------------------------------------------------------
# Exact interpolated median via percentile() (Spark sorts within the
# group's partial state — exact, unlike approx_percentile) and mode with
# an EXPLICIT (count DESC, value ASC) tie-break: engines' native mode()
# picks an arbitrary tied value, so the deterministic form is a
# count + row_number plan — two shuffles, both on small key domains.

_Q46_ORACLE = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
modes AS (
  SELECT o_orderstatus, o_orderpriority AS mode_priority,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM counts
),
med AS (
  SELECT o_orderstatus,
         round(median(o_totalprice), 4) AS median_price,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderstatus
)
SELECT med.o_orderstatus AS o_orderstatus, med.n, med.median_price, modes.mode_priority
FROM med JOIN modes ON med.o_orderstatus = modes.o_orderstatus AND modes.rn = 1
ORDER BY med.o_orderstatus
"""


@register("q46_median_mode", oracle=_Q46_ORACLE)
def q46_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), "o_orderpriority")
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    med = o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        med.join(F.broadcast(modes), "o_orderstatus")
        .select("o_orderstatus", "n", "median_price", "mode_priority")
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# q47: time-RANGE window frames — rolling 24h aggregates per user
# --------------------------------------------------------------------------
# q26 covers ROWS frames; RANGE BETWEEN INTERVAL frames are the other half
# of the window surface: the frame is defined by the ORDER BY *value*
# (event time), so ties and gaps behave differently from row counting —
# and the rolling-day metric is the canonical feature-engineering shape.
# One shuffle on user_id; the frame scan is per-partition. Value-based
# frames are deterministic under ties by construction (all tied rows share
# a frame), so only the decimal-cast sum is needed for hash parity.

_Q47_ORACLE = """
WITH rolled AS (
  SELECT user_id, event_id, ts,
         COUNT(*) OVER w AS n_24h,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_24h
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, n_24h, round(sum_24h, 4) AS sum_24h
FROM rolled
WHERE user_id < 16
ORDER BY user_id, event_id
"""


@register("q47_range_frame_rolling", oracle=_Q47_ORACLE)
def q47_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # parameterized spark.sql (thread-safe: no session-global view names)
    return spark.sql(
        """
WITH rolled AS (
  SELECT user_id, event_id, ts,
         COUNT(*) OVER w AS n_24h,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_24h
  FROM {events}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, n_24h, round(sum_24h, 4) AS sum_24h
FROM rolled
WHERE user_id < 16
ORDER BY user_id, event_id
""",
        events=ev,
    )


# --------------------------------------------------------------------------
# q48: LATERAL correlated subquery — top-N per group without a window
# --------------------------------------------------------------------------
# The SQL-standard lateral join (Spark 4 LATERAL; Catalyst decorrelates to
# a ranked join, so there is no per-row re-execution at scale). Per-nation
# top-2 customers by balance — ties broken by name, both engines.

_Q48_ORACLE = """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n,
     LATERAL (SELECT c_name, c_acctbal FROM customer
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name LIMIT 2) c
ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
"""


@register("q48_lateral_topn", oracle=_Q48_ORACLE)
def q48_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM {nation} n,
     LATERAL (SELECT c_name, c_acctbal FROM {customer}
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name LIMIT 2) c
ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
""",
        nation=t(spark, sf_dir, "nation"),
        customer=t(spark, sf_dir, "customer"),
    )


# --------------------------------------------------------------------------
# q49: recursive CTE — calendar spine with per-month rollup
# --------------------------------------------------------------------------
# WITH RECURSIVE landed in Spark 4; the canonical warehouse use is a
# generated spine joined back to facts (months with zero orders must
# appear). The recursion is bounded by the data's date range — a driver-
# side loop is never needed. (The non-recursive sequence() date spine is
# q32; this exercises the recursive-execution path itself.)

_Q49_ORACLE = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
         date_trunc('month', MAX(o_orderdate)) AS hi
  FROM orders
),
months(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months, bounds WHERE m < hi
),
per AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(months.m AS DATE) AS month,
       COALESCE(per.n_orders, 0) AS n_orders,
       COALESCE(per.revenue, 0.0) AS revenue
FROM months LEFT JOIN per ON per.m = months.m
ORDER BY month
"""


@register("q49_recursive_months", oracle=_Q49_ORACLE)
def q49_recursive_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
         date_trunc('month', MAX(o_orderdate)) AS hi
  FROM {orders}
),
months(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months, bounds WHERE m < hi
),
per AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM {orders} GROUP BY 1
)
SELECT CAST(months.m AS DATE) AS month,
       COALESCE(per.n_orders, 0) AS n_orders,
       COALESCE(per.revenue, 0.0) AS revenue
FROM months LEFT JOIN per ON per.m = months.m
ORDER BY month
""",
        orders=t(spark, sf_dir, "orders"),
    )


# --------------------------------------------------------------------------
# q50: FILTER-clause conditional aggregation
# --------------------------------------------------------------------------
# The SQL-standard FILTER (WHERE ...) aggregate modifier — the declarative
# form of q02's CASE-WHEN pivot; Catalyst compiles both to the same
# conditional partial aggregates (one shuffle), but FILTER composes with
# every aggregate (count/sum/avg/min/max) without NULL-placeholder
# gymnastics.

_Q50_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F')
            AS DOUBLE) AS finished_revenue,
       MAX(o_orderdate) FILTER (WHERE o_orderstatus = 'O') AS latest_open
FROM {orders}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q50_ORACLE = _Q50_SQL.format(orders="orders")


@register("q50_filter_aggregates", oracle=_Q50_ORACLE)
def q50_filter_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q50_SQL, orders=t(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# q51: SCD-2 interval builder from an event stream
# --------------------------------------------------------------------------
# Compact an event log into slowly-changing-dimension type-2 history:
# keep only CHANGE points (event_type differs from the previous event),
# then close each version with the next change's timestamp (open-ended =
# current). Two windows over the same (user_id, ts) partitioning — Spark
# reuses the one shuffle for both. Deterministic ordering: (ts, event_id)
# within user; lead() over (valid_from, event_type) so same-instant
# changes close in a fixed order. This is the warehouse "dim from CDC
# stream" pattern (the runner's snapshot materialization is the
# file-plane analog).

_Q51_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM {events}
  WHERE user_id < 16
),
changes AS (
  SELECT user_id, event_type, ts AS valid_from
  FROM ordered WHERE prev_type IS NULL OR event_type <> prev_type
),
versioned AS (
  SELECT user_id, event_type, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, event_type) AS valid_to
  FROM changes
)
SELECT user_id, event_type, valid_from, valid_to,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM versioned
ORDER BY user_id, valid_from, event_type
"""

_Q51_ORACLE = _Q51_SQL.format(events="events")


@register("q51_scd2_intervals", oracle=_Q51_ORACLE)
def q51_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q51_SQL, events=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# q52: bitwise aggregation — presence-bitmap rollup
# --------------------------------------------------------------------------
# The warehouse bitmap trick: OR per-row one-hot words into a fixed-width
# presence bitmap per group (here user_id mod 60 per event_type/day), then
# bit_count approximates distinct presence with a single BIGINT of group
# state — the cheapest mergeable "which slots were seen" sketch, and the
# building block real bitmap indexes (roaring) scale up. All-integer,
# engine-exact; one partial-aggregated shuffle.

_Q52_SQL = """
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       BIT_OR(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT)) AS user_bitmap,
       CAST(BIT_COUNT(BIT_OR(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT))) AS INT) AS slots_seen,
       COUNT(*) AS n_events
FROM {events}
GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
ORDER BY event_type, day
"""

_Q52_ORACLE = _Q52_SQL.format(events="events")


@register("q52_bitmap_rollup", oracle=_Q52_ORACLE)
def q52_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q52_SQL, events=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# q53: ordered event funnel — the classic product-analytics shape the
# reference's warehouse users run constantly: of users who viewed, how
# many then clicked AFTER their first view, and then purchased AFTER that
# first qualifying click. Sequencing is by MIN-timestamp chaining (first
# view -> first later click -> first later purchase), which expresses the
# whole funnel as three co-partitioned groupBys on user_id — each stage's
# relation shrinks, the join key never changes (one shuffle key end to
# end, AQE coalesces the tail), and nothing resembles the quadratic
# self-join a naive "pairs of events" formulation would produce. The
# final 3-row rollup is driver-sized; its lag() window is presentation.
# --------------------------------------------------------------------------
_Q53_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t2
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS step_no, 'view' AS step, (SELECT COUNT(*) FROM v) AS n_users
  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
)
SELECT step_no, step, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users AS DOUBLE)
         / NULLIF(lag(n_users) OVER (ORDER BY step_no), 0) AS conv_from_prev
FROM counts ORDER BY step_no
"""


@register("q53_event_funnel", oracle=_Q53_ORACLE)
def q53_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(no).alias("step_no"), F.lit(name).alias("step"), "n_users"
        )

    counts = (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "click"))
        .unionByName(stage(p, 3, "purchase"))
    )
    prev = F.lag("n_users").over(W.orderBy("step_no"))
    return counts.select(
        "step_no",
        "step",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.when(prev == 0, F.lit(None)).otherwise(prev)
        ).alias("conv_from_prev"),
    ).orderBy("step_no")

