"""Relational operator surface (SURVEY §2A) as Spark-first query builders.

The reference compiles SQL and ships it to a warehouse
(reference: src/dbt_osmosis/core/sql_operations.py:60-71); the operators its
compiled corpus contains (S1-S25 in SURVEY §2A) are implemented here natively
on Spark via the DataFrame API (Catalyst plans them: predicate pushdown,
column pruning, broadcast joins, AQE). Every query has a DuckDB oracle with
identical column aliases; float aggregates use the decimal-cast convention
from ``functions.numeric`` so hashes match bit-for-bit at any parallelism.

Scale notes (designed for 100 TB, tested at sf<=0.1):
- dimension tables (region/nation) are explicitly broadcast — no shuffle of
  the fact side on those joins at any scale;
- fact-fact joins (orders ⋈ lineitem, customer ⋈ orders) shuffle on their
  join key only after per-side filters/partial aggs cut the volume;
- aggregations are expressed so Spark performs map-side partial aggregation
  (plain groupBy().agg() — no distinct-on-fact unless semantically needed);
- top-k uses orderBy+limit which Spark executes as per-partition top-k +
  single small merge (TakeOrderedAndProject), never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.functions.numeric import dec_sum, exact_avg
from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# q01: TPC-H Q1-style pricing summary — scan+filter+groupBy agg (S4/S8/S10/S22)
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # spread() after filter+projection: a one-row-group parquet scans as a
    # single task, serializing the (decimal-heavy) partial agg. The
    # round-robin exchange of the 6 surviving columns costs far less than
    # the 32x agg parallelism it unlocks (measured ~1.9x on this query);
    # at real scale multi-row-group files already split and spread is a
    # no-op. Decimal sums are order-independent, so parity is unaffected.
    pre = spread(
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        ).select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, scale=6).alias("sum_disc_price"),
            dec_sum(charge, scale=6).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q02: conditional-aggregation pivot (S9) — the reference's orders.sql Jinja
# loop emits sum(case when payment_method=X ...) per method
# (reference: demo_duckdb/models/orders.sql:19-24); analog over o_orderpriority.
# --------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = {p: p.split("-", 1)[1].lower().replace(" ", "_") + "_revenue" for p in _PRIORITIES}

@register(
    "q02_conditional_pivot",
    oracle="""
SELECT o_orderstatus,
  """
    + ",\n  ".join(
        f"CAST(SUM(CAST(CASE WHEN o_orderpriority = '{p}' THEN o_totalprice ELSE 0 END AS DECIMAL(28,2))) AS DOUBLE) AS {a}"
        for p, a in _PRIO_ALIAS.items()
    )
    + """,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def q02_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    aggs = [
        dec_sum(
            F.when(F.col("o_orderpriority") == p, F.col("o_totalprice")).otherwise(F.lit(0))
        ).alias(a)
        for p, a in _PRIO_ALIAS.items()
    ]
    return (
        o.groupBy("o_orderstatus")
        .agg(*aggs, dec_sum("o_totalprice").alias("total_revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# q03: customer lifetime value — the jaffle_shop `customers` mart re-expressed
# (reference: demo_duckdb/models/customers.sql:19-67 — CTEs, grouped agg,
# LEFT JOIN chain, casts). Exercises S2,S4-S7,S10-S14.
# Scale: orders pre-aggregated to one row per customer BEFORE the join (cuts
# the shuffled volume to |customers|); join key = c_custkey.
# --------------------------------------------------------------------------
@register(
    "q03_customer_ltv",
    oracle="""
WITH customer_orders AS (
  SELECT o_custkey,
         MIN(o_orderdate) AS first_order,
         MAX(o_orderdate) AS most_recent_order,
         COUNT(*) AS number_of_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS customer_lifetime_value
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey AS customer_id,
       CAST(c.c_name AS VARCHAR) AS customer_name,
       c.c_mktsegment AS segment,
       co.first_order, co.most_recent_order,
       COALESCE(co.number_of_orders, 0) AS number_of_orders,
       co.customer_lifetime_value,
       co.customer_lifetime_value / co.number_of_orders AS customer_average_value
FROM customer c
LEFT JOIN customer_orders co ON c.c_custkey = co.o_custkey
ORDER BY customer_id
""",
)
def q03_customer_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    customer_orders = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("most_recent_order"),
        F.count(F.lit(1)).alias("number_of_orders"),
        dec_sum("o_totalprice").alias("customer_lifetime_value"),
    )
    return (
        c.join(customer_orders, c.c_custkey == customer_orders.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").cast("string").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            "first_order",
            "most_recent_order",
            F.coalesce("number_of_orders", F.lit(0)).alias("number_of_orders"),
            "customer_lifetime_value",
            (F.col("customer_lifetime_value") / F.col("number_of_orders")).alias(
                "customer_average_value"
            ),
        )
        .orderBy("customer_id")
    )


# --------------------------------------------------------------------------
# q04: multi-way join chain (S12) — TPC-H Q5-style revenue by nation.
# Scale: region & nation broadcast (tiny dims — no fact shuffle for them);
# customer⋈orders⋈lineitem shuffle on their keys; filters pushed to scans.
# --------------------------------------------------------------------------
@register(
    "q04_revenue_by_nation",
    oracle="""
SELECT n.n_name AS nation,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def q04_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .join(o, F.col("c_custkey") == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


# --------------------------------------------------------------------------
# q05: deterministic top-k (S15/S22) — ORDER BY + LIMIT. Spark plans this as
# TakeOrderedAndProject: per-partition top-k then a single merge of k-sized
# heaps — no global sort even at 10^12 rows.
# --------------------------------------------------------------------------
@register(
    "q05_top_customers",
    oracle="""
SELECT o_custkey AS customer_id,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY revenue DESC, customer_id
LIMIT 10
""",
)
def q05_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(dec_sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("revenue"), "customer_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q06: DISTINCT (S24) — dedup via shuffle on all grouping cols.
# --------------------------------------------------------------------------
@register(
    "q06_distinct_segments",
    oracle="""
SELECT DISTINCT c_mktsegment AS segment, c_nationkey AS nationkey
FROM customer ORDER BY segment, nationkey
""",
)
def q06_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return (
        c.select(F.col("c_mktsegment").alias("segment"), F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .orderBy("segment", "nationkey")
    )


# --------------------------------------------------------------------------
# q07: set operations (S23) — INTERSECT / EXCEPT / UNION over customer-key
# sets, tagged and unioned into one result for hashing.
# --------------------------------------------------------------------------
@register(
    "q07_set_ops",
    oracle="""
WITH urgent AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
     rich   AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
SELECT 'both' AS tag, k FROM (SELECT k FROM urgent INTERSECT SELECT k FROM rich) x
UNION ALL
SELECT 'urgent_only' AS tag, k FROM (SELECT k FROM urgent EXCEPT SELECT k FROM rich) y
ORDER BY tag, k
""",
)
def q07_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k")).distinct()
    both = urgent.intersect(rich).select(F.lit("both").alias("tag"), "k")
    urgent_only = urgent.exceptAll(rich).select(F.lit("urgent_only").alias("tag"), "k")
    return both.unionAll(urgent_only).orderBy("tag", "k")


# --------------------------------------------------------------------------
# q08: subquery-as-relation (S16) — the workbench preview template wraps
# arbitrary SQL in `select * from ({sql}) as _query`
# (reference: src/dbt_osmosis/workbench/components/preview.py:22).
# --------------------------------------------------------------------------
@register(
    "q08_subquery_derived",
    oracle="""
SELECT * FROM (
  SELECT c_nationkey AS nationkey,
         COUNT(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_balance
  FROM customer GROUP BY c_nationkey
) AS _query
WHERE n_customers > 5
ORDER BY nationkey
""",
)
def q08_subquery_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    inner = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum("c_acctbal").alias("total_balance"),
    )
    return inner.alias("_query").filter(F.col("n_customers") > 5).orderBy("nationkey")


# --------------------------------------------------------------------------
# q09: window functions (S25) — rank-per-group + running totals.
# Scale: single shuffle on the partition key; running sum uses the decimal
# convention so the frame accumulation is exact.
# --------------------------------------------------------------------------
@register(
    "q09_window_rank",
    oracle="""
SELECT * FROM (
  SELECT o_custkey AS customer_id, o_orderkey AS order_id,
         CAST(o_totalprice AS DOUBLE) AS totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
  FROM orders
) WHERE rn <= 3
ORDER BY customer_id, rn
""",
)
def q09_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    by_price = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    by_date = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.row_number().over(by_price).alias("rn"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(by_date).cast("double").alias("running_spend"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("customer_id", "rn")
    )


# --------------------------------------------------------------------------
# q10: scalar expressions (S5/S6/S7) — rename, arithmetic, CAST, CASE,
# string functions. Mirrors stg_payments' cents/100 and customers' casts
# (reference: demo_duckdb/models/staging/stg_payments.sql:22-24,
#  demo_duckdb/models/customers.sql:55-58).
# --------------------------------------------------------------------------
@register(
    "q10_expressions",
    oracle="""
SELECT l_orderkey AS order_id, l_linenumber AS line_no,
  CAST(CAST(l_extendedprice / 100 AS DECIMAL(18,4)) AS DOUBLE) AS price_dollars,
  CAST(ROUND(CAST(l_quantity * 2.5 AS DECIMAL(18,4)), 1) AS DOUBLE) AS qty_scaled,
  CASE WHEN l_returnflag = 'R' THEN 'returned'
       WHEN l_linestatus = 'O' THEN 'open' ELSE 'closed' END AS status,
  UPPER(l_returnflag) || '-' || LOWER(l_linestatus) AS flag_concat,
  SUBSTR(CAST(l_orderkey AS VARCHAR), 1, 3) AS key_prefix,
  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY order_id, line_no
""",
)
def q10_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 1000)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_no"),
            (F.col("l_extendedprice") / 100).cast("decimal(18,4)").cast("double").alias("price_dollars"),
            F.round((F.col("l_quantity") * 2.5).cast("decimal(18,4)"), 1).cast("double").alias("qty_scaled"),
            F.when(F.col("l_returnflag") == "R", "returned")
            .when(F.col("l_linestatus") == "O", "open")
            .otherwise("closed")
            .alias("status"),
            F.concat(F.upper("l_returnflag"), F.lit("-"), F.lower("l_linestatus")).alias("flag_concat"),
            F.substring(F.col("l_orderkey").cast("string"), 1, 3).alias("key_prefix"),
            F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        )
        .orderBy("order_id", "line_no")
    )


# --------------------------------------------------------------------------
# q11: semi/anti joins (S11 family) — EXISTS / NOT EXISTS. Spark's left_semi /
# left_anti never materialize the probe side's payload — at scale this is the
# cheapest existence check (and broadcastable when the filter side is small).
# --------------------------------------------------------------------------
@register(
    "q11_semi_anti",
    oracle="""
SELECT c_mktsegment AS segment,
       CASE WHEN has_order THEN 'active' ELSE 'inactive' END AS activity,
       COUNT(*) AS n_customers
FROM (
  SELECT c.c_mktsegment,
         EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
  FROM customer c
)
GROUP BY segment, activity
ORDER BY segment, activity
""",
)
def q11_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    keys = o.select("o_custkey")
    active = c.join(keys, c.c_custkey == keys.o_custkey, "left_semi").withColumn(
        "activity", F.lit("active")
    )
    inactive = c.join(keys, c.c_custkey == keys.o_custkey, "left_anti").withColumn(
        "activity", F.lit("inactive")
    )
    return (
        active.unionAll(inactive)
        .groupBy(F.col("c_mktsegment").alias("segment"), "activity")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment", "activity")
    )


# --------------------------------------------------------------------------
# q12: HAVING + COUNT(DISTINCT) (S10/S24). Spark plans count-distinct as a
# two-phase expand+agg (partial per partition) — no row explosion at scale.
# --------------------------------------------------------------------------
@register(
    "q12_having_countdistinct",
    oracle="""
SELECT c_nationkey AS nationkey,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > 4
ORDER BY nationkey
""",
)
def q12_having_countdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            dec_sum("c_acctbal").alias("total_balance"),
        )
        .filter(F.col("n_customers") > 4)
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# q13: CTE pipelining (S13) — executed through spark.sql, the engine's actual
# execution path for compiled models (M2). Catalyst inlines the CTEs exactly
# as DuckDB does (reference CTE corpus: demo_duckdb/models/customers.sql:1-71).
# --------------------------------------------------------------------------
_Q13_SQL = """
WITH nation_customers AS (
  SELECT n.n_name, c.c_custkey
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
),
order_counts AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT nc.n_name AS nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(COALESCE(oc.n_orders, 0) AS DECIMAL(18,0))) AS BIGINT) AS total_orders
FROM nation_customers nc
LEFT JOIN order_counts oc ON oc.o_custkey = nc.c_custkey
GROUP BY nc.n_name
ORDER BY nation
"""

@register("q13_cte_chain", oracle=_Q13_SQL)
def q13_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrames are passed as named sql() arguments, not session-global temp
    # views — thread-safe under the layer-parallel runner (same pattern as
    # q21). The SQL text only differs from the oracle in the table tokens.
    sql = (
        _Q13_SQL.replace("JOIN customer c", "JOIN {customer} c")
        .replace("FROM orders", "FROM {orders}")
        .replace("FROM nation n", "FROM {nation} n")
    )
    return spark.sql(
        sql,
        nation=t(spark, sf_dir, "nation"),
        customer=t(spark, sf_dir, "customer"),
        orders=t(spark, sf_dir, "orders"),
    )


# --------------------------------------------------------------------------
# q14: JSON extraction + time-bucketed aggregation over the events table.
# Tumbling windows via F.window (the streaming-compatible form); oracle uses
# date_trunc (identical bucket boundaries for 1-hour windows).
# --------------------------------------------------------------------------
@register(
    "q14_events_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DECIMAL(18,0))) AS BIGINT) AS sum_k
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q14_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", scale=6).alias("total_value"),
            F.sum(F.col("k").cast("decimal(18,0)")).cast("bigint").alias("sum_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "sum_k",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# q15: sessionization — gap>30min session boundaries via lag + running sum
# (the batch form; the streaming form lives in streaming/events.py using
# session_window). Deterministic: (ts, event_id) is a unique order.
# --------------------------------------------------------------------------
def session_break_flag(order) -> "F.Column":
    """1 iff this event starts a new 30-min-gap session, 0 otherwise —
    THE sessionization rule, defined once (q15/q55/q66 and the streaming
    twin tests all consume it). Microsecond-exact: the oracles compare
    full-precision intervals and events carry sub-second micros, so a
    whole-second cast would mis-classify gaps inside (1800s, 1801s).
    epoch_us (not unix_micros) so the rule resolves when the driver's
    default-config session reads events.ts as TIMESTAMP_NTZ."""
    from dbt_osmosis_spark.functions.timeutil import epoch_us

    return F.when(
        F.lag("ts").over(order).isNull()
        | (epoch_us("ts") - F.lag(epoch_us("ts")).over(order) > 1_800_000_000),
        1,
    ).otherwise(0)


@register(
    "q15_sessionization",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sessions AS (
  SELECT user_id,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT COUNT(*) AS n_sessions,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(n_events AS DECIMAL(18,0))) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session
""",
)

def q15_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_flag = e.withColumn("is_new_session", session_break_flag(order))
    sessions = with_flag.withColumn("session_id", F.sum("is_new_session").over(run))
    per_session = sessions.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("n_events").cast("decimal(18,0)")).cast("bigint").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


# --------------------------------------------------------------------------
# q16: grouping sets / rollup (S10 extension) — subtotals in one pass.
# --------------------------------------------------------------------------
@register(
    "q16_rollup",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dec_sum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )
