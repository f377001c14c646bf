"""Continuous daily-revenue maintenance: the streaming twin of q89.

q89's weekday-aligned YoY needs only the DAILY revenue rollup — an
algebraic partial that merges across micro-batches by plain addition
(the drift.py/stats.py shape). Each lineitem micro-batch joins the
static orders dimension for the order date, reduces to (d, rev_c)
partial rows, and writes them idempotently into a ``batch_id=<n>``
partition; the REPORT query merges the partials into the daily series
and runs q89's lag-364 alignment + monthly rollup over it. The state
the report reads is calendar-sized (one row per order date per batch),
never fact-sized.

Exactly-once by idempotent overwrite (the stats.py contract): revenue
partials have no content key, so the batch_id partition IS the
idempotency key — a replayed foreachBatch rewrites byte-equivalent
partials into its own directory.

Scale notes: the per-batch join against orders is an equi-join on the
order key; at 100 TB the dimension side is bucket-partitioned (the q61
layout lever) so each micro-batch co-locates without reshuffling the
dim. The stream schema declares ONLY the three columns the rollup
needs — parquet column pruning applies to streaming scans too, and it
also sidesteps the fact table's ns-timestamp column entirely.

Twin equivalence (tested): draining any file split of the lineitem
table yields a state whose YoY report equals q89's registered rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LINEITEM_COLS = "l_orderkey bigint, l_extendedprice double, l_discount double"


def batch_daily_revenue(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(d, rev_c): one micro-batch's daily revenue partial — the same
    cents quantization and date grain as q89."""
    li = lineitem.select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
        ).alias("rev_c"),
    )
    od = orders.select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("d")
        .agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    )


def write_batch_daily(
    lineitem: DataFrame, orders: DataFrame, state_dir: str, batch_id: int
) -> None:
    batch_daily_revenue(lineitem, orders).write.mode("overwrite").parquet(
        f"{state_dir}/batch_id={batch_id}"
    )


def run_daily_maintenance(
    incoming_dir: str,
    orders_path: str,
    state_dir: str,
    checkpoint: str,
    spark: SparkSession,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the landing directory into the daily-revenue state
    (availableNow); orders is the static dimension side."""
    from dbt_osmosis_spark.sources.parquet import read_parquet

    orders = read_parquet(spark, orders_path)
    stream = (
        spark.readStream.schema(_LINEITEM_COLS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    def _sink(batch_df: DataFrame, bid: int) -> None:
        write_batch_daily(batch_df, orders, state_dir, bid)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def yoy_report(spark: SparkSession, state_dir: str) -> DataFrame:
    """q89's monthly weekday-aligned YoY rows computed from the merged
    state: merge partials to the daily series, lag-364 self-join,
    monthly rollup — expression-identical to the batch operator."""
    daily = (
        spark.read.parquet(state_dir)
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


__all__ = [
    "batch_daily_revenue",
    "run_daily_maintenance",
    "write_batch_daily",
    "yoy_report",
]
