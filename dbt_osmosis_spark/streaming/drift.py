"""Continuous drift monitoring: the streaming twin of q85.

q85's CUSUM alarm needs only the per-(event_type, hour) COUNTS — an
algebraic partial that merges across micro-batches by plain addition. So
the maintenance loop is the stats.py shape, not a stateful stream: each
micro-batch reduces to its (event_type, hour, x) partial rows, written
idempotently into a ``batch_id=<n>`` partition; the ALARM query merges
the partials, gap-fills the hour grid, and runs q85's two-window clamp
identity over the merged series. The detector therefore re-evaluates the
WHOLE series each time it is asked — which is what CUSUM requires anyway
(mu and the alarm threshold depend on the full-horizon totals), and the
state it reads is |types| x |hours| rows, not events.

Exactly-once by idempotent overwrite (the stats.py contract): counters
have no content key, so the batch_id partition IS the idempotency key —
a replayed foreachBatch rewrites byte-equivalent partials into its own
directory.

Twin equivalence (tested): draining any file split of the events table
yields a state whose alarm report equals q85's registered result rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.functions.timeutil import epoch_us_sql as _eus
from dbt_osmosis_spark.operators.relational_ext5 import _Q85_THRESH_NUM

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def batch_hour_counts(events: DataFrame) -> DataFrame:
    """(event_type, h, x): one micro-batch's hourly partial counts —
    the same hour bucketing as q85 (NTZ-agnostic epoch micros)."""
    return (
        events.selectExpr("event_type", f"{_eus('ts')} DIV 3600000000 AS h")
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def write_batch_counts(events: DataFrame, state_dir: str, batch_id: int) -> None:
    batch_hour_counts(events).write.mode("overwrite").parquet(
        f"{state_dir}/batch_id={batch_id}"
    )


def run_drift_maintenance(
    incoming_dir: str,
    state_dir: str,
    checkpoint: str,
    spark: SparkSession,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the landing directory into the hourly-count state (availableNow)."""
    stream = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    def _sink(batch_df: DataFrame, bid: int) -> None:
        write_batch_counts(batch_df, state_dir, bid)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drift_alarms(spark: SparkSession, state_dir: str) -> DataFrame:
    """q85's alarm rows computed from the merged state: merge partials,
    gap-fill the hour grid, clamp-scan via the two-window identity."""
    cnt = (
        spark.read.parquet(state_dir)
        .groupBy("event_type", "h")
        .agg(F.sum("x").alias("x"))
    )
    grid = (
        cnt.groupBy("event_type")
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
    p = d.select("event_type", "h", "x", "t_all", F.sum("dd").over(wp).alias("pp"))
    c = p.select(
        "event_type",
        "h",
        "x",
        "t_all",
        (F.col("pp") - F.least(F.lit(0).cast("bigint"), F.min("pp").over(wp))).alias(
            "cus"
        ),
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


__all__ = [
    "batch_hour_counts",
    "drift_alarms",
    "run_drift_maintenance",
    "write_batch_counts",
]
