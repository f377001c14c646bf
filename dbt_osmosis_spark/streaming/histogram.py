"""Continuous quantile maintenance: the streaming twin of q75's
mergeable histogram.

The fourth member of the table-state streaming family (ingest.py's
content-keyed index, stats.py's algebraic partials, sketch.py's
Count-Min cells): per micro-batch, each (event_type, bin) cell count
lands in an idempotent-overwrite ``batch=<id>`` partition; the reader's
cell-wise sum IS the histogram of everything ingested so far (equi-width
counters merge by addition), and percentile estimates come off the
~|types|·256-row summary exactly as q75's upper-edge rule computes them
— no re-scan of the event history, ever.

One genuine difference from batch q75, stated rather than hidden: a
stream cannot derive bin bounds from the data (later batches would
re-bin earlier ones), so the geometry here is FIXED a priori
([LO, HI) split into 256 bins, with a clamp bin for outliers). Batch
q75 measures per-group bounds in-plan; a production rollout runs one
calibration query (or q75 itself) to pick [LO, HI], then freezes it —
the twin test freezes the same bounds on both sides, so streamed
estimates equal the batch estimates bit-for-bit.

Exactly-once: identical contract to sketch.py — per-batch cells are a
pure function of the batch, so at-least-once replay overwrites a
partition with identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)

BINS = 256
LO = 0.0
HI = 1024.0  # fixed calibrated ceiling; outliers clamp to the top bin


def batch_histogram_cells(events: DataFrame) -> DataFrame:
    """(event_type, bin, cnt): fixed-geometry equi-width cells of one
    batch — map-side arithmetic plus one partial-aggregated shuffle onto
    at most |types|·BINS cells.

    NULL/NaN ``value`` rows are dropped BEFORE binning: floor(NULL) is
    NULL and least/greatest propagate it, so they would otherwise land in
    a NULL bin that sorts first in the cumulative pass and inflates the
    per-type total n — silently skewing every percentile estimate."""
    return (
        events.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_type",
            F.expr(
                f"least({BINS - 1}, greatest(0,"
                f" CAST(floor((value - {LO!r}) * {BINS} / ({HI!r} - {LO!r})) AS BIGINT)))"
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def write_batch_cells(events: DataFrame, hist_dir: str, batch_id: int) -> None:
    batch_histogram_cells(events).write.mode("overwrite").parquet(
        f"{hist_dir}/batch={batch_id}"
    )


def run_histogram_ingest(
    incoming_dir: str,
    hist_dir: str,
    checkpoint: str,
    spark: SparkSession,
    max_files_per_trigger: int = 1,
) -> None:
    stream = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    def _sink(batch_df: DataFrame, bid: int) -> None:
        write_batch_cells(batch_df, hist_dir, bid)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_histogram(spark: SparkSession, hist_dir: str) -> DataFrame:
    """(event_type, bin, cnt): the running histogram — cell-wise merge."""
    return (
        spark.read.parquet(hist_dir)
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def estimate_percentiles(hist: DataFrame, pcts: tuple[int, ...] = (50, 95, 99)) -> DataFrame:
    """(event_type, pct, est_v): q75's upper-edge rule over the merged
    cells — the first bin whose running count reaches ceil(p·n), served
    entirely from the |types|·BINS summary."""
    from pyspark.sql.window import Window as W

    run = (
        W.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("running", F.sum("cnt").over(run))
    totals = hist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    pdf = hist.sparkSession.createDataFrame([(p,) for p in pcts], "pct int")
    return (
        cum.join(F.broadcast(totals), "event_type")
        .crossJoin(F.broadcast(pdf))
        .filter(F.col("running") >= F.expr("(n * pct + 99) DIV 100"))
        .groupBy("event_type", "pct")
        .agg(F.min("bin").alias("est_bin"))
        .selectExpr(
            "event_type",
            "pct",
            f"round({LO!r} + (est_bin + 1) * ({HI!r} - {LO!r}) / {BINS}, 6) AS est_v",
        )
    )
