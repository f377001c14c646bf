"""Continuous corpus-statistics maintenance: the streaming twin of p32.

p32 proves the merge contract (algebraic partials at (source, lang) grain
merge to the exact single-scan report); this module runs that contract as
the long-lived loop production actually operates: ``readStream`` over a
landing directory → ``foreachBatch`` → reduce the micro-batch to its
partial-state rows → write them into a per-batch partition of the state
table. The dashboard query (``stats_report``) is a merge over the state
table — it never re-scans a byte of document text.

Scale design (the 100 TB shape):
- State lives in a PARQUET TABLE, not the state store (the streaming/
  ingest.py move): the stream is stateless, so ingest history costs
  stream memory nothing. State size is |sources|x|langs| rows PER BATCH —
  independent of batch row counts.
- Exactly-once state from at-least-once replay: each batch's partials
  land with ``mode("overwrite")`` into its OWN ``batch_id=<n>`` partition
  directory. foreachBatch re-delivers a batch with the SAME batch_id on
  crash replay, so the overwrite is idempotent — no double counting, no
  transactional table required (with Delta/Iceberg the same write is one
  commit). Contrast with the ingest sink, whose idempotency comes from
  content keys; counters have no content key, so the batch_id partition
  IS the idempotency key.
- Unbounded histories: the state table grows one tiny partition per
  batch; ``compact_state`` folds all partitions into one (the same merge
  the report runs) — report-invariant by the p32 contract, tested.

Twin equivalence (tested): draining any file split of the corpus yields a
state table whose report equals p32's registered result (and its oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_osmosis_spark.operators.pipeline_ext2 import merge_stats, partial_stats

# Test-only fault injection (the ingest.py pattern): "state" makes the NEXT
# sink invocation raise after its state write completes, simulating a crash
# before the checkpoint commit — replay must overwrite idempotently.
_CRASH_AFTER: str | None = None


def _maybe_crash(point: str) -> None:
    global _CRASH_AFTER
    if _CRASH_AFTER == point:
        _CRASH_AFTER = None
        raise RuntimeError(f"injected crash after {point} write")


def run_stats_maintenance(
    incoming_dir: str,
    state_dir: str,
    checkpoint: str,
    spark: SparkSession,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the landing directory, maintaining the partial-state table
    (availableNow). Each micro-batch writes its (source, lang) partials
    into ``<state_dir>/batch_id=<id>/`` with overwrite — idempotent under
    at-least-once replay."""
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    def _sink(batch_df: DataFrame, bid: int) -> None:
        partial = partial_stats(batch_df)
        partial.write.mode("overwrite").parquet(f"{state_dir}/batch_id={bid}")
        _maybe_crash("state")

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stats_report(spark: SparkSession, state_dir: str) -> DataFrame:
    """The dashboard query: merge every batch's partials into the
    per-source report. Scans only the state table (|sources|x|langs| rows
    per batch), never the corpus."""
    state = spark.read.option("basePath", state_dir).parquet(state_dir)
    return merge_stats(state.drop("batch_id")).orderBy("source")


def compact_state(spark: SparkSession, state_dir: str, out_dir: str) -> None:
    """Fold all per-batch partitions into a single merged partial table
    (itself valid state: merge is associative). Run periodically so state
    size tracks |sources|x|langs|, not batch count."""
    from pyspark.sql import functions as F

    state = spark.read.option("basePath", state_dir).parquet(state_dir)
    # A compacted table is just the merged grain rows re-materialized as
    # partials — the same algebra partial_stats/merge_stats use.
    grain = (
        state.drop("batch_id")
        .groupBy("source", "lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_chars").alias("sum_chars"),
            F.max("max_chars").alias("max_chars"),
        )
    )
    grain.write.mode("overwrite").parquet(f"{out_dir}/batch_id=compacted")
