"""Continuous Count-Min sketch maintenance: the streaming twin of t22.

A Count-Min sketch is a MERGEABLE summary — cell-wise addition of two
sketches IS the sketch of the concatenated corpora. That property is the
whole point at 100 TB: word statistics are never recomputed from
scratch; each ingested micro-batch folds its (row, bucket) cell counts
into a persistent sketch table, and any reader can serve heavy-hitter
estimates from the running sum at any time. This module is that loop as
Structured Streaming: ``readStream`` over a landing directory →
``foreachBatch`` → per-batch cell counts → one parquet partition per
micro-batch.

This is the third member of the table-state streaming family:
ingest.py (content-keyed idempotency), stats.py (algebraic partials,
batch_id-partitioned), and now the fixed-geometry sketch — same
state-in-the-table discipline, but unlike stats.py's
|sources|×|langs|-per-batch partials the CMS state is a CONSTANT 3·1024
cells per batch no matter how many distinct words the batch carries,
which is what makes it the right structure when the key domain itself
is unbounded (open vocabulary, URLs, user agents).

Delivery semantics — EXACTLY-once by idempotent overwrite: each batch's
3·1024-cell summary lands at ``sketch_dir/batch=<id>`` with
``mode("overwrite")``. A replayed batch (foreachBatch is at-least-once)
recomputes the identical deterministic cells and overwrites its own
partition — the running sum cannot double-count. This is stronger than
ingest.py's at-least-once-with-idempotent-index contract because a
sketch partition, unlike a document append, is a pure function of the
batch (same files → same cells), so overwrite == no-op on replay.

State lives in the TABLE, not the state store (the ingest.py
discipline): the stream is stateless, so sketch history costs stream
memory nothing; the reader aggregates |cells| × |batches| rows — cells
are fixed (3 × 1024) regardless of corpus size, so even a year of
hourly batches reads ~27M tiny rows, and a compaction (rewrite as one
partition) is a plain batch job on the same schema.

Hash formulas are IMPORTED from t22 (operators/text_ext2.py) so the
streaming sketch can never drift from the batch sketch it must equal —
twin equivalence is tested cell-by-cell and estimate-by-estimate
(tests/test_round7_streaming.py).

Reference parity: the reference has no streaming plane; this extends
SURVEY §2 S26 (Structured Streaming operators) with the mergeable-
summary pattern the batch t22 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators.text_ext2 import _T22_D, _T22_SPARK_H, _T22_TOPK

_DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def batch_cell_counts(docs: DataFrame) -> DataFrame:
    """(i, bucket, cnt): the deterministic Count-Min cells of one batch.

    Identical formulas to t22's sketch build (same tagged-md5 row hashes,
    same d×w geometry) — one map-side explode + one partial-aggregated
    shuffle onto at most d·w = 3072 cells.
    """
    words = docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
    return (
        words.select(
            F.explode(F.expr(f"sequence(0, {_T22_D - 1})")).alias("i"), "word"
        )
        .select("i", F.expr(_T22_SPARK_H.format(i="i", w="word")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def write_batch_cells(docs: DataFrame, sketch_dir: str, batch_id: int) -> None:
    """Idempotently land one batch's cells at ``sketch_dir/batch=<id>``.

    Overwrite of a deterministic summary: replaying the batch rewrites
    byte-equivalent content, so at-least-once replay composes to
    exactly-once sketch totals.
    """
    batch_cell_counts(docs).write.mode("overwrite").parquet(
        f"{sketch_dir}/batch={batch_id}"
    )


def run_sketch_ingest(
    incoming_dir: str,
    sketch_dir: str,
    checkpoint: str,
    spark: SparkSession,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the landing directory into the running sketch (availableNow)."""
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    def _sink(batch_df: DataFrame, bid: int) -> None:
        write_batch_cells(batch_df, sketch_dir, bid)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """(i, bucket, cnt): the running sketch — cell-wise sum of every
    batch partition (the CMS merge)."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def estimate_counts(sketch: DataFrame, words: DataFrame) -> DataFrame:
    """(word, est_n): CMS point estimates for a (small) word relation —
    min over the d row counters, served off the broadcast 3072-cell
    summary exactly as t22's eval stage does.

    LEFT join from the exploded (word, i, bucket) relation, absent cells
    coalesced to 0: a sketch partition only materializes touched cells,
    so an inner join would drop never-seen words entirely and take the
    min over the present subset for partially-seen ones — a CMS must
    answer 0 whenever ANY of a word's d cells is zero."""
    cells = words.select(
        "word", F.explode(F.expr(f"sequence(0, {_T22_D - 1})")).alias("i")
    ).select("word", "i", F.expr(_T22_SPARK_H.format(i="i", w="word")).alias("bucket"))
    return (
        cells.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_n"))
    )


__all__ = [
    "batch_cell_counts",
    "write_batch_cells",
    "run_sketch_ingest",
    "read_sketch",
    "estimate_counts",
    "_T22_TOPK",
]
