"""Continuous-ingest dedup: the streaming twin of p16_incremental_dedup.

Production training-data pipelines don't re-dedup the whole corpus per
drop — they ingest document batches continuously and admit only content
that is new against everything already accepted. This module is that loop
as Structured Streaming: ``readStream`` over a landing directory →
``foreachBatch`` → (within-batch first-occurrence dedup) → (anti-join
against the accepted-content fingerprint index) → append kept docs to the
corpus sink AND their hashes to the index, so the next micro-batch
deduplicates against everything before it.

Scale design (the 100 TB shape):
- State lives in the INDEX TABLE, not the state store: the stream itself
  is stateless (no watermark bookkeeping, nothing accumulates per key in
  RocksDB), so arbitrarily long ingest histories cost stream memory
  nothing. The index is (hash) — 16 bytes/doc, ~10^10 rows per PB of
  accepted docs — a parquet/Delta table the anti-join shuffles against.
- The anti-join partial: md5 is computed map-side; the join shuffles
  (batch ∪ index) on the hash. When the index dwarfs every batch,
  ``bloom=True`` puts a broadcast Bloom filter of the index in front of
  the exact anti-join (p12's fixed-K-bit construction): definitely-new
  rows skip the shuffle join map-side, and only Bloom-positives — actual
  duplicates plus the tiny false-positive tail — pay the exact join.
  Same accepted set by construction; the exact join stays for
  correctness.
- Delivery semantics: foreachBatch is at-least-once on replay. Writes
  land docs -> bits -> index: a crash before the index write re-emits
  the batch's docs on replay (the index doesn't know them yet) —
  duplicates land in the SINK but never poison the INDEX twice, and the
  sink stays consumable because admitted content is keyed by content
  hash (consumers re-dedup exactly like d01). Bits precede the index so
  a crash between them leaves only harmless spurious bits — never index
  hashes whose bits are missing, which would be permanent Bloom false
  negatives (tested by the crash-replay fault-injection suite). With a
  transactional table format the appends join one commit and the loop is
  exactly-once; the caller-visible contract here is at-least-once with an
  idempotent index.

Twin equivalence (tested): processing files in doc_id order with
``maxFilesPerTrigger=1`` yields exactly the batch p16 result — sequential
(batch-local window + anti-join) composes to the same first-occurrence
choice the global window makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators.text import spark_bloom_bit_sql


def content_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h, n_chars): the md5 content fingerprint p16/d01 key on."""
    return docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h"), "n_chars"
    )


def _read_parquet_if_present(spark: SparkSession, path: str) -> DataFrame | None:
    """Storage-agnostic existence probe: os.path.exists only answers for
    the driver-local filesystem and would silently disable dedup for an
    HDFS/S3 index URI — let the reader resolve the path instead and treat
    an unresolvable path as an absent (not-yet-seeded) table."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


# Bloom pre-filter sizing: M bits / K hashes bound the false-positive rate
# at ~(n_index*K/M)^K; false positives only cost an extra exact-join probe,
# never a wrong result. At PB-scale indexes you raise M (the broadcast is
# M/8 bytes worst-case, far less as a distinct-bit list until fill-rate
# saturates) or shard the filter by a hash prefix.
_BLOOM_M = 1 << 20
_BLOOM_K = 3

# Test-only fault injection: set to "docs" or "bits" to make the NEXT sink
# invocation raise immediately after that write completes, simulating the
# process dying between the append pair (the at-least-once replay window
# the module docstring documents). One-shot: cleared before raising, so a
# restarted stream replays cleanly. Production never sets this.
_CRASH_AFTER: str | None = None


def _maybe_crash(point: str) -> None:
    global _CRASH_AFTER
    if _CRASH_AFTER == point:
        _CRASH_AFTER = None
        raise RuntimeError(f"injected crash after {point} write")

# the canonical p12 bit derivation, shared so the constructions can't drift
_BIT = spark_bloom_bit_sql("j", "h", _BLOOM_M)


def index_bloom_bits(idx: DataFrame) -> DataFrame:
    """(bit): the distinct set bits of the accepted-hash index — the
    broadcastable membership sketch built in one pass over the index."""
    js = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j")
    return idx.select("h").select("h", js).select(F.expr(_BIT).alias("bit")).distinct()


def dedup_batch_against_index(
    batch: DataFrame,
    spark: SparkSession,
    index_dir: str,
    bloom: bool = False,
    bits: DataFrame | None = None,
) -> DataFrame:
    """One micro-batch step: first-occurrence within the batch (min doc_id
    per hash), then left-anti against the accepted-hash index.

    ``bloom=True`` is the big-index path: a broadcast Bloom filter of the
    index splits the batch map-side into definitely-new rows (no set bit
    missing -> skip the shuffle join entirely) and Bloom-positives, and
    only the positives — duplicates plus the tiny false-positive tail —
    pay the exact anti-join. Same accepted set by construction (Bloom has
    no false negatives: identical bit derivation on both sides), tested
    against the exact path. ``bits`` supplies a pre-maintained sketch
    (run_dedup_ingest appends per-batch bits to a sibling table) so the
    filter is NOT rebuilt from the full index every batch; absent, it is
    derived from the index — the one-off/direct-call path.

    Kept rows carry every batch column plus ``h`` — the sink receives the
    admitted DOCUMENTS, not just their fingerprints."""
    hashed = batch.withColumn("h", F.md5(F.col("text").cast("binary")))
    w = Window.partitionBy("h").orderBy("doc_id")
    fresh = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    idx = _read_parquet_if_present(spark, index_dir)
    if idx is not None:
        idx = idx.select("h")
        if bloom:
            if bits is None:
                bits = index_bloom_bits(idx)
            js = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j")
            probes = fresh.select("doc_id", "h", js).select(
                "doc_id", F.expr(_BIT).alias("bit")
            )
            pos_ids = (
                probes.join(F.broadcast(bits), "bit")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("nb"))
                .filter(F.col("nb") == _BLOOM_K)
                .select("doc_id")
            )
            definite_new = fresh.join(F.broadcast(pos_ids), "doc_id", "left_anti")
            maybe = fresh.join(F.broadcast(pos_ids), "doc_id", "left_semi")
            fresh = definite_new.unionByName(maybe.join(idx, "h", "left_anti"))
        else:
            fresh = fresh.join(idx, "h", "left_anti")
    return fresh


def run_dedup_ingest(
    incoming_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    spark: SparkSession,
    max_files_per_trigger: int = 1,
    bloom: bool = False,
) -> None:
    """Drain the landing directory through the dedup loop (availableNow).

    ``index_dir`` may be pre-seeded with the existing corpus fingerprints
    (one parquet of ``h``) — the bootstrap a migration from batch p16
    does; absent, the first batch seeds it.

    With ``bloom=True`` the sketch is MAINTAINED, not rebuilt: the bit
    table lives beside the index (``<index_dir>_bits``), is bootstrapped
    from the index once, and each batch appends only its kept rows' bits
    — per-batch Bloom cost is O(bit-table scan), never a full index pass.
    """
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    bits_dir = index_dir.rstrip("/") + "_bits"

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        bits = None
        if bloom:
            bits_df = _read_parquet_if_present(spark, bits_dir)
            if bits_df is None:
                idx0 = _read_parquet_if_present(spark, index_dir)
                if idx0 is not None:
                    index_bloom_bits(idx0).write.parquet(bits_dir)
                    bits_df = spark.read.parquet(bits_dir)
            if bits_df is not None:
                # appended per-batch bits may repeat across batches
                bits = bits_df.distinct()
        kept = dedup_batch_against_index(
            batch_df, spark, index_dir, bloom=bloom, bits=bits
        )
        # one job, three writes: materialize once so the anti-join (and its
        # index scan) doesn't run thrice; released before the batch returns
        kept = kept.persist()
        try:
            # Write order is a crash-replay contract: docs → bits → index.
            # Docs first: a crash before the index write re-emits the batch
            # on replay (duplicates in the sink, never a lost admit). Bits
            # BEFORE the index: a crash between them leaves spurious bits
            # (safe — they only cost an exact-join probe on replay), whereas
            # index-first would leave hashes in the index whose bits never
            # land (replay recomputes kept as empty), turning later
            # duplicates of those docs into permanent Bloom false negatives
            # that skip the exact join and get admitted forever.
            kept.write.mode("append").parquet(out_dir)
            _maybe_crash("docs")
            if bloom:
                index_bloom_bits(kept.select("h")).write.mode("append").parquet(bits_dir)
                _maybe_crash("bits")
            kept.select("h").write.mode("append").parquet(index_dir)
        finally:
            kept.unpersist()

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
