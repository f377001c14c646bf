"""Multimodal plumbing, part 2: payload shard layout.

m13 packs binary media payloads into byte-budgeted shards — the layout
step between "a corpus of blobs" and "tar/parquet shards a training
loader streams". p20 shards by ROW COUNT (right for token-packed text);
media payloads vary by orders of magnitude, so the shard key must be the
exclusive cumulative BYTE offset: shard_id = floor(bytes_before / S).
That is a global weighted prefix sum — the textbook 100 TB trap if
computed as one ORDER BY over the corpus — so it is decomposed exactly
like p19's global order: per-bucket byte totals (doc_id-range buckets,
whose order matches the global order) become broadcast carry-in offsets
via a window over |buckets| rows only; the within-bucket running sum
runs in parallel per bucket. No corpus-global sort, no single giant
partition, byte-exact shard boundaries.

The report is the shard MANIFEST (id, payload count, bytes, doc-id
span) — what a loader needs to seek, and what an ops dashboard monitors
for shard-balance drift. Payloads are the deterministic fake-media
binary column (multimodal.attach_fake_payloads) — the Spark-side
plumbing (binary column, byte accounting, bucket decomposition) is the
real artifact, per the multimodal stubbing contract.

Reference parity: the reference has no data plane; this extends the
multimodal family (SURVEY §2 S27 plumbing) with the layout operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.multimodal import attach_fake_payloads
from dbt_osmosis_spark.sources.parquet import read_parquet

_M13_SHARD_BYTES = 4096
_M13_BUCKET = 100  # doc_ids per cumsum bucket; bucket order == doc order

_M13_ORACLE = f"""
WITH p AS (
  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
),
c AS (
  SELECT doc_id, nb,
         CAST(COALESCE(SUM(nb) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM p
),
s AS (SELECT doc_id, nb, off // {_M13_SHARD_BYTES} AS shard_id FROM c)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(SUM(nb) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM s GROUP BY shard_id ORDER BY shard_id
"""


def shard_assignments(docs: DataFrame) -> DataFrame:
    """(doc_id, nb, content_md5, shard_id): the byte-budgeted shard key
    for every payload — the m13/m14 shared definition (one cumsum, so
    the manifest and the integrity checksums can never disagree about
    which shard holds a payload)."""
    p = docs.select(
        "doc_id",
        F.octet_length("content").cast("bigint").alias("nb"),
        F.md5("content").alias("content_md5"),
        F.expr(f"doc_id DIV {_M13_BUCKET}").alias("bkt"),
    )
    # carry-in: cumulative bytes of all earlier buckets (|buckets| rows)
    nets = p.groupBy("bkt").agg(F.sum("nb").alias("bytes"))
    carry = F.coalesce(
        F.sum("bytes").over(W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("bigint")
    offsets = nets.select("bkt", carry.alias("carry_in"))
    # within-bucket EXCLUSIVE running sum, in parallel per bucket
    local = (
        W.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    shard = F.expr(f"(carry_in + local_off) DIV {_M13_SHARD_BYTES}")
    return (
        p.withColumn("local_off", F.coalesce(F.sum("nb").over(local), F.lit(0)))
        .join(F.broadcast(offsets), "bkt")
        .select("doc_id", "nb", "content_md5", shard.alias("shard_id"))
    )


@register("m13_payload_shard_packing", oracle=_M13_ORACLE)
def m13_payload_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_fake_payloads(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return (
        shard_assignments(docs)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("nb").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard_id")
    )


# --------------------------------------------------------------------------
# m14: shard integrity manifest — content checksums for incremental verify
# --------------------------------------------------------------------------
# At 100 TB a training-data store is verified SHARD by shard, not byte by
# byte: each shard carries a content checksum derived from its members'
# payload digests in a canonical order, so a reader (or a nightly
# auditor) re-hashes one shard's digest list — kilobytes — instead of
# re-reading terabytes, and a corrupted/missing/reordered payload changes
# exactly one manifest row. Checksum = md5 over the comma-joined member
# md5s in doc_id order — order-canonicalized INSIDE the aggregation, so
# the manifest is identical however the shard's rows were partitioned.
# Shares shard_assignments with m13 (one cumsum definition).

_M14_ORACLE = f"""
WITH p AS (
  SELECT doc_id, octet_length(encode(text)) AS nb, md5(text) AS h
  FROM documents
),
c AS (
  SELECT doc_id, nb, h,
         CAST(COALESCE(SUM(nb) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM p
),
s AS (SELECT doc_id, nb, h, off // {_M13_SHARD_BYTES} AS shard_id FROM c)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       md5(string_agg(h, ',' ORDER BY doc_id)) AS shard_checksum
FROM s GROUP BY shard_id ORDER BY shard_id
"""


@register("m14_shard_integrity_manifest", oracle=_M14_ORACLE)
def m14_shard_integrity_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_fake_payloads(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return (
        shard_assignments(docs)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.md5(
                F.expr(
                    "CAST(array_join(transform(array_sort("
                    "collect_list(struct(doc_id, content_md5))),"
                    " s -> s.content_md5), ',') AS BINARY)"
                )
            ).alias("shard_checksum"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# m15: voice-activity segmentation (energy-threshold islands)
# ---------------------------------------------------------------------------
# The audio-pipeline segmentation staple: frame the signal, threshold
# per-frame energy, and merge consecutive voiced frames into segments —
# the classic energy-gate VAD (Rabiner & Sambur 1975). With ffmpeg
# absent, frames are 64-byte windows of the raw payload (the m07
# contract: same loop, same schema once a real decoder lands); "energy"
# is the frame's sample variance.
#
# Exactness: variance never materializes as a float — a frame is voiced
# iff  N*ss - s*s >= C*N*N  (all BIGINT; N=64, C=890, the corpus
# mid-point), the m07/q84 cross-multiplication move. Segments are
# gaps-and-islands over the voiced frames (frame_no - row_number), the
# q42 identity. Everything is JVM-side higher-order expressions +
# windows: zero Python, zero UDFs.
#
# Scale shape: one pass over payloads (frame fold is whole-stage
# codegen); the islands window partitions by doc_id (balanced — docs are
# bounded); the rollup is doc-sized. No shuffle beyond the per-doc
# window and final rollup on the same key.

_M15_FRAME = 64
_M15_VAR = 890  # voiced iff frame variance >= 890 (corpus mid-point)

_M15_ORACLE = f"""
WITH framed AS (
  SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
         list_sum(list_transform(range(0, {_M15_FRAME}),
             j -> ascii(substr(text, CAST(i * {_M15_FRAME} + j + 1 AS INT), 1)))) AS s,
         list_sum(list_transform(range(0, {_M15_FRAME}),
             j -> ascii(substr(text, CAST(i * {_M15_FRAME} + j + 1 AS INT), 1)) ** 2)) AS ss
  FROM documents, UNNEST(range(0, length(text) // {_M15_FRAME})) AS t(i)
),
voiced AS (
  SELECT doc_id, frame_no,
         frame_no - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_no) AS grp
  FROM framed
  WHERE {_M15_FRAME} * ss - s * s >= {_M15_VAR * _M15_FRAME * _M15_FRAME}
),
seg AS (
  SELECT doc_id, grp, COUNT(*) AS seg_len,
         MIN(frame_no) AS seg_start
  FROM voiced GROUP BY doc_id, grp
),
tot AS (SELECT doc_id, COUNT(*) AS n_frames FROM framed GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_frames AS BIGINT) AS n_frames,
       CAST(COUNT(g.grp) AS BIGINT) AS n_segments,
       CAST(COALESCE(SUM(g.seg_len), 0) AS BIGINT) AS voiced_frames,
       CAST(COALESCE(MAX(g.seg_len), 0) AS BIGINT) AS longest_segment,
       CAST(COALESCE(MIN(g.seg_start), -1) AS BIGINT) AS first_voiced_frame,
       CAST(COALESCE(SUM(g.seg_len), 0) * 10000 // t.n_frames AS BIGINT) AS voiced_bp
FROM tot t LEFT JOIN seg g ON g.doc_id = t.doc_id
GROUP BY t.doc_id, t.n_frames
ORDER BY t.doc_id
"""


@register("m15_vad_segments", oracle=_M15_ORACLE)
def m15_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-gate VAD segmentation: integer variance threshold per
    64-byte frame, gaps-and-islands merge, per-doc segment stats."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    # UTF8String.substring has no random access (it scans from the string
    # start), so per-byte substring() folds are O(len^2) per document —
    # that WAS the sf1 scale probe's entire cost (41.8 s). Splitting the
    # document into a char ARRAY once gives O(1) random access; each
    # frame is then an O(frame) slice+fold. Same integers, same oracle.
    #
    # Round 14 (guide §2.3 "project before the exchange", §1.2): the r13
    # form exploded frame_no FIRST and carried the whole char array into
    # every frame row — O(frames x doclen) bytes materialized per doc by
    # the Generate node — and paid a SECOND corpus-sized fold for the
    # per-doc frame count. Now both (s, ss) fold inside the array domain
    # (one pass, one named-struct accumulator per frame) and the explode
    # emits 3 bigints per frame; n_frames = length(text) DIV frame is a
    # pure length expression (split("") is per-character, so size(ch) ==
    # length(text)) — no second pass over the payload.
    framed = (
        docs.filter(F.length("text") >= _M15_FRAME)
        .select("doc_id", F.split("text", "").alias("ch"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(ch) DIV {_M15_FRAME} - 1), i -> "
                    f"aggregate("
                    f"  transform(slice(ch, CAST(i * {_M15_FRAME} + 1 AS INT),"
                    f"            {_M15_FRAME}), c -> CAST(ascii(c) AS BIGINT)),"
                    f"  named_struct('s', 0L, 'ss', 0L),"
                    f"  (acc, x) -> named_struct('s', acc.s + x,"
                    f"              'ss', acc.ss + x * x)))"
                )
            ).alias("fno", "sss"),
        )
        .select(
            "doc_id",
            F.col("fno").cast("bigint").alias("frame_no"),
            F.col("sss.s").alias("s"),
            F.col("sss.ss").alias("ss"),
        )
    )
    voiced = framed.filter(
        F.lit(_M15_FRAME) * F.col("ss") - F.col("s") * F.col("s")
        >= F.lit(_M15_VAR * _M15_FRAME * _M15_FRAME)
    ).withColumn(
        "grp",
        F.col("frame_no")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("frame_no")),
    )
    seg = voiced.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("seg_len"), F.min("frame_no").alias("seg_start")
    )
    # n_frames is a pure length expression (see comment above) — no
    # second corpus-sized fold just to count frames (round 14, §1.2)
    tot = docs.filter(F.length("text") >= _M15_FRAME).select(
        "doc_id",
        F.expr(f"length(text) DIV {_M15_FRAME}").alias("n_frames"),
    )
    return (
        tot.join(seg, "doc_id", "left")
        .groupBy("doc_id", "n_frames")
        .agg(
            F.count("grp").alias("n_segments"),
            F.coalesce(F.sum("seg_len"), F.lit(0)).alias("voiced_frames"),
            F.coalesce(F.max("seg_len"), F.lit(0)).alias("longest_segment"),
            F.coalesce(F.min("seg_start"), F.lit(-1)).alias("first_voiced_frame"),
        )
        .select(
            "doc_id",
            F.col("n_frames").cast("bigint").alias("n_frames"),
            F.col("n_segments").cast("bigint").alias("n_segments"),
            F.col("voiced_frames").cast("bigint").alias("voiced_frames"),
            F.col("longest_segment").cast("bigint").alias("longest_segment"),
            F.col("first_voiced_frame").cast("bigint").alias("first_voiced_frame"),
            F.expr("CAST(voiced_frames * 10000 DIV n_frames AS BIGINT)").alias(
                "voiced_bp"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m16: loudness normalization — per-payload gain staging
# ---------------------------------------------------------------------------
# The ingest-normalization step before any audio model: compute the gain
# that brings each clip's mean power to the pipeline target (the
# ReplayGain idea, applied per payload). Mean power here is the mean
# frame variance over m15's 64-byte frames:
#     V = SUM_f (N*ss_f - s_f^2) / (N^2 * n_frames)
# and the reported gain is the power ratio to the target in millibels:
#     gain_mb = floor(1000 * log10(T * N^2 * n_frames / SUM_f d_f) + 0.5)
# — the numerator and denominator are exact BIGINTs (one corpus constant
# T = 900, the m15 threshold's neighborhood), so both engines evaluate
# one double division of exact integers and one log10, quantized
# half-up (the t25/s37 move; a clip at target gains 0 mb). Zero-variance
# payloads (silence) have no finite gain and are excluded by both
# engines.
#
# Scale shape: single scan, whole-stage-codegen frame fold (the m07/m15
# idiom — no Python), one per-doc rollup. No joins, no windows.

_M16_FRAME = 64
_M16_TARGET = 900  # target mean frame variance (corpus mid-point band)

_M16_ORACLE = f"""
WITH framed AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, {_M16_FRAME}),
             j -> ascii(substr(text, CAST(i * {_M16_FRAME} + j + 1 AS INT), 1)))) AS s,
         list_sum(list_transform(range(0, {_M16_FRAME}),
             j -> ascii(substr(text, CAST(i * {_M16_FRAME} + j + 1 AS INT), 1)) ** 2)) AS ss
  FROM documents, UNNEST(range(0, length(text) // {_M16_FRAME})) AS t(i)
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM({_M16_FRAME} * ss - s * s) AS BIGINT) AS sum_dev
  FROM framed GROUP BY doc_id
)
SELECT doc_id, n_frames, sum_dev,
       CAST(floor(1000 * log10(
         CAST({_M16_TARGET} * {_M16_FRAME} * {_M16_FRAME} AS DOUBLE) * n_frames
           / sum_dev) + 0.5) AS BIGINT) AS gain_mb
FROM per_doc
WHERE sum_dev > 0
ORDER BY doc_id
"""


@register("m16_gain_staging", oracle=_M16_ORACLE)
def m16_gain_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload loudness-normalization gain in millibels against the
    pipeline target power (module comment); zero Python, one scan."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    # char-array split once per doc + O(1)-access slice per frame — the
    # m15 rationale (substring() has no random access on UTF8String).
    #
    # Round 14 (guide §2.3 "project before the exchange"): the per-frame
    # (s, ss) fold runs inside the array domain, so the explode emits
    # 2-bigint structs per frame instead of copying the whole char array
    # into every frame row (the r13 form's O(frames x doclen) Generate).
    # The per-doc rollup stays a groupBy AGGREGATE deliberately: a first
    # r14 attempt computed sum_dev as one nested array fold in a plain
    # projection and the pushed-down `sum_dev > 0` filter SUBSTITUTED the
    # whole fold into the scan's DataFilters — the corpus-sized fold
    # evaluated twice per doc, measured 0.8 s -> 3.3 s (4x regression,
    # reverted). The aggregate is the optimizer barrier that pins
    # one-evaluation semantics (the §4.4 duplication pattern, expression
    # form), and its exchange carries 3 bigints per doc.
    frame_structs = (
        f"transform(sequence(0, size(ch) DIV {_M16_FRAME} - 1), i -> "
        f"aggregate("
        f"transform(slice(ch, CAST(i * {_M16_FRAME} + 1 AS INT), {_M16_FRAME}),"
        f" c -> CAST(ascii(c) AS BIGINT)),"
        f" named_struct('s', 0L, 'ss', 0L),"
        f" (acc, x) -> named_struct('s', acc.s + x, 'ss', acc.ss + x * x)))"
    )
    framed = (
        docs.filter(F.length("text") >= _M16_FRAME)
        .select("doc_id", F.split("text", "").alias("ch"))
        .select("doc_id", F.explode(F.expr(frame_structs)).alias("f"))
    )
    per_doc = framed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(
            F.lit(_M16_FRAME).cast("bigint") * F.col("f.ss")
            - F.col("f.s") * F.col("f.s")
        )
        .cast("bigint")
        .alias("sum_dev"),
    )
    return (
        per_doc.filter(F.col("sum_dev") > 0)
        .select(
            "doc_id",
            "n_frames",
            "sum_dev",
            F.expr(
                f"CAST(floor(1000 * log10("
                f"CAST({_M16_TARGET} * {_M16_FRAME} * {_M16_FRAME} AS DOUBLE) * n_frames"
                f" / sum_dev) + 0.5) AS BIGINT)"
            ).alias("gain_mb"),
        )
        .orderBy("doc_id")
    )
