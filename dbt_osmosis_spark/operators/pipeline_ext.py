"""Training-pipeline operators, band 2 (p12+): Bloom-filter
decontamination, length-bucketed batch packing, LSH-diverse sampling, and a
deterministic k-means Lloyd step.

Same contract as pipeline.py: every op is a registered query with a DuckDB
oracle built from the SAME deterministic md5 arithmetic, so the driver's
hash harness verifies the algorithm end to end — and every plan is the one
you would run at 100 TB (map-side signatures, broadcast of the small side,
bounded shuffles; no driver-side loops over data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.operators.similarity import (
    ADAPTIVE_SUB_SQL,
    adaptive_xbits_agg_sql,
    _DIM,
    _DUCK_BUCKET,
    _DUCK_CELL,
    _DUCK_CELL_DISTS,
    _DUCK_DOT,
    _DUCK_NORM2,
    _DUCK_SIGNWORD,
    _SPARK_BUCKET,
    _SPARK_CELL,
    _SPARK_CELL_DISTS,
    _SPARK_DOT,
    _SPARK_NORM2,
    _SPARK_SIGNWORD,
)
from dbt_osmosis_spark.operators.text import (
    _DUCK_TOK,
    _duck_shingles,
    spark_bloom_bit_sql,
    spark_shingles_sql,
    tokens,
)
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

# --------------------------------------------------------------------------
# p12: Bloom-filter decontamination
# --------------------------------------------------------------------------
# p04 does exact-set decontamination with a broadcast join on the shingle
# strings themselves. At 100 TB the eval-shingle set may be too big to ship
# as strings; the standard fix is a Bloom filter: K deterministic bit
# positions per shingle over an M-bit space. Membership = all K bits set —
# no false negatives, bounded false positives (the n_exact_hits column
# below measures them). Both engines compute the SAME bits (md5-derived),
# so the oracle verifies the filter itself, not just the outcome. The bit
# set (<= M rows) is the broadcast side; doc shingles never leave the
# executors. Reference analog: none (dbt-osmosis has no data plane); this
# extends the north-star pipeline family like p04.

_P12_M = 1 << 14  # bits in the filter
_P12_K = 3  # hash functions
_P12_EVAL = "src0"  # contamination source (same split as p04)

# bit position j of shingle s: md5int('b<j>#' || s) % M
_SPARK_BIT = spark_bloom_bit_sql("{j}", "{s}", _P12_M)
_DUCK_BIT = (
    "CAST('0x' || substr(md5('b' || CAST({j} AS VARCHAR) || '#' || {s}), 1, 15) AS BIGINT)"
    f" % {_P12_M}"
)

_P12_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {_DUCK_TOK} AS w FROM documents
),
sh AS (
  SELECT doc_id, source, unnest({_duck_shingles(3)}) AS shingle
  FROM tok WHERE len(w) >= 3
),
bloom AS (
  SELECT DISTINCT {_DUCK_BIT.format(j="j", s="shingle")} AS bit
  FROM (SELECT DISTINCT shingle FROM sh WHERE source = '{_P12_EVAL}'),
       (SELECT unnest(range(0, {_P12_K})) AS j)
),
train AS (
  SELECT DISTINCT doc_id, shingle FROM sh WHERE source <> '{_P12_EVAL}'
),
probes AS (
  SELECT t.doc_id, t.shingle, {_DUCK_BIT.format(j="j", s="t.shingle")} AS bit
  FROM train t, (SELECT unnest(range(0, {_P12_K})) AS j)
),
bloom_hits AS (
  SELECT p.doc_id, p.shingle
  FROM probes p JOIN bloom b ON p.bit = b.bit
  GROUP BY p.doc_id, p.shingle
  HAVING COUNT(*) = {_P12_K}
),
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE source = '{_P12_EVAL}'),
exact AS (
  SELECT t.doc_id, COUNT(*) AS n_exact_hits
  FROM train t JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY t.doc_id
)
SELECT bh.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bloom_hits,
       CAST(COALESCE(ANY_VALUE(exact.n_exact_hits), 0) AS BIGINT) AS n_exact_hits
FROM (SELECT doc_id, shingle FROM bloom_hits) bh
LEFT JOIN exact ON bh.doc_id = exact.doc_id
GROUP BY bh.doc_id
ORDER BY bh.doc_id
"""


@register("p12_bloom_decontaminate", oracle=_P12_ORACLE)
def p12_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sh = (
        spread(docs)
        .withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"),
        )
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(_P12_K - 1))).alias("j")
    bit = F.expr(_SPARK_BIT.format(j="j", s="shingle"))
    bloom = (
        sh.filter(F.col("source") == _P12_EVAL)
        .select("shingle")
        .distinct()
        .select("shingle", js)
        .select(bit.alias("bit"))
        .distinct()
    )
    train = (
        sh.filter(F.col("source") != _P12_EVAL).select("doc_id", "shingle").distinct()
    )
    probes = train.select("doc_id", "shingle", js).select(
        "doc_id", "shingle", bit.alias("bit")
    )
    bloom_hits = (
        probes.join(F.broadcast(bloom), "bit")
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == _P12_K)
        .select("doc_id", "shingle")
    )
    eval_sh = sh.filter(F.col("source") == _P12_EVAL).select("shingle").distinct()
    exact_hits = (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact_hits"))
    )
    return (
        bloom_hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bloom_hits"))
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_bloom_hits",
            F.coalesce("n_exact_hits", F.lit(0)).cast("bigint").alias("n_exact_hits"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# p13: length-bucketed batch packing
# --------------------------------------------------------------------------
# Training batches want docs of similar token length (padding waste scales
# with the in-batch max). ntile(B) over (n_tokens, doc_id) gives exact
# equal-size buckets; per-bucket padding waste = sum(bucket_max - len)
# quantifies the win. The global ntile is a single total-sort window —
# fine to the low billions of rows; at 100 TB compute approximate length
# quantile boundaries instead and keep everything downstream (documented
# trade: boundary rounding only).

_P13_B = 8

_P13_ORACLE = f"""
WITH lens AS (
  SELECT doc_id, CAST(len({_DUCK_TOK}) AS BIGINT) AS n_tokens FROM documents
),
bucketed AS (
  SELECT doc_id, n_tokens,
         ntile({_P13_B}) OVER (ORDER BY n_tokens, doc_id) AS bucket
  FROM lens
),
with_max AS (
  SELECT bucket, n_tokens,
         MAX(n_tokens) OVER (PARTITION BY bucket) AS bmax
  FROM bucketed
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(SUM(CAST(bmax - n_tokens AS DECIMAL(18,0))) AS BIGINT) AS padding_waste
FROM with_max
GROUP BY bucket
ORDER BY bucket
"""


@register("p13_length_buckets", oracle=_P13_ORACLE)
def p13_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    lens = docs.select("doc_id", F.size(tokens()).cast("bigint").alias("n_tokens"))
    bucketed = lens.withColumn(
        "bucket", F.ntile(_P13_B).over(W.orderBy("n_tokens", "doc_id"))
    )
    with_max = bucketed.withColumn(
        "bmax", F.max("n_tokens").over(W.partitionBy("bucket"))
    )
    return (
        with_max.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.sum((F.col("bmax") - F.col("n_tokens")).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("padding_waste"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# p14: diversity sampling via LSH buckets
# --------------------------------------------------------------------------
# "Take a diverse subset" at scale: hash every embedding into its
# hyperplane-LSH bucket (reusing s02's planes — map-side, zero shuffle),
# then keep the TOP_N per bucket by a deterministic md5 rank. Coverage of
# the embedding space instead of an iterative MMR scan (which is
# inherently sequential); one small shuffle on the bucket key.

_P14_TOP = 2

_SPARK_RANK = "CAST(conv(substr(md5(cast(concat('p14#', CAST(vec_id AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
_DUCK_RANK = "CAST('0x' || substr(md5('p14#' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"

_P14_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, label,
         {_DUCK_BUCKET} AS bucket,
         {_DUCK_RANK} AS rk
  FROM vecs
),
ranked AS (
  SELECT vec_id, label, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY rk, vec_id) AS rn
  FROM bucketed
)
SELECT bucket, vec_id, label FROM ranked WHERE rn <= {_P14_TOP}
ORDER BY bucket, vec_id
"""


@register("p14_diverse_sample", oracle=_P14_ORACLE)
def p14_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    bucketed = emb.select(
        "vec_id",
        "label",
        F.expr(_SPARK_BUCKET).alias("bucket"),
        F.expr(_SPARK_RANK).alias("rk"),
    )
    w = W.partitionBy("bucket").orderBy("rk", "vec_id")
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _P14_TOP)
        .select("bucket", "vec_id", "label")
        .orderBy("bucket", "vec_id")
    )


# --------------------------------------------------------------------------
# p15: one k-means Lloyd step from deterministic centroids
# --------------------------------------------------------------------------
# Assignment reuses s05's md5-derived IVF centroids (same constants, same
# first-match argmin tie-break); the update step recomputes each centroid
# as the exact decimal-mean of its members. Entirely map-side assignment +
# one shuffle on the (tiny) cell key; each further Lloyd iteration is the
# same plan with the new centroids broadcast — the canonical distributed
# k-means. Output: per cell, member count, the first COMPONENTS centroid
# coordinates (rounded), and mean distance-to-centroid as inertia.

_P15_COMPONENTS = 4

_P15_MEANS_DUCK = ",\n       ".join(
    f"round(CAST(SUM(CAST(v[{i + 1}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9) AS c{i}"
    for i in range(_P15_COMPONENTS)
)

_P15_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
assigned AS (
  SELECT vec_id, v, {_DUCK_CELL.format(a="v")} AS cell,
         list_min({_DUCK_CELL_DISTS.format(a="v")}) AS d2
  FROM vecs
)
SELECT cell,
       COUNT(*) AS n,
       {_P15_MEANS_DUCK},
       round(CAST(SUM(CAST(sqrt(d2) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9)
         AS mean_dist
FROM assigned
GROUP BY cell
ORDER BY cell
"""


@register("p15_kmeans_lloyd", oracle=_P15_ORACLE)
def p15_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    assigned = emb.select(
        "vec_id",
        "v",
        F.expr(_SPARK_CELL.format(a="v")).alias("cell"),
        F.expr(f"array_min({_SPARK_CELL_DISTS.format(a='v')})").alias("d2"),
    )
    mean_cols = [
        F.round(
            F.sum(F.element_at("v", i + 1).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias(f"c{i}")
        for i in range(_P15_COMPONENTS)
    ]
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *mean_cols,
            F.round(
                F.sum(F.sqrt("d2").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_dist"),
        )
        .orderBy("cell")
    )


# --------------------------------------------------------------------------
# p16: incremental dedup against an existing corpus
# --------------------------------------------------------------------------
# Production dedup is rarely one-shot: a new crawl batch must dedup against
# BOTH the already-ingested corpus (its fingerprint table) and itself.
# The scale shape: the corpus side is fingerprints only (16-byte hashes,
# not documents); the incoming batch anti-joins it on the hash, then
# first-occurrence-wins within the batch. One shuffle on the hash for the
# join + one for the window — never touches corpus text. Here the
# "existing corpus" is the deterministic doc_id % 5 == 0 slice.

_P16_ORACLE = """
WITH corpus AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 = 0
),
incoming AS (
  SELECT doc_id, md5(text) AS h, n_chars FROM documents WHERE doc_id % 5 <> 0
),
fresh AS (
  SELECT i.doc_id, i.h, i.n_chars
  FROM incoming i LEFT JOIN corpus c ON i.h = c.h
  WHERE c.h IS NULL
),
ranked AS (
  SELECT doc_id, h, n_chars,
         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM fresh
)
SELECT doc_id, h AS content_hash, n_chars
FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


@register("p16_incremental_dedup", oracle=_P16_ORACLE)
def p16_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    h = F.md5(F.col("text").cast("binary"))
    corpus = (
        docs.filter(F.col("doc_id") % 5 == 0).select(h.alias("h")).distinct()
    )
    incoming = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", h.alias("h"), "n_chars"
    )
    fresh = incoming.join(corpus, "h", "left_anti")
    w = W.partitionBy("h").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("h").alias("content_hash"), "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# p17: corpus report — the dataset-card summary per (source, lang)
# --------------------------------------------------------------------------
# Every training-data release ships a per-slice summary: doc counts, token
# totals, size stats, exact-duplicate rate. One map-side tokenize pass +
# one partial-aggregated groupBy on a low-cardinality key — the cheapest
# possible full-corpus statement, and at 100 TB it is exactly the job you
# run first to size everything else. count(DISTINCT md5) plans as a
# two-stage partial distinct (hash is computed map-side); all outputs are
# exact integers plus single int/int IEEE divisions (engine-bit-exact).

_P17_ORACLE = """
WITH d AS (
  SELECT source, lang, n_chars,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
         md5(text) AS h
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       COUNT(DISTINCT h) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dups
FROM d
GROUP BY source, lang
ORDER BY source, lang
"""


@register("p17_corpus_report", oracle=_P17_ORACLE)
def p17_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(tokens()).cast("bigint").alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.countDistinct("h").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("h")).cast("bigint").alias("n_exact_dups"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# p18: end-to-end training-corpus preparation (the composed pipeline)
# --------------------------------------------------------------------------
# The operators above are stages; this is the pipeline a data team actually
# ships: quality gate → exact dedup → eval-set decontamination → per-source
# domain cap, in one statement. Each stage keeps its scale shape from the
# standalone op (map-side feature flags; one shuffle per dedup window;
# broadcast eval shingles; one window per source cap), and Catalyst fuses
# the chain — the quality filter prunes before anything shuffles, the
# dedup window and the cap window are the only wide stages over surviving
# docs. Thresholds are corpus-adapted here (the testdata docs are 10-110
# words); a production run passes its own.

_P18_WC_LO = 10
_P18_MIN_STOP = 1
_P18_EVAL_SOURCE = "src0"
_P18_CONTAM = 0.5
_P18_CAP = 20

_P18_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, text, source, lang, n_chars, {_DUCK_TOK} AS w FROM documents
),
quality AS (
  SELECT * FROM tok
  WHERE len(w) >= {_P18_WC_LO}
    AND CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w) BETWEEN 3 AND 10
    AND CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(w) > 0.8
    AND len(list_filter(w, x -> list_contains(['the', 'a'], x))) >= {_P18_MIN_STOP}
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
),
sh AS (
  SELECT doc_id, source, unnest({_duck_shingles(3)}) AS shingle
  FROM deduped WHERE len(w) >= 3
),
eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE source = '{_P18_EVAL_SOURCE}'
),
train_sh AS (
  SELECT doc_id, shingle FROM sh WHERE source <> '{_P18_EVAL_SOURCE}'
),
contaminated AS (
  SELECT t.doc_id
  FROM train_sh t JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY t.doc_id
  HAVING CAST(COUNT(*) AS DOUBLE)
         / (SELECT COUNT(*) FROM train_sh s WHERE s.doc_id = t.doc_id) >= {_P18_CONTAM}
),
clean AS (
  SELECT d.* FROM deduped d
  WHERE d.source <> '{_P18_EVAL_SOURCE}'
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
capped AS (
  SELECT doc_id, source, lang, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM clean
)
SELECT doc_id, source, lang, n_chars FROM capped
WHERE rk <= {_P18_CAP}
ORDER BY doc_id
"""


@register("p18_training_corpus", oracle=_P18_ORACLE)
def p18_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.pipeline import cap_per_source
    from dbt_osmosis_spark.operators.text_ext import gopher_features

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    quality = gopher_features(docs).filter(
        (F.col("n_words") >= _P18_WC_LO)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("frac_alpha") > 0.8)
        & (F.col("n_stopwords") >= _P18_MIN_STOP)
    )
    rn = F.row_number().over(
        W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    )
    deduped = quality.withColumn("rn", rn).filter(F.col("rn") == 1)
    sh = (
        deduped.withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"),
        )
        .transform(keep_cached)
    )
    eval_sh = (
        sh.filter(F.col("source") == _P18_EVAL_SOURCE).select("shingle").distinct()
    )
    train_sh = sh.filter(F.col("source") != _P18_EVAL_SOURCE).select("doc_id", "shingle")
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contaminated = (
        hits.join(sizes, "doc_id")
        .filter(F.col("n_hit").cast("double") / F.col("n_shingles") >= _P18_CONTAM)
        .select("doc_id")
    )
    clean = deduped.filter(F.col("source") != _P18_EVAL_SOURCE).join(
        contaminated, "doc_id", "left_anti"
    )
    return (
        cap_per_source(clean, _P18_CAP)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# p19: deterministic global ordering WITHOUT a global sort
# --------------------------------------------------------------------------
# Trainers need a stable global enumeration of the corpus (shard assembly,
# curriculum order, resumable iteration). A naive row_number() OVER
# (ORDER BY ...) collapses the whole corpus into one partition — the
# classic 100 TB killer. The scale pattern: rank WITHIN buckets in
# parallel (one window per bucket partition), aggregate per-bucket counts
# (tiny), turn them into cumulative offsets on the tiny frame only, and
# broadcast the offsets back: global_pos = bucket_offset + local_rank.
# The only single-partition work is the |buckets|-row offset window. The
# order key is md5-deterministic, so the enumeration is stable across
# runs, partitionings, and engines.

_P19_ORACLE = """
SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY lang, md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
            AS BIGINT) AS global_pos
FROM documents
ORDER BY doc_id
"""


def global_order(docs: DataFrame, bucket_col: str = "lang") -> DataFrame:
    """Add a deterministic ``global_pos`` column without a global sort:
    per-bucket ranks in parallel + broadcast cumulative bucket offsets.
    Every input column rides through, so downstream consumers (p20's
    shard manifest) never re-scan or re-join the corpus for attributes
    the enumeration already had in hand."""
    mk = F.md5(F.col("doc_id").cast("string"))
    rk = F.row_number().over(W.partitionBy(bucket_col).orderBy(mk, "doc_id"))
    ranked = docs.withColumn("_local_rank", (rk - 1).cast("bigint"))
    counts = docs.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n"))
    # |buckets| rows: the single-partition window is bounded by bucket
    # cardinality, never by corpus size
    off = F.coalesce(
        F.sum("n").over(W.orderBy(bucket_col).rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("bigint")
    offsets = counts.select(bucket_col, off.alias("_bucket_off"))
    return (
        ranked.join(F.broadcast(offsets), bucket_col)
        .withColumn("global_pos", F.col("_bucket_off") + F.col("_local_rank"))
        .drop("_local_rank", "_bucket_off")
    )


@register("p19_global_order", oracle=_P19_ORACLE)
def p19_global_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return global_order(docs).select("doc_id", "lang", "global_pos").orderBy("doc_id")


# --------------------------------------------------------------------------
# p20: shard assembly — fixed-size shards + per-shard manifest
# --------------------------------------------------------------------------
# The write-side end of the pipeline: deterministic global position (p19's
# bucket-offset enumeration) → shard_id = pos // SHARD_SIZE → one manifest
# row per shard (counts, position range, byte totals). In production the
# next line is df.repartitionByRange('shard_id').write.partitionBy(
# 'shard_id') — every shard lands as one contiguous file set and the
# manifest is the training loader's index. The manifest agg is one
# partial-aggregated shuffle on shard_id.

_P20_SHARD = 64

_P20_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY lang, md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS p
  FROM documents
)
SELECT CAST(p // {_P20_SHARD} AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       MIN(p) AS first_pos,
       MAX(p) AS last_pos,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM pos
GROUP BY 1
ORDER BY shard_id
"""


@register("p20_pack_shards", oracle=_P20_ORACLE)
def p20_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    # n_chars rides through the enumeration — one corpus scan, no re-join
    pos = global_order(docs).select("doc_id", "n_chars", "global_pos")
    return (
        pos.withColumn("shard_id", F.expr(f"global_pos DIV {_P20_SHARD}"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("global_pos").alias("first_pos"),
            F.max("global_pos").alias("last_pos"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard_id")
    )


# --------------------------------------------------------------------------
# p21: deterministic train/val/test split
# --------------------------------------------------------------------------
# The md5-threshold idea of p01 applied to DISJOINT labeled splits: a doc's
# assignment depends only on its id, so splits are stable across runs,
# engines, partitionings, and incremental re-ingests — a doc can never
# migrate between train and test when the corpus grows (the leakage mode
# df.randomSplit has). Pure map-side; zero shuffle.

_P21_TRAIN, _P21_VAL = 80, 90  # <80 train, <90 val, else test (of %100)

_P21_BUCKET_DUCK = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"
)
_P21_BUCKET_SPARK = (
    "CAST(conv(substr(md5(cast(CAST(doc_id AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 100"
)

_P21_ORACLE = f"""
SELECT doc_id, lang, source,
       CASE WHEN {_P21_BUCKET_DUCK} < {_P21_TRAIN} THEN 'train'
            WHEN {_P21_BUCKET_DUCK} < {_P21_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


@register("p21_train_val_split", oracle=_P21_ORACLE)
def p21_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    bucket = F.expr(_P21_BUCKET_SPARK)
    split = (
        F.when(bucket < _P21_TRAIN, "train")
        .when(bucket < _P21_VAL, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", "source", split.alias("split")).orderBy("doc_id")


# --------------------------------------------------------------------------
# d11: incremental NEAR-dup join — new batch vs ingested corpus
# --------------------------------------------------------------------------
# p16 is the exact-hash version of incremental dedup; this is its
# near-dup sibling: the incoming batch's MinHash bands join the CORPUS
# band index (persisted at ingest in production — 8 band keys of 16 bytes
# per doc, never the documents), candidates verify with exact Jaccard.
# Asymmetric by construction: only batch×corpus pairs, never
# batch×batch (d03/d09 handle within-batch), and the corpus side ships
# fingerprints only. One shuffle on the band key + the bounded verify
# join.

from dbt_osmosis_spark.operators.dedup import (  # noqa: E402
    _JACCARD_THRESHOLD,
    duck_lsh_side_ctes,
    lsh_bands,
    minhash_signatures,
)

_D11_ORACLE = f"""
WITH {duck_lsh_side_ctes("corp", "doc_id % 5 = 0")},
{duck_lsh_side_ctes("batch", "doc_id % 5 <> 0")},
cand AS (
  SELECT DISTINCT b.doc_id AS batch_doc, c.doc_id AS corpus_doc
  FROM batch_bands b JOIN corp_bands c
    ON b.band = c.band AND b.band_key = c.band_key
),
verified AS (
  SELECT cd.batch_doc, cd.corpus_doc,
         CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
           / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
  FROM cand cd
  JOIN batch x ON x.doc_id = cd.batch_doc
  JOIN corp y ON y.doc_id = cd.corpus_doc
)
SELECT batch_doc, corpus_doc, jaccard
FROM verified
WHERE jaccard >= {_JACCARD_THRESHOLD}
ORDER BY batch_doc, corpus_doc
"""


@register("d11_incremental_neardup", oracle=_D11_ORACLE)
def d11_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig_c = minhash_signatures(docs.filter(F.col("doc_id") % 5 == 0)).transform(keep_cached)
    sig_b = minhash_signatures(docs.filter(F.col("doc_id") % 5 != 0)).transform(keep_cached)
    cand = (
        lsh_bands(sig_b)
        .alias("b")
        .join(
            lsh_bands(sig_c).alias("c"),
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.band_key") == F.col("c.band_key")),
        )
        .select(
            F.col("b.doc_id").alias("batch_doc"), F.col("c.doc_id").alias("corpus_doc")
        )
        .distinct()
    )
    x = sig_b.select(F.col("doc_id").alias("xid"), F.col("s").alias("xs"))
    y = sig_c.select(F.col("doc_id").alias("yid"), F.col("s").alias("ys"))
    inter = F.size(F.array_intersect(F.col("xs"), F.col("ys")))
    jac = inter.cast("double") / (F.size("xs") + F.size("ys") - inter)
    return (
        cand.join(x, F.col("batch_doc") == F.col("xid"))
        .join(y, F.col("corpus_doc") == F.col("yid"))
        .select("batch_doc", "corpus_doc", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .orderBy("batch_doc", "corpus_doc")
    )


# --------------------------------------------------------------------------
# p22: overlapping chunk windows (RAG / context-window splitting)
# --------------------------------------------------------------------------
# Split each document into token windows of N with stride S (50% overlap)
# — the retrieval-corpus / long-context preprocessing staple. Pure
# map-side: the window starts come from an in-plan sequence, slices are
# higher-order array ops, no shuffle at all. Runt TAILS shorter than
# _P22_MIN tokens are dropped (they duplicate the previous window's
# suffix) — but a document's FIRST window always survives, however short
# the document: a sub-minimum doc has no previous window covering it and
# must not vanish from the chunked corpus.

_P22_N, _P22_S, _P22_MIN = 64, 32, 8

_P22_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
chunks AS (
  SELECT doc_id, CAST(k AS INT) AS chunk_id,
         list_slice(w, k * {_P22_S} + 1, k * {_P22_S} + {_P22_N}) AS c
  FROM tok, UNNEST(range(0, (len(w) + {_P22_S} - 1) // {_P22_S})) AS t(k)
  WHERE k * {_P22_S} < len(w)
)
SELECT doc_id, chunk_id,
       CAST(len(c) AS INT) AS n_tokens,
       array_to_string(c, ' ') AS chunk_text
FROM chunks
WHERE len(c) >= {_P22_MIN} OR chunk_id = 0
ORDER BY doc_id, chunk_id
"""


@register("p22_chunk_windows", oracle=_P22_ORACLE)
def p22_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    tok = docs.select("doc_id", tokens().alias("w"))
    chunks = tok.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0, CAST(ceil(size(w) / {_P22_S}) AS INT) - 1)")
        ).alias("k"),
        "w",
    ).filter(F.col("k") * _P22_S < F.size("w"))
    c = F.expr(f"slice(w, k * {_P22_S} + 1, {_P22_N})")
    return (
        chunks.select(
            "doc_id",
            F.col("k").cast("int").alias("chunk_id"),
            F.size(c).cast("int").alias("n_tokens"),
            F.array_join(c, " ").alias("chunk_text"),
        )
        .filter((F.col("n_tokens") >= _P22_MIN) | (F.col("chunk_id") == 0))
        .orderBy("doc_id", "chunk_id")
    )


# --------------------------------------------------------------------------
# p23: epoch oversampling — integer repetition toward source balance
# --------------------------------------------------------------------------
# The other half of mixture control next to p11's capping: small sources
# get repeated whole epochs (the "2 epochs of Wikipedia" pattern) so no
# slice is drowned out. epochs_s = clamp(ceil(Nmax / Ns), 1, 4) in exact
# integer arithmetic; the repetition is an in-plan explode(sequence) —
# rows multiply inside the executors, nothing is re-scanned, and the
# factor is data-derived from one tiny aggregate (broadcast).

_P23_MAX_EPOCHS = 4

_P23_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS ns FROM documents GROUP BY source
),
factors AS (
  SELECT source, ns,
         least((((SELECT MAX(ns) FROM counts) + ns - 1) // ns), {_P23_MAX_EPOCHS}) AS epochs
  FROM counts
)
SELECT d.doc_id, d.source, CAST(t.copy_no AS INT) AS copy_no, CAST(f.epochs AS INT) AS epochs
FROM documents d
JOIN factors f ON d.source = f.source,
UNNEST(range(1, f.epochs + 1)) AS t(copy_no)
ORDER BY d.doc_id, copy_no
"""


@register("p23_epoch_oversample", oracle=_P23_ORACLE)
def p23_epoch_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    nmax = counts.agg(F.max("ns").alias("nmax"))
    factors = counts.crossJoin(F.broadcast(nmax)).select(
        "source",
        F.least(
            F.expr("(nmax + ns - 1) DIV ns"), F.lit(_P23_MAX_EPOCHS).cast("bigint")
        ).alias("epochs"),
    )
    return (
        docs.join(F.broadcast(factors), "source")
        .select(
            "doc_id",
            "source",
            F.explode(F.expr("sequence(1, CAST(epochs AS INT))")).alias("copy_no"),
            F.col("epochs").cast("int").alias("epochs"),
        )
        .withColumn("copy_no", F.col("copy_no").cast("int"))
        .orderBy("doc_id", "copy_no")
    )


# --------------------------------------------------------------------------
# d13: semantic dedup — cluster embeddings, prune near-dups within clusters
# --------------------------------------------------------------------------
# The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-means the
# embedding space, then compute pairwise cosines ONLY within each cluster
# and drop one member of every pair above the threshold — the member
# CLOSEST to its centroid (the most "typical", hence most redundant, per
# the paper's keep-low-centroid-similarity finding). Clustering bounds the
# candidate set exactly like LSH does for d05, but with semantically
# meaningful buckets: at 100 TB you raise the cluster count (the paper uses
# ~100k) so per-cell membership stays ~constant and the within-cell verify
# never goes quadratic in the corpus. The registered plan applies that
# lever IN-PLAN: the cluster key is (IVF cell × 4-plane sign bucket) —
# s05's 16 coarse centroids refined by s02/d05's hyperplane hash, 256
# effective clusters from the same deterministic constants. Measured at
# sf0.1 the refinement cuts the verify from 15.4 s (16 cells, ~3M pairs,
# the quadratic wall) to ~2 s; the pairs it forgoes — split across sign
# buckets — are exactly the trade the paper makes by raising k. Plan
# shape: map-side cluster assignment (broadcast constants), one shuffle
# on the cluster key for the self-join, then two tiny pair-derived joins
# back onto the corpus.
#
# Determinism: cells + distances reuse s05/p15's md5-derived centroids and
# identical left-to-right folds in both engines, so the pair set and the
# per-pair victim choice (smaller distance-to-centroid loses; exact-tie →
# the larger vec_id) are engine-exact with NO rounding. Unlike the paper's
# sequential keep-first sweep, the victim rule is per-pair and order-free —
# a chain a~b~c may drop both b and c — which is what makes it expressible
# as one declarative plan on both engines.
#
# Reference analog: none (dbt-osmosis has no data plane); north-star dedup
# family, the embedding sibling of d06/d09's graph-based removal.

_D13_THRESHOLD = 0.4  # same corpus calibration as d05 (max off-diag ~0.51)

# Adaptive cluster-key width (the IVF nlist-grows-with-N rule, in-plan):
# with a FIXED (16 cells x 2^4 sign planes) key, within-cluster candidate
# pairs grow as N^2/512 — measured 22x wall-clock at a 10x corpus (r5 sf1
# probe). The fix real IVF systems use is nlist ∝ N; here the cluster key
# gains ceil(log2(N / _D13_REF_N)) extra partitioning bits taken from the
# already-packed coordinate-sign word w0 (isotropic bits, map-side, free),
# keeping E[cluster size] — and so candidate pairs per vector — constant.
# N is measured by the query itself (a broadcast 1-row count), so the key
# width is deterministic per corpus and identical in both engines; at
# N <= _D13_REF_N the mask is 0 bits and the plan is EXACTLY the original.
# Recall: each extra bit splits some true pairs across subkeys — the same
# k-vs-recall trade SemDeDup makes by raising k; the d14-style sketch-
# recall harness applies if the trade needs to be measured per-corpus.
_D13_REF_N = 2000  # reference corpus size (sf0.1): no extra bits at/below

# Sign-bit Hamming pre-filter (s11's packed-BIGINT popcount machinery):
# each vector's 64 sign bits are packed map-side into two BIGINT words,
# and a candidate pair only reaches the exact 64-term cosine when
# popcount(xor) <= this bound — ~6 integer ops guarding ~130 float ops.
# Charikar's estimator says a cos >= 0.4 pair differs in ~23.6/64 bits
# in expectation; the observed maximum for true pairs on this corpus is
# 27 bits at sf0.01 and 30 at sf0.1.  The bound carries an 8-bit SAFETY
# MARGIN above that observed maximum (sigma of the estimator at 64 bits
# is ~sqrt(64)/2 = 4 bits, so +8 is ~2 sigma past worst-observed): a new
# corpus whose true pairs drift a few bits hotter still passes the
# pre-filter, while ~40% of within-cluster candidates skip the cosine.
# tests/test_pipeline_ops.py guards the calibration: the bounded plan
# must be row-identical to the unfiltered (bound=128) plan at every
# tested scale, so drift is caught when data changes, not silently
# absorbed as a semantics change (ADVICE r4).
_D13_HAM_BOUND = 38


def _d13_cos(duck: bool, a: str, b: str) -> str:
    dot = _DUCK_DOT if duck else _SPARK_DOT
    n2 = _DUCK_NORM2 if duck else _SPARK_NORM2
    return (
        f"({dot.format(a=a, b=b, n=_DIM)}"
        f" / (sqrt({n2.format(a=a)}) * sqrt({n2.format(a=b)})))"
    )


_D13_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cnt AS (
  SELECT {adaptive_xbits_agg_sql(_D13_REF_N)} AS xbits
  FROM vecs
),
assigned AS (
  SELECT vec_id, v, {_DUCK_CELL.format(a="v")} AS cell,
         {_DUCK_BUCKET} AS bucket,
         list_min({_DUCK_CELL_DISTS.format(a="v")}) AS d2,
         {_DUCK_SIGNWORD.format(a="v", base=0)} AS w0,
         {_DUCK_SIGNWORD.format(a="v", base=32)} AS w1,
         {ADAPTIVE_SUB_SQL.format(w=_DUCK_SIGNWORD.format(a="v", base=0), xbits="(SELECT xbits FROM cnt)")} AS sub
  FROM vecs
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CASE WHEN a.d2 < b.d2 THEN a.vec_id
              WHEN b.d2 < a.d2 THEN b.vec_id
              ELSE b.vec_id END AS loser
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.bucket = b.bucket AND a.sub = b.sub
   AND a.vec_id < b.vec_id
  WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
          <= {_D13_HAM_BOUND}
    AND {_d13_cos(True, "a.v", "b.v")} >= {_D13_THRESHOLD}
),
part AS (
  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups
  FROM (SELECT va AS vec_id FROM pairs UNION ALL SELECT vb AS vec_id FROM pairs)
  GROUP BY vec_id
),
losers AS (SELECT DISTINCT loser AS vec_id FROM pairs)
SELECT s.vec_id AS vec_id, s.cell AS cell,
       CAST(COALESCE(p.n_dups, 0) AS BIGINT) AS n_dups,
       CAST(l.vec_id IS NULL AS INT) AS kept
FROM assigned s
LEFT JOIN part p ON s.vec_id = p.vec_id
LEFT JOIN losers l ON s.vec_id = l.vec_id
ORDER BY s.vec_id
"""


@register("d13_semantic_dedup", oracle=_D13_ORACLE)
def d13_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _d13_plan(spark, sf_dir, _D13_HAM_BOUND)


def _d13_plan(spark: SparkSession, sf_dir: str, ham_bound: int) -> DataFrame:
    """d13 with an explicit Hamming pre-filter bound (128 disables it —
    every 64-bit pair passes — giving the exact unfiltered plan for the
    calibration guard test)."""
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    # persist(): `assigned` feeds three plan branches (self-join sides a/b
    # plus the final corpus join); without it the unrolled 16-cell distance
    # + sign-word expressions recompute per branch (d03 persists its
    # signature relation for the same reason).
    xbits = emb.agg(F.expr(adaptive_xbits_agg_sql(_D13_REF_N)).alias("xbits"))
    assigned = (
        emb.select(
            "vec_id",
            "v",
            F.expr(_SPARK_CELL.format(a="v")).alias("cell"),
            F.expr(_SPARK_BUCKET).alias("bucket"),
            F.expr(f"array_min({_SPARK_CELL_DISTS.format(a='v')})").alias("d2"),
            F.expr(_SPARK_SIGNWORD.format(a="v", base=0)).alias("w0"),
            F.expr(_SPARK_SIGNWORD.format(a="v", base=32)).alias("w1"),
        )
        .crossJoin(F.broadcast(xbits))
        .withColumn("sub", F.expr(ADAPTIVE_SUB_SQL.format(w="w0", xbits="xbits")))
        .drop("xbits")
        .transform(keep_cached)
    )
    a = assigned.select(
        F.col("vec_id").alias("va"),
        F.col("v").alias("xa"),
        F.col("cell").alias("ca"),
        F.col("bucket").alias("ba"),
        F.col("sub").alias("sa"),
        F.col("d2").alias("da"),
        F.col("w0").alias("wa0"),
        F.col("w1").alias("wa1"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"),
        F.col("cell").alias("cb"),
        F.col("bucket").alias("bb"),
        F.col("sub").alias("sb"),
        F.col("d2").alias("db"),
        F.col("w0").alias("wb0"),
        F.col("w1").alias("wb1"),
    )
    # One conjunction, Hamming first: codegen evaluates AND left-to-right
    # with short-circuit, so ~55% of candidate pairs never run the cosine.
    pairs = (
        a.join(
            b,
            (F.col("ca") == F.col("cb"))
            & (F.col("ba") == F.col("bb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("va") < F.col("vb")),
        )
        .filter(
            (
                (
                    F.bit_count(F.expr("wa0 ^ wb0"))
                    + F.bit_count(F.expr("wa1 ^ wb1"))
                )
                <= ham_bound
            )
            & (F.expr(_d13_cos(False, "xa", "xb")) >= _D13_THRESHOLD)
        )
        .select(
            "va",
            "vb",
            F.when(F.col("da") < F.col("db"), F.col("va"))
            .when(F.col("db") < F.col("da"), F.col("vb"))
            .otherwise(F.col("vb"))
            .alias("loser"),
        )
    )
    part = (
        pairs.select(F.explode(F.array("va", "vb")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dups"))
    )
    losers = pairs.select(F.col("loser").alias("vec_id")).distinct().withColumn(
        "_rm", F.lit(1)
    )
    return (
        assigned.join(part, "vec_id", "left")
        .join(losers, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce(F.col("n_dups"), F.lit(0)).cast("bigint").alias("n_dups"),
            F.when(F.col("_rm").isNotNull(), F.lit(0)).otherwise(F.lit(1)).cast("int").alias("kept"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# p24: DSIR-style importance selection toward a target distribution
# --------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw-pool document by the log-likelihood
# ratio of its hashed n-gram features under a target-domain distribution
# vs the raw-pool distribution, then keep the highest-weight docs — the
# standard way to tilt a 100 TB crawl toward a curated domain without
# training a classifier. Exactly DSIR's shape in-plan: features are
# md5-hashed unigram buckets (fixed B-dim multinomial, so the model table
# is bounded at B rows REGARDLESS of vocabulary — that is the scale
# trick), the two bucket-count aggregations partial-aggregate into B-row
# tables that broadcast, and per-doc scoring is one broadcast join + an
# associative quantized-integer sum (t13's move), order-independent under
# any partitioning. Target here = the 'src0' slice (the same split
# p04/p12 treat as the curated set); selection = top-N by mean per-token
# log-ratio (the deterministic analog of DSIR's Gumbel resampling; rank
# by the weight, tie-break doc_id) via TakeOrderedAndProject.

_P24_B = 4096  # hashed feature buckets
_P24_ALPHA = 0.5  # add-alpha smoothing
_P24_TARGET = "src0"
_P24_N = 100

_P24_SPARK_BUCKET = "pmod(CAST(conv(substr(md5(cast(word AS BINARY)), 1, 15), 16, 10) AS BIGINT), {b})"
_P24_DUCK_BUCKET = "(CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) % {b})"

_P24_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, source,
         {_P24_DUCK_BUCKET.format(b=_P24_B)} AS bucket
  FROM (SELECT doc_id, source, unnest({_DUCK_TOK}) AS word
        FROM documents WHERE length(trim(text)) > 0)
),
tc AS (
  SELECT bucket, COUNT(*) AS ct FROM occ WHERE source = '{_P24_TARGET}' GROUP BY bucket
),
rc AS (
  SELECT bucket, COUNT(*) AS cr FROM occ WHERE source <> '{_P24_TARGET}' GROUP BY bucket
),
nt AS (SELECT COUNT(*) AS n FROM occ WHERE source = '{_P24_TARGET}'),
nr AS (SELECT COUNT(*) AS n FROM occ WHERE source <> '{_P24_TARGET}'),
model AS (
  SELECT rc.bucket,
         floor((log2((COALESCE(tc.ct, 0) + {_P24_ALPHA}) / (nt.n + {_P24_ALPHA} * {_P24_B}))
               - log2((rc.cr + {_P24_ALPHA}) / (nr.n + {_P24_ALPHA} * {_P24_B}))) * 1e9 + 0.5)
           AS qlr
  FROM rc LEFT JOIN tc ON rc.bucket = tc.bucket CROSS JOIN nt CROSS JOIN nr
),
scored AS (
  SELECT o.doc_id, ANY_VALUE(o.source) AS source,
         COUNT(*) AS n_tokens,
         round(CAST(SUM(CAST(m.qlr AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) / 1e9, 6)
           AS avg_logratio
  FROM occ o JOIN model m ON o.bucket = m.bucket
  WHERE o.source <> '{_P24_TARGET}'
  GROUP BY o.doc_id
)
SELECT doc_id, source, n_tokens, avg_logratio
FROM scored
ORDER BY avg_logratio DESC, doc_id
LIMIT {_P24_N}
"""


@register("p24_dsir_select", oracle=_P24_ORACLE)
def p24_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    occ = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "source", F.explode(tokens()).alias("word"))
        .select(
            "doc_id",
            "source",
            F.expr(_P24_SPARK_BUCKET.format(b=_P24_B)).alias("bucket"),
        )
    )
    tgt = occ.filter(F.col("source") == _P24_TARGET)
    raw = occ.filter(F.col("source") != _P24_TARGET)
    tc = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    rc = raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    nt = tgt.agg(F.count(F.lit(1)).alias("nt"))
    nr = raw.agg(F.count(F.lit(1)).alias("nr"))
    model = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            F.expr(
                f"floor((log2((COALESCE(ct, 0) + {_P24_ALPHA}) / (nt + {_P24_ALPHA} * {_P24_B}))"
                f" - log2((cr + {_P24_ALPHA}) / (nr + {_P24_ALPHA} * {_P24_B}))) * 1e9 + 0.5)"
            ).alias("qlr"),
        )
    )
    return (
        raw.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.expr("CAST(SUM(CAST(qlr AS DECIMAL(28,0))) AS DOUBLE)")
                / F.count(F.lit(1))
                / F.lit(1e9),
                6,
            ).alias("avg_logratio"),
        )
        .select("doc_id", "source", "n_tokens", "avg_logratio")
        .orderBy(F.desc("avg_logratio"), "doc_id")
        .limit(_P24_N)
    )


# --------------------------------------------------------------------------
# p25: temperature-scaled source mixing
# --------------------------------------------------------------------------
# THE standard multi-source/multilingual rebalancing knob (mT5/mC4 style,
# arXiv:1910.10683 §3.4.3 / arXiv:2010.11934): sample source s with
# probability p_s ∝ n_s^τ. τ=1 keeps natural proportions, τ→0 flattens —
# τ=0.5 (here) upsamples rare sources. Unlike p06's FIXED weights, the
# per-source keep-rates derive from the live counts, so the whole thing is
# computed in-plan: count per source (partial agg), fold the tiny
# per-source table into one broadcast row for the normalizers, derive
# rate_s = keep_frac * T * p_s / n_s capped at 1, then the deterministic
# md5-threshold keep (p06's machinery) — docs shuffle ZERO times; the only
# exchanges are on the few-row source table.
#
# Determinism: sqrt is IEEE-correctly-rounded in both engines (unlike
# libm pow), so τ is fixed at 0.5; each sqrt(n_s) is quantized to an
# integer (×1e9, half-up) BEFORE the cross-source sum so the normalizer
# is an exact integer in any partition order (t13's move); the rate is
# rebuilt from exact integers with identically-parenthesized IEEE ops and
# compared as floor(rate × 65536) vs the doc's 16-bit md5 key — pure
# integer compare, zero drift surface.

_P25_TAU_SQRT = True  # τ = 0.5 via sqrt (IEEE-exact; libm pow is not)
_P25_KEEP_FRAC = 0.5

_P25_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n,
         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS qs
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS t, CAST(SUM(qs) AS BIGINT) AS qz FROM counts
),
rates AS (
  SELECT c.source, c.n,
         CAST(floor(least(
           (({_P25_KEEP_FRAC} * CAST(tot.t AS DOUBLE))
            * (CAST(c.qs AS DOUBLE) / CAST(tot.qz AS DOUBLE)))
           / CAST(c.n AS DOUBLE), 1.0) * 65536.0) AS BIGINT) AS thr
  FROM counts c CROSS JOIN tot
)
SELECT d.doc_id AS doc_id, d.source AS source, r.thr AS thr
FROM documents d JOIN rates r ON d.source = r.source
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT) < r.thr
ORDER BY d.doc_id
"""


@register("p25_temperature_mix", oracle=_P25_ORACLE)
def p25_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)").alias(
            "qs"
        ),
    )
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("t"), F.sum("qs").cast("bigint").alias("qz")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(
            f"CAST(floor(least((({_P25_KEEP_FRAC} * CAST(t AS DOUBLE))"
            " * (CAST(qs AS DOUBLE) / CAST(qz AS DOUBLE)))"
            " / CAST(n AS DOUBLE), CAST(1.0 AS DOUBLE)) * 65536.0) AS BIGINT)"
        ).alias("thr"),
    )
    key = F.expr(
        "CAST(conv(substr(md5(cast(CAST(doc_id AS STRING) AS BINARY)), 1, 4), 16, 10) AS BIGINT)"
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(key < F.col("thr"))
        .select("doc_id", "source", "thr")
        .orderBy("doc_id")
    )
