"""Training-data pipeline operators, part 4: end-to-end observability.

- p37 pipeline funnel — per-stage survival of the canonical corpus build
- p38 padding-waste curve — max_len selection from one measured scan
- p39 quality-decile vs duplication calibration — filter-order evidence


p37 is the pipeline funnel report: how many documents survive each stage
of the canonical corpus build (raw → length gate → language filter →
exact dedup → decontamination), with survival in exact basis points of
raw. Every serious data pipeline publishes exactly this table per run —
it is the first thing a data lead reads, and the diff between two runs'
funnels is the fastest regression alarm the pipeline has (a filter whose
survival share moves 10 points did not change "a little").

Scale shape: stages 0-3 fold into ONE conditional-aggregate scan —
COUNT(*), two filtered COUNTs and a filtered COUNT(DISTINCT md5) in a
single pass over the corpus (the predicates are monotone along the
chain, so later stages just AND earlier conditions). Only the
decontamination stage needs real dataflow: the p04 broadcast
eval-shingle join, run over the already-deduped survivor set (semi join
on doc_id — ids, never a second text pass for membership). Stage
definitions are shared with the operators they sample (p04's eval
source + threshold, d01's md5 identity), so the funnel cannot disagree
with the operators it summarizes.

Reference parity: the reference's plane reports coverage/progress
tables (src/dbt_osmosis/core/osmosis.py); this is the data-plane
analog of that reporting discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.operators.dedup import DUCK_VERIFIED_CTES
from dbt_osmosis_spark.operators.pipeline import _P04_EVAL_SOURCE, _P04_THRESHOLD
from dbt_osmosis_spark.operators.text import (
    _DUCK_TOK,
    _duck_shingles,
    spark_shingles_sql,
    tokens,
)
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_P37_MIN_CHARS = 100
_P37_LANG = "en"

_P37_ORACLE = f"""
WITH flags AS (
  SELECT doc_id, source, text,
         (n_chars >= {_P37_MIN_CHARS}) AS len_ok,
         (lang = '{_P37_LANG}') AS lang_ok
  FROM documents
),
s0123 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s0,
         CAST(COUNT(CASE WHEN len_ok THEN 1 END) AS BIGINT) AS s1,
         CAST(COUNT(CASE WHEN len_ok AND lang_ok THEN 1 END) AS BIGINT) AS s2,
         CAST(COUNT(DISTINCT CASE WHEN len_ok AND lang_ok THEN md5(text) END) AS BIGINT) AS s3
  FROM flags
),
kept AS (
  SELECT MIN(doc_id) AS doc_id
  FROM flags WHERE len_ok AND lang_ok
  GROUP BY md5(text)
),
kdocs AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN kept k ON k.doc_id = d.doc_id
),
etok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
  WHERE source = '{_P04_EVAL_SOURCE}'
),
eval_sh AS (
  SELECT DISTINCT unnest({_duck_shingles(3)}) AS shingle
  FROM etok WHERE len(w) >= 3
),
ktok AS (
  SELECT doc_id, source, {_DUCK_TOK} AS w FROM kdocs
),
train_sh AS (
  SELECT doc_id, unnest({_duck_shingles(3)}) AS shingle
  FROM ktok WHERE len(w) >= 3 AND source <> '{_P04_EVAL_SOURCE}'
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train_sh GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hit
  FROM train_sh t JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY t.doc_id
),
contam AS (
  SELECT h.doc_id FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
  WHERE CAST(h.n_hit AS DOUBLE) / s.n_shingles >= {_P04_THRESHOLD}
),
s4 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM kdocs
  WHERE source <> '{_P04_EVAL_SOURCE}'
    AND doc_id NOT IN (SELECT doc_id FROM contam)
),
stages AS (
  SELECT '0_raw' AS stage, s0 AS n_docs FROM s0123
  UNION ALL SELECT '1_length', s1 FROM s0123
  UNION ALL SELECT '2_lang', s2 FROM s0123
  UNION ALL SELECT '3_exact_dedup', s3 FROM s0123
  UNION ALL SELECT '4_decontam', n FROM s4
)
SELECT stage, n_docs,
       n_docs * 10000 // (SELECT s0 FROM s0123) AS pct_bp
FROM stages
ORDER BY stage
"""


@register("p37_pipeline_funnel", oracle=_P37_ORACLE)
def p37_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    len_ok = F.col("n_chars") >= _P37_MIN_CHARS
    lang_ok = F.col("lang") == _P37_LANG
    # Stages 0-3: one conditional-aggregate pass over the corpus.
    s0123 = docs.agg(
        F.count(F.lit(1)).alias("s0"),
        F.count(F.when(len_ok, 1)).alias("s1"),
        F.count(F.when(len_ok & lang_ok, 1)).alias("s2"),
        F.countDistinct(
            F.when(len_ok & lang_ok, F.md5(F.col("text").cast("binary")))
        ).alias("s3"),
    )
    # Stage 4: decontaminate the deduped survivor set (p04's chain).
    kept = (
        docs.filter(len_ok & lang_ok)
        .groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kdocs = docs.join(kept, "doc_id", "left_semi")
    ksh = (
        spread(kdocs)
        .withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"),
        )
        .transform(keep_cached)
    )
    eval_sh = (
        spread(docs.filter(F.col("source") == _P04_EVAL_SOURCE))
        .withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select(F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"))
        .distinct()
    )
    train_sh = ksh.filter(F.col("source") != _P04_EVAL_SOURCE).select(
        "doc_id", "shingle"
    )
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contam = (
        hits.join(sizes, "doc_id")
        .filter(
            F.col("n_hit").cast("double") / F.col("n_shingles") >= _P04_THRESHOLD
        )
        .select("doc_id")
    )
    s4 = (
        kdocs.filter(F.col("source") != _P04_EVAL_SOURCE)
        .join(contam, "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stages = s0123.select(
        F.explode(
            F.expr(
                "array(struct('0_raw' AS stage, s0 AS n_docs),"
                " struct('1_length' AS stage, s1 AS n_docs),"
                " struct('2_lang' AS stage, s2 AS n_docs),"
                " struct('3_exact_dedup' AS stage, s3 AS n_docs))"
            )
        ).alias("x")
    ).select("x.stage", "x.n_docs").unionByName(
        s4.select(F.lit("4_decontam").alias("stage"), F.col("n").alias("n_docs"))
    )
    base = s0123.select(F.col("s0").alias("base_n"))
    return (
        stages.crossJoin(F.broadcast(base))
        .select(
            "stage",
            "n_docs",
            F.expr("n_docs * 10000 DIV base_n").alias("pct_bp"),
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# p38: padding-waste curve — choosing max_len from measurement
# --------------------------------------------------------------------------
# Every training pipeline picks a sequence length; the cost of picking
# wrong is padding (short max_len: more sequences + per-sequence
# overhead; long max_len: the final chunk of every document pads out).
# This measures it: for each candidate L, each document contributes
# ceil(n/L) chunks of which the last pads (ceil(n/L)·L − n wasted
# positions); the report is per (source, L): sequence count and waste in
# exact basis points of the padded total. Pure map-side arithmetic on
# per-document token counts folded in ONE conditional-aggregate scan
# (the L sweep is four expressions, not four passes), exploded to curve
# rows — the same one-scan-sweep shape as p36/t24.

_P38_LENS = (64, 128, 256, 512)

_P38_ORACLE = f"""
WITH toks AS (
  SELECT source, len(string_split(trim(text), ' ')) AS n FROM documents
  WHERE len(trim(text)) > 0
),
agg AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS total_tokens,
         {', '.join(f"CAST(SUM((n + {L} - 1) // {L}) AS BIGINT) AS seqs{L}" for L in _P38_LENS)}
  FROM toks GROUP BY source
)
{' UNION ALL '.join(
    f"SELECT source, CAST({L} AS INT) AS seq_len, seqs{L} AS n_seqs,"
    f" (seqs{L} * {L} - total_tokens) * 10000 // (seqs{L} * {L}) AS waste_bp FROM agg"
    for L in _P38_LENS
)}
ORDER BY source, seq_len
"""


@register("p38_padding_waste_curve", oracle=_P38_ORACLE)
def p38_padding_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "source", F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n")
    )
    seqs = [
        F.sum(F.expr(f"(n + {L} - 1) DIV {L}")).cast("bigint").alias(f"seqs{L}")
        for L in _P38_LENS
    ]
    agg = toks.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("total_tokens"), *seqs
    )
    curve = ", ".join(
        f"struct(CAST({L} AS INT) AS seq_len, seqs{L} AS n_seqs,"
        f" (seqs{L} * {L} - total_tokens) * 10000 DIV (seqs{L} * {L}) AS waste_bp)"
        for L in _P38_LENS
    )
    return (
        agg.select("source", F.explode(F.expr(f"array({curve})")).alias("x"))
        .select("source", "x.seq_len", "x.n_seqs", "x.waste_bp")
        .orderBy("source", "seq_len")
    )


# --------------------------------------------------------------------------
# p39: quality-decile vs duplication calibration
# --------------------------------------------------------------------------
# Cross-signal diagnostic: are low-quality documents also the duplicated
# ones? If dup rate concentrates in the bottom quality deciles, the
# quality gate already removes most duplicate mass and the dedup pass
# can run on the survivors (cheaper); if duplication is flat across
# quality, the passes are independent and order doesn't matter. The
# report is per GLOBAL quality decile: doc count, near-dup member count
# (verified-pair graph nodes — d03's shared relation), dup rate in exact
# basis points. Quality is t02's score in exact integer basis points
# (float scores would tie-break differently across engines); the global
# decile rank uses the t24 decomposition — per-distinct-score offsets
# from a bounded score histogram (score space ≤ 3·10⁴ values regardless
# of corpus size) + a local row_number within each score — never a
# corpus-global sort.

_P39_ORACLE = f"""
WITH {DUCK_VERIFIED_CTES},
dup_docs AS (
  SELECT DISTINCT doc_a AS doc_id FROM verified
  UNION
  SELECT DISTINCT doc_b FROM verified
),
feat AS (
  SELECT doc_id,
         len(list_filter(w, x -> x IN ('the', 'a'))) * 10000 // len(w)
         + len(list_filter(w, x -> len(x) >= 6)) * 10000 // len(w)
         + CASE WHEN len(w) BETWEEN 20 AND 80 THEN 10000 ELSE 0 END AS score_q
  FROM (SELECT doc_id, {_DUCK_TOK} AS w FROM documents WHERE len(trim(text)) > 0)
),
ranked AS (
  SELECT doc_id, score_q,
         ROW_NUMBER() OVER (ORDER BY score_q, doc_id) AS rnk,
         COUNT(*) OVER () AS n
  FROM feat
),
dec AS (
  SELECT doc_id, CAST(((rnk - 1) * 10) // n + 1 AS INT) AS decile FROM ranked
)
SELECT d.decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(dd.doc_id) AS BIGINT) AS n_dup_docs,
       CAST(COUNT(dd.doc_id) AS BIGINT) * 10000 // COUNT(*) AS dup_bp
FROM dec d LEFT JOIN dup_docs dd ON dd.doc_id = d.doc_id
GROUP BY d.decile
ORDER BY d.decile
"""


@register("p39_quality_dup_calibration", oracle=_P39_ORACLE)
def p39_quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from dbt_osmosis_spark.operators.dedup import minhash_signatures, verified_pairs

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    vp = verified_pairs(sig)
    dup_docs = (
        vp.select(F.col("doc_a").alias("doc_id"))
        .union(vp.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    feat = (
        spread(docs)
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.expr(
                "size(filter(split(trim(text), ' '), x -> x IN ('the', 'a'))) * 10000"
                " DIV size(split(trim(text), ' '))"
                " + size(filter(split(trim(text), ' '), x -> length(x) >= 6)) * 10000"
                " DIV size(split(trim(text), ' '))"
                " + CASE WHEN size(split(trim(text), ' ')) BETWEEN 20 AND 80"
                " THEN 10000 ELSE 0 END"
            ).alias("score_q"),
        )
    )
    # global rank without a global sort: score-histogram offsets (score
    # space is bounded) + local row_number within each score value
    hist = feat.groupBy("score_q").agg(F.count(F.lit(1)).alias("k"))
    off = F.coalesce(
        F.sum("k").over(W.orderBy("score_q").rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("bigint")
    offsets = hist.select("score_q", off.alias("off"))
    # corpus size stays IN-PLAN (1-row broadcast from the same histogram;
    # a driver-side .count() here would add a blocking job per run)
    total = hist.agg(F.sum("k").cast("bigint").alias("n_total"))
    local = F.row_number().over(W.partitionBy("score_q").orderBy("doc_id"))
    dec = (
        feat.withColumn("lrn", local)
        .join(F.broadcast(offsets), "score_q")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr("CAST(((off + lrn - 1) * 10) DIV n_total + 1 AS INT)").alias(
                "decile"
            ),
        )
    )
    return (
        dec.join(dup_docs.withColumn("is_dup", F.lit(1)), "doc_id", "left")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("is_dup").cast("bigint").alias("n_dup_docs"),
            F.expr("CAST(COUNT(is_dup) AS BIGINT) * 10000 DIV COUNT(*)").alias(
                "dup_bp"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# p40: length-distribution-matched sampling
# ---------------------------------------------------------------------------
# Training mixtures routinely need a corpus resampled so a marginal
# (here: token length) matches a target distribution — e.g. flattening
# the natural length skew before packing so short docs don't dominate
# batches (the inverse-propensity view of Doremi/DSIR-style reweighting,
# applied to an observable instead of a learned domain score). This is
# the quota-sampling form: fixed length buckets, a total budget, a
# uniform target share per bucket; each bucket contributes
# min(quota_b, available_b) docs chosen by md5 rank (the p02 move —
# deterministic, order-free, engine-exact). Budget remainders go to the
# lowest bucket ids (largest-remainder would also work; with a uniform
# target all remainders tie, so fixed order IS the tie-break). Unfilled
# quota is reported, not silently redistributed — a redistribution pass
# is a second identical quota round and hides coverage gaps.
#
# Every quantity is an integer; selection is md5-rank <= take_b. The
# checksum column (sum of selected doc_ids) pins the exact selected SET,
# not just its size, under the hash gate.
#
# Scale shape: one tokenize-count pass; bucket histogram is 8 rows
# (broadcast); the rank is a per-bucket window — 8 partitions is a skew
# hazard at 100 TB, so the docstring-of-record: at cluster scale the
# md5-rank selection becomes a per-bucket threshold on the hash value
# found by distributed selection (exact same output set); the window
# form is the sf-scale expression of that contract.

_P40_BUCKETS = 8
_P40_BUDGET_DIV = 2  # budget = n_docs // 2

_P40_ORACLE = f"""
WITH feat AS (
  SELECT doc_id,
         LEAST(len(string_split(trim(text), ' ')) // 12, {_P40_BUCKETS - 1}) AS bucket,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
hist AS (SELECT bucket, COUNT(*) AS n_b FROM feat GROUP BY bucket),
tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM hist),
quota AS (
  SELECT bucket, n_b,
         (n // {_P40_BUDGET_DIV}) // {_P40_BUCKETS}
           + CASE WHEN bucket < (n // {_P40_BUDGET_DIV}) % {_P40_BUCKETS}
                  THEN 1 ELSE 0 END AS q_b
  FROM hist CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY k, doc_id) AS rk
  FROM feat
),
sel AS (
  SELECT r.bucket, r.doc_id
  FROM ranked r JOIN quota q ON q.bucket = r.bucket
  WHERE r.rk <= q.q_b
)
SELECT q.bucket,
       CAST(q.n_b AS BIGINT) AS n_docs,
       CAST(q.q_b AS BIGINT) AS quota,
       CAST(COUNT(s.doc_id) AS BIGINT) AS taken,
       CAST(q.q_b - COUNT(s.doc_id) AS BIGINT) AS unfilled,
       CAST(COALESCE(SUM(s.doc_id), 0) AS BIGINT) AS id_checksum
FROM quota q LEFT JOIN sel s ON s.bucket = q.bucket
GROUP BY q.bucket, q.n_b, q.q_b
ORDER BY q.bucket
"""


@register("p40_length_matched_sample", oracle=_P40_ORACLE)
def p40_length_matched_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota-sample the corpus so token-length buckets approach a uniform
    target share; md5-rank selection, integer quotas (module comment)."""
    from pyspark.sql.window import Window as W

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    feat = docs.select(
        "doc_id",
        F.least(
            F.floor(F.size(F.split(F.trim(F.col("text")), " ")) / 12),
            F.lit(_P40_BUCKETS - 1),
        )
        .cast("int")
        .alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    hist = feat.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_b"))
    tot = hist.agg(F.sum("n_b").cast("bigint").alias("n"))
    quota = hist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_b",
        F.expr(
            f"(n DIV {_P40_BUDGET_DIV}) DIV {_P40_BUCKETS}"
            f" + CASE WHEN bucket < (n DIV {_P40_BUDGET_DIV}) % {_P40_BUCKETS}"
            f" THEN 1 ELSE 0 END"
        ).alias("q_b"),
    )
    ranked = feat.withColumn(
        "rk", F.row_number().over(W.partitionBy("bucket").orderBy("k", "doc_id"))
    )
    sel = ranked.join(F.broadcast(quota.select("bucket", "q_b")), "bucket").filter(
        F.col("rk") <= F.col("q_b")
    )
    return (
        quota.join(
            sel.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("taken0"),
                F.sum("doc_id").alias("chk0"),
            ),
            "bucket",
            "left",
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("n_b").cast("bigint").alias("n_docs"),
            F.col("q_b").cast("bigint").alias("quota"),
            F.coalesce(F.col("taken0"), F.lit(0)).cast("bigint").alias("taken"),
            (F.col("q_b") - F.coalesce(F.col("taken0"), F.lit(0)))
            .cast("bigint")
            .alias("unfilled"),
            F.coalesce(F.col("chk0"), F.lit(0)).cast("bigint").alias("id_checksum"),
        )
        .orderBy("bucket")
    )
