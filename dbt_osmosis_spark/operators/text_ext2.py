"""Text-analysis extensions II: trigram LM scoring with stupid backoff.

Reference analog: none (dbt-osmosis has no data plane). North-star: the
KenLM-style n-gram scorer every web-corpus quality pipeline runs (CCNet,
FineWeb): score each document under a higher-order model, backing off to
lower orders for unseen n-grams. t13 is the bigram form; t19 adds the
order-3 model with **stupid backoff** (Brants et al. 2007 — the
production choice at corpus scale precisely because its scores need no
normalization pass) and singleton pruning (trigrams with count < 2 are
dropped from the model — the standard size/regularization lever, and what
makes backoff actually fire on a corpus the model was trained on).

Scoring: S(c|a,b) = n3/n2(a,b)            if pruned trigram survives
                    0.4 * n2(b,c)/n1(b)   otherwise (backoff to bigram)
Log-scores are quantized to exact integers (floor(log2(S)*1e9 + 0.5), the
t13 move) so per-document sums are associative under any partitioning.

Scale shape: the model build is two partial-aggregated shuffles (trigram
and bigram counts; unigram prefixes derive from bigrams with no extra
scan). Scoring joins each document's trigrams against the model tables —
tiny here so they broadcast; a web-scale vocab shuffle-joins on the same
keys, the plan Spark picks from table stats. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_MIN_N3 = 2  # singleton pruning: trigram must occur >= 2x to stay in model
_BACKOFF = 0.4  # stupid-backoff multiplier (Brants et al. 2007)

_T19_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 3
),
tri AS (
  SELECT doc_id, w[i] AS a, w[i + 1] AS b, w[i + 2] AS c
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
c3 AS (
  SELECT a, b, c, COUNT(*) AS n3 FROM tri GROUP BY a, b, c
  HAVING COUNT(*) >= {_MIN_N3}
),
big AS (
  SELECT doc_id, w[i] AS a, w[i + 1] AS b
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
c2 AS (SELECT a, b, COUNT(*) AS n2 FROM big GROUP BY a, b),
c1 AS (SELECT a, SUM(n2) AS n1 FROM c2 GROUP BY a),
scored AS (
  SELECT g.doc_id,
         CASE WHEN c3.n3 IS NOT NULL THEN 0 ELSE 1 END AS backed_off,
         CASE WHEN c3.n3 IS NOT NULL
              THEN floor(log2(CAST(c3.n3 AS DOUBLE) / p2.n2) * 1e9 + 0.5)
              ELSE floor(log2({_BACKOFF} * CAST(b2.n2 AS DOUBLE) / b1.n1) * 1e9 + 0.5)
         END AS qlp
  FROM tri g
  LEFT JOIN c3 ON g.a = c3.a AND g.b = c3.b AND g.c = c3.c
  JOIN c2 p2 ON g.a = p2.a AND g.b = p2.b
  JOIN c2 b2 ON g.b = b2.a AND g.c = b2.b
  JOIN c1 b1 ON g.b = b1.a
)
SELECT doc_id,
       COUNT(*) AS n_trigrams,
       CAST(SUM(backed_off) AS BIGINT) AS n_backoff,
       round(-CAST(SUM(CAST(qlp AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) / 1e9, 6)
         AS score_bits
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register("t19_trigram_backoff", oracle=_T19_ORACLE)
def t19_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("w")
    ).filter(F.size("w") >= 3)
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2), i -> struct("
                "element_at(w, i) AS a, element_at(w, i + 1) AS b,"
                " element_at(w, i + 2) AS c))"
            )
        ).alias("t"),
    ).select("doc_id", "t.a", "t.b", "t.c")
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> struct("
                "element_at(w, i) AS a, element_at(w, i + 1) AS b))"
            )
        ).alias("g"),
    ).select("doc_id", "g.a", "g.b")
    c3 = (
        tri.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("n3"))
        .filter(F.col("n3") >= _MIN_N3)
    )
    c2 = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("a").agg(F.sum("n2").alias("n1"))
    scored = (
        tri.join(F.broadcast(c3), ["a", "b", "c"], "left")
        .join(
            F.broadcast(c2.select(F.col("a"), F.col("b"), F.col("n2").alias("p_n2"))),
            ["a", "b"],
        )
        .join(
            F.broadcast(
                c2.select(
                    F.col("a").alias("b"),
                    F.col("b").alias("c"),
                    F.col("n2").alias("b_n2"),
                )
            ),
            ["b", "c"],
        )
        .join(F.broadcast(c1.select(F.col("a").alias("b"), "n1")), "b")
        .select(
            "doc_id",
            F.when(F.col("n3").isNotNull(), 0).otherwise(1).alias("backed_off"),
            F.when(
                F.col("n3").isNotNull(),
                F.expr("floor(log2(CAST(n3 AS DOUBLE) / p_n2) * 1e9 + 0.5)"),
            )
            .otherwise(
                F.expr(
                    f"floor(log2({_BACKOFF} * CAST(b_n2 AS DOUBLE) / n1) * 1e9 + 0.5)"
                )
            )
            .alias("qlp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("backed_off").cast("bigint").alias("n_backoff"),
            F.round(
                -F.expr("CAST(SUM(CAST(qlp AS DECIMAL(28,0))) AS DOUBLE)")
                / F.count(F.lit(1))
                / F.lit(1e9),
                6,
            ).alias("score_bits"),
        )
        .orderBy("doc_id")
    )


# ---- t20: language-ID eval metrics (precision/recall/F1 per language) ------
# The classifier scorecard over t03's decision rule: per language, how many
# docs were predicted as it (n_pred), truly labeled as it (n_label), and
# correctly matched (n_correct); precision/recall from those integers, and
# F1 via the integer identity 2PR/(P+R) = 2*tp/(n_pred+n_label) — a single
# IEEE division of exact BIGINTs, so the value is bit-identical across
# engines with no rounding games. 'und' predictions (zero marker evidence)
# naturally appear as a precision-0 row. Scale: two marginal aggregates
# over the map-side decided relation, full-outer-joined on a ≤5-row key
# set — the report never re-shuffles the corpus.

from dbt_osmosis_spark.operators.text import DUCK_LANGID_CTES, langid_decided

_T20_ORACLE = f"""
WITH {DUCK_LANGID_CTES},
pred AS (
  SELECT lang_pred AS lang, COUNT(*) AS n_pred,
         CAST(SUM(CASE WHEN lang_pred = labeled_lang THEN 1 ELSE 0 END) AS BIGINT) AS tp
  FROM decided GROUP BY lang_pred
),
lab AS (
  SELECT labeled_lang AS lang, COUNT(*) AS n_label FROM decided GROUP BY labeled_lang
)
SELECT COALESCE(p.lang, l.lang) AS lang,
       COALESCE(p.n_pred, 0) AS n_pred,
       COALESCE(l.n_label, 0) AS n_label,
       COALESCE(p.tp, 0) AS n_correct,
       CASE WHEN COALESCE(p.n_pred, 0) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(COALESCE(p.tp, 0) AS DOUBLE) / p.n_pred END AS prec,
       CASE WHEN COALESCE(l.n_label, 0) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(COALESCE(p.tp, 0) AS DOUBLE) / l.n_label END AS rec,
       CASE WHEN COALESCE(p.n_pred, 0) + COALESCE(l.n_label, 0) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE 2.0 * COALESCE(p.tp, 0) / (COALESCE(p.n_pred, 0) + COALESCE(l.n_label, 0))
       END AS f1
FROM pred p FULL OUTER JOIN lab l ON p.lang = l.lang
ORDER BY lang
"""


@register("t20_langid_eval", oracle=_T20_ORACLE)
def t20_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    decided = langid_decided(docs)
    pred = decided.groupBy(F.col("lang_pred").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum(F.when(F.col("lang_pred") == F.col("labeled_lang"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
    )
    lab = decided.groupBy(F.col("labeled_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    j = pred.join(lab, "lang", "full_outer")
    n_pred = F.coalesce("n_pred", F.lit(0))
    n_label = F.coalesce("n_label", F.lit(0))
    tp = F.coalesce("tp", F.lit(0))
    return (
        j.select(
            "lang",
            n_pred.alias("n_pred"),
            n_label.alias("n_label"),
            tp.alias("n_correct"),
            F.when(n_pred == 0, F.lit(None).cast("double"))
            .otherwise(tp.cast("double") / F.col("n_pred"))
            .alias("prec"),
            F.when(n_label == 0, F.lit(None).cast("double"))
            .otherwise(tp.cast("double") / F.col("n_label"))
            .alias("rec"),
            F.when(n_pred + n_label == 0, F.lit(None).cast("double"))
            .otherwise(F.lit(2.0) * tp / (n_pred + n_label))
            .alias("f1"),
        )
        .orderBy("lang")
    )


# ---- t21: Heaps-law vocabulary growth per source ----------------------------
# t16's companion diagnostic: natural text grows vocabulary as V(n) ~ K*n^b
# with b ~ 0.4-0.6 (Heaps' law); template/generated corpora go flat (tiny
# b) and ID-spam goes linear (b ~ 1). Measured as the least-squares slope
# of (log2 docs, log2 distinct-words) over ten document-prefix
# checkpoints, in doc_id order. The checkpoint assignment is pure integer
# arithmetic (ceil division) and the fit uses t16's quantize-then-sum
# move, so the slope is partition-order-independent and engine-exact.
#
# Scale shape: one (source, word) first-occurrence aggregate (partial
# map-side combine over the exploded words), a doc-rank window per source
# over the DOCUMENT relation (corpus-sized rows but dimension-sized
# output), and a 10-row-per-source decile frame for the fit — the
# vocabulary relation never re-joins the corpus.

_T21_Q = "1e9"

_T21_ORACLE = f"""
WITH dr AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS drank,
         COUNT(*) OVER (PARTITION BY source) AS n_docs
  FROM documents
),
firsts AS (
  SELECT w.source, MIN(d.drank) AS fr, ANY_VALUE(d.n_docs) AS n_docs
  FROM (
    SELECT source, doc_id, unnest(string_split(trim(text), ' ')) AS word
    FROM documents
  ) w
  JOIN dr d ON d.source = w.source AND d.doc_id = w.doc_id
  GROUP BY w.source, w.word
),
entering AS (
  SELECT source, CAST((10 * fr + n_docs - 1) // n_docs AS BIGINT) AS dec_idx,
         COUNT(*) AS new_words, ANY_VALUE(n_docs) AS n_docs
  FROM firsts GROUP BY source, dec_idx
),
grid AS (
  SELECT s.source, g.d, s.n_docs
  FROM (SELECT source, ANY_VALUE(n_docs) AS n_docs FROM entering GROUP BY source) s,
       (SELECT unnest(range(1, 11)) AS d) g
),
pts AS (
  SELECT g.source, g.d,
         CAST((g.d * g.n_docs + 9) // 10 AS BIGINT) AS n_at,
         SUM(COALESCE(e.new_words, 0)) OVER (
           PARTITION BY g.source ORDER BY g.d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_at
  FROM grid g LEFT JOIN entering e ON e.source = g.source AND e.dec_idx = g.d
),
q AS (
  -- a source with < 10 docs has empty leading deciles (v_at = 0); the
  -- fit runs over deciles with vocabulary only — log2(0) would ERROR in
  -- DuckDB and silently NULL in Spark, so both engines filter identically
  SELECT source,
         CAST(floor(log2(n_at) * {_T21_Q} + 0.5) AS DECIMAL(28,0)) AS qx,
         CAST(floor(log2(v_at) * {_T21_Q} + 0.5) AS DECIMAL(28,0)) AS qy
  FROM pts WHERE v_at >= 1
),
sums AS (
  SELECT source, COUNT(*) AS m, SUM(qx) AS sx, SUM(qy) AS sy,
         SUM(qx * qx) AS sxx, SUM(qx * qy) AS sxy
  FROM q GROUP BY source
),
vocab AS (
  SELECT source, COUNT(*) AS vocab_size, ANY_VALUE(n_docs) AS n_docs
  FROM firsts GROUP BY source
)
SELECT v.source, v.n_docs, v.vocab_size,
       round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0 AS heaps_beta
FROM sums s JOIN vocab v ON v.source = s.source
ORDER BY v.source
"""


@register("t21_heaps_law", oracle=_T21_ORACLE)
def t21_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    dr = docs.select(
        "source",
        "doc_id",
        F.row_number().over(W.partitionBy("source").orderBy("doc_id")).alias("drank"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n_docs"),
    )
    words = docs.select(
        "source", "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("word")
    )
    firsts = (
        words.join(dr, ["source", "doc_id"])
        .groupBy("source", "word")
        .agg(F.min("drank").alias("fr"), F.first("n_docs").alias("n_docs"))
    )
    entering = firsts.groupBy(
        "source",
        F.expr("CAST((10 * fr + n_docs - 1) DIV n_docs AS BIGINT)").alias("dec_idx"),
    ).agg(F.count(F.lit(1)).alias("new_words"), F.first("n_docs").alias("n_docs"))
    per_source = entering.groupBy("source").agg(F.first("n_docs").alias("n_docs"))
    grid = per_source.select(
        "source", "n_docs", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("d")
    )
    pts = (
        grid.join(
            entering.select("source", F.col("dec_idx").alias("d"), "new_words"),
            ["source", "d"],
            "left",
        )
        .withColumn(
            "v_at",
            F.sum(F.coalesce("new_words", F.lit(0))).over(
                W.partitionBy("source").orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .withColumn("n_at", F.expr("CAST((d * n_docs + 9) DIV 10 AS BIGINT)"))
    )
    # mirror the oracle's v_at >= 1 fit-point filter (log2(0) guard)
    q = pts.filter(F.col("v_at") >= 1).select(
        "source",
        F.expr(f"CAST(floor(log2(n_at) * {_T21_Q} + 0.5) AS DECIMAL(28,0))").alias("qx"),
        F.expr(f"CAST(floor(log2(v_at) * {_T21_Q} + 0.5) AS DECIMAL(28,0))").alias("qy"),
    )
    sums = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.expr("qx * qx")).alias("sxx"),
        F.sum(F.expr("qx * qy")).alias("sxy"),
    )
    vocab = firsts.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"), F.first("n_docs").alias("n_docs")
    )
    # + 0.0 canonicalizes IEEE -0.0 (an all-equal-y fit rounds to -0.0 in
    # DuckDB but +0.0 in Spark; the sum maps both to +0.0 in both engines)
    beta = F.round(
        (F.col("m").cast("double") * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (F.col("m").cast("double") * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double")),
        6,
    ) + F.lit(0.0)
    return (
        sums.join(vocab, "source")
        .select("source", "n_docs", "vocab_size", beta.alias("heaps_beta"))
        .orderBy("source")
    )


# ---- t22: Count-Min sketch heavy-hitter evaluation ---------------------------
# The third sketch family (after HLL q29 and Bloom p12), and the first one
# that is FULLY hash-checkable: a Count-Min sketch is deterministic given
# its hash functions, so the oracle recomputes the identical sketch and
# the identical estimates — no error-bound-only testing needed. Build: d=3
# rows x w=1024 counters, each word contributing one count per row via a
# tagged 60-bit md5 (the Bloom-bit derivation pattern); the sketch build
# is ONE partial-aggregated shuffle on (row, bucket) — 3072 cells
# regardless of corpus size, the mergeable-summary property that makes CMS
# the standard distributed heavy-hitter structure. Eval: the exact top-20
# words (t06's TakeOrdered shape) joined against the broadcast sketch;
# est = min over rows, overcount = est - exact >= 0 by the CMS guarantee
# (tested as an invariant too).

_T22_D = 3
_T22_W = 1024
_T22_TOPK = 20

_T22_SPARK_H = (
    "pmod(CAST(conv(substr(md5(cast(concat('cm', CAST({i} AS STRING), '#', {w}) AS BINARY)), 1, 15), 16, 10) AS BIGINT), "
    f"{_T22_W})"
)
_T22_DUCK_H = (
    "(CAST('0x' || substr(md5('cm' || CAST({i} AS VARCHAR) || '#' || {w}), 1, 15) AS BIGINT) "
    f"% {_T22_W})"
)

_T22_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents
),
sketch AS (
  SELECT i, {_T22_DUCK_H.format(i="i", w="word")} AS bucket, COUNT(*) AS cnt
  FROM words, (SELECT unnest(range(0, {_T22_D})) AS i)
  GROUP BY 1, 2
),
exact AS (
  SELECT word, COUNT(*) AS exact_n FROM words GROUP BY word
  ORDER BY exact_n DESC, word LIMIT {_T22_TOPK}
),
est AS (
  SELECT e.word, e.exact_n, MIN(s.cnt) AS est_n
  FROM exact e
  JOIN sketch s
    ON s.bucket = {_T22_DUCK_H.format(i="s.i", w="e.word")}
  GROUP BY e.word, e.exact_n
)
SELECT word, exact_n, CAST(est_n AS BIGINT) AS est_n,
       CAST(est_n - exact_n AS BIGINT) AS overcount
FROM est
ORDER BY exact_n DESC, word
"""


@register("t22_countmin_eval", oracle=_T22_ORACLE)
def t22_countmin_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    words = docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
    sketch = (
        words.select(
            F.explode(F.expr(f"sequence(0, {_T22_D - 1})")).alias("i"), "word"
        )
        .select("i", F.expr(_T22_SPARK_H.format(i="i", w="word")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "word")
        .limit(_T22_TOPK)
    )
    est = (
        exact.join(
            F.broadcast(sketch),
            F.col("bucket") == F.expr(_T22_SPARK_H.format(i="i", w="word")),
        )
        .groupBy("word", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return (
        est.select(
            "word",
            "exact_n",
            F.col("est_n").cast("bigint").alias("est_n"),
            (F.col("est_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), "word")
    )


# ---------------------------------------------------------------------------
# t25: interpolated Kneser-Ney bigram scoring
# ---------------------------------------------------------------------------
# t13 (MLE bigram) and t19 (stupid backoff) cover the cheap ends of the
# n-gram-LM quality-signal spectrum; t25 adds the principled one —
# interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1998), the
# smoothing KenLM defaults to. With absolute discount D = 3/4:
#
#   P(w|v) = max(c(vw) - D, 0)/c(v) + D * N1+(v,.)/c(v) * Pcont(w)
#   Pcont(w) = N1+(.,w) / |bigram types|
#
# Multiplying through by 4*c(v)*B (B = bigram types) makes every term an
# exact integer:
#
#   P = (max(4*c(vw) - 3, 0) * B + 3 * N1+(v,.) * N1+(.,w)) / (4*c(v)*B)
#
# so both engines see one double division of two exact integers and one
# log2 — quantized to 1e-9 before the per-doc sum (the t13/t19 move).
# Integer bounds: num <= 4*c(vw)*B; exact while tokens*types < 2^51
# (~5e10-token corpus at this vocab) — past that the counts columns move
# to DECIMAL, the division to a higher-precision ratio; the same bound
# t13/t19 carry.
#
# Scale shape: model build = one bigram shuffle + two tiny rollups
# (prefix stats from c2, continuation stats from c2 — no extra corpus
# scan); scoring joins the doc bigrams against the model tables
# (broadcast here; shuffle-join on the same keys at web scale).

_T25_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
big AS (
  SELECT doc_id, w[i] AS a, w[i + 1] AS b
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
c2 AS (SELECT a, b, COUNT(*) AS n2 FROM big GROUP BY a, b),
pre AS (SELECT a, SUM(n2) AS cv, COUNT(*) AS n1p FROM c2 GROUP BY a),
cont AS (SELECT b, COUNT(*) AS n1c FROM c2 GROUP BY b),
btypes AS (SELECT COUNT(*) AS bt FROM c2),
scored AS (
  SELECT g.doc_id,
         floor(log2(
           CAST(GREATEST(4 * m.n2 - 3, 0) * s.bt + 3 * p.n1p * k.n1c AS DOUBLE)
             / (4 * p.cv * s.bt)
         ) * 1e9 + 0.5) AS qlp,
         CASE WHEN 4 * m.n2 - 3 > 0 THEN 0 ELSE 1 END AS cont_only
  FROM big g
  JOIN c2 m ON g.a = m.a AND g.b = m.b
  JOIN pre p ON g.a = p.a
  JOIN cont k ON g.b = k.b
  CROSS JOIN btypes s
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(cont_only) AS BIGINT) AS n_cont_only,
       round(-CAST(SUM(CAST(qlp AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) / 1e9, 6)
         AS score_bits
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register("t25_kneser_ney", oracle=_T25_ORACLE)
def t25_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram cross-entropy (bits),
    D = 3/4, integer-exact interior arithmetic (module comment)."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("w")
    ).filter(F.size("w") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> struct("
                "element_at(w, i) AS a, element_at(w, i + 1) AS b))"
            )
        ).alias("g"),
    ).select("doc_id", "g.a", "g.b")
    c2 = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n2"))
    pre = c2.groupBy("a").agg(
        F.sum("n2").alias("cv"), F.count(F.lit(1)).alias("n1p")
    )
    cont = c2.groupBy(F.col("b")).agg(F.count(F.lit(1)).alias("n1c"))
    btypes = c2.agg(F.count(F.lit(1)).alias("bt"))
    scored = (
        big.join(F.broadcast(c2), ["a", "b"])
        .join(F.broadcast(pre), "a")
        .join(F.broadcast(cont), "b")
        .crossJoin(F.broadcast(btypes))
        .select(
            "doc_id",
            F.expr(
                "floor(log2("
                "CAST(GREATEST(4 * n2 - 3, 0) * bt + 3 * n1p * n1c AS DOUBLE)"
                " / (4 * cv * bt)"
                ") * 1e9 + 0.5)"
            ).alias("qlp"),
            F.expr("CASE WHEN 4 * n2 - 3 > 0 THEN 0 ELSE 1 END").alias("cont_only"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cont_only").cast("bigint").alias("n_cont_only"),
            F.round(
                -F.sum(F.col("qlp").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e9),
                6,
            ).alias("score_bits"),
        )
        .orderBy("doc_id")
    )
