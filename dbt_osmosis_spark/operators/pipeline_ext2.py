"""Pipeline extensions II: token-budget corpus selection.

Reference analog: none (dbt-osmosis has no data plane). North-star: the
data-selection step every LLM pretraining run performs — given a token
budget B, keep the highest-quality documents whose cumulative token count
fits B (the greedy solution to the 0/1 knapsack when value == density,
i.e. score-per-token ordering; cf. DoReMi/DsDm-style budgeted selection).

Scale shape — "global order without a global sort" (the p19 move, taken
further): ordering 10^10 documents by score to cut at B tokens would be a
full sort. Instead scores are quantized to integer bins; the per-bin token
totals (<= 10 001 rows) aggregate map-side and broadcast back, so a doc
only needs (a) the token total of all STRICTLY BETTER bins — a broadcast
lookup — and (b) its running token total WITHIN its own bin, a window
partitioned by bin (parallel across bins, one bounded shuffle, no global
sort). The within-bin order is the md5 sample key, so selection is
deterministic across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_BINS = 10_000  # score quantization: bin = n_distinct * _BINS DIV n_tok
_BUDGET_NUM, _BUDGET_DEN = 3, 10  # keep ~30% of corpus tokens

_SPARK_KEY = "substr(md5(cast(cast(doc_id AS STRING) AS BINARY)), 1, 15)"
_DUCK_KEY = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)"

_P27_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w, {_DUCK_KEY} AS key
  FROM documents
),
scored AS (
  SELECT doc_id, key, len(w) AS n_tok,
         len(list_distinct(w)) * {_BINS} // len(w) AS score_bin
  FROM d WHERE len(w) > 0
),
budget AS (
  SELECT SUM(n_tok) * {_BUDGET_NUM} // {_BUDGET_DEN} AS b FROM scored
),
bins AS (
  SELECT score_bin, SUM(n_tok) AS bin_tok FROM scored GROUP BY score_bin
),
above AS (
  SELECT score_bin,
         COALESCE(SUM(bin_tok) OVER (ORDER BY score_bin DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_above
  FROM bins
),
run AS (
  SELECT s.doc_id, s.n_tok, s.score_bin,
         a.tok_above + SUM(s.n_tok) OVER (PARTITION BY s.score_bin
             ORDER BY s.key, s.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS through_me
  FROM scored s JOIN above a ON s.score_bin = a.score_bin
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(score_bin AS BIGINT) AS score_bin,
       CAST(through_me <= (SELECT b FROM budget) AS INT) AS kept
FROM run
ORDER BY doc_id
"""


@register("p27_token_budget_select", oracle=_P27_ORACLE)
def p27_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection: best score bins first, deterministic
    md5-key order inside the boundary bin, hard cut at ~30% of tokens."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    scored = (
        docs.select(
            "doc_id",
            F.split(F.trim(F.col("text")), " ").alias("w"),
            F.expr(_SPARK_KEY).alias("key"),
        )
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "key",
            F.size("w").cast("bigint").alias("n_tok"),
            F.expr(
                f"cast(size(array_distinct(w)) AS BIGINT) * {_BINS} div size(w)"
            ).alias("score_bin"),
        )
    )
    budget = scored.agg(
        F.expr(f"sum(n_tok) * {_BUDGET_NUM} div {_BUDGET_DEN}").alias("b")
    )
    # per-bin token totals: <= _BINS+1 rows — the single-partition window
    # below is over this TINY relation only, never the docs
    bins = scored.groupBy("score_bin").agg(F.sum("n_tok").alias("bin_tok"))
    above = bins.select(
        "score_bin",
        F.coalesce(
            F.sum("bin_tok").over(
                W.orderBy(F.desc("score_bin")).rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("tok_above"),
    )
    run = scored.join(F.broadcast(above), "score_bin").select(
        "doc_id",
        "n_tok",
        "score_bin",
        (
            F.col("tok_above")
            + F.sum("n_tok").over(
                W.partitionBy("score_bin")
                .orderBy("key", "doc_id")
                .rowsBetween(W.unboundedPreceding, 0)
            )
        ).alias("through_me"),
    )
    return (
        run.crossJoin(F.broadcast(budget))
        .select(
            "doc_id",
            "n_tok",
            F.col("score_bin").cast("bigint").alias("score_bin"),
            (F.col("through_me") <= F.col("b")).cast("int").alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---- p28: cross-split leakage report ---------------------------------------
# Eval hygiene for the p21 train/val/test split: near-duplicate pairs that
# STRADDLE splits are contamination — a val/test doc whose near-copy sits
# in train inflates every metric. This runs the d03 MinHash->LSH->Jaccard
# pipeline and reports only the straddling pairs, aggregated per split
# pair, plus how many distinct eval-side documents are compromised.
#
# Scale shape: identical to d03 (map-side signatures, one band-key
# shuffle, verification on candidates only) — the split label is a
# map-side md5 expression joined for free on the already-shuffled pair
# relation. The canonical production loop: run this BEFORE training; a
# nonzero val/test row routes the leaked doc_ids into the holdout rebuild.

_P28_ORACLE = None  # assembled below (reuses d03's oracle CTE machinery)


def _p28_oracle() -> str:
    from dbt_osmosis_spark.operators.dedup import _JACCARD_THRESHOLD, DUCK_LSH_CTES
    from dbt_osmosis_spark.operators.pipeline_ext import (
        _P21_BUCKET_DUCK,
        _P21_TRAIN,
        _P21_VAL,
    )

    split = (
        f"CASE WHEN {_P21_BUCKET_DUCK} < {_P21_TRAIN} THEN 'train' "
        f"WHEN {_P21_BUCKET_DUCK} < {_P21_VAL} THEN 'val' ELSE 'test' END"
    )
    return f"""
WITH {DUCK_LSH_CTES},
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sig x ON x.doc_id = c.doc_a
  JOIN sig y ON y.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
          / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))
        >= {_JACCARD_THRESHOLD}
),
labeled AS (
  SELECT v.doc_a, v.doc_b, sa.split AS split_a, sb.split AS split_b
  FROM verified v
  JOIN (SELECT doc_id, {split} AS split FROM documents) sa ON sa.doc_id = v.doc_a
  JOIN (SELECT doc_id, {split} AS split FROM documents) sb ON sb.doc_id = v.doc_b
  WHERE sa.split <> sb.split
)
SELECT least(split_a, split_b) AS split_lo,
       greatest(split_a, split_b) AS split_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT CASE WHEN split_a <> 'train' THEN doc_a
                                WHEN split_b <> 'train' THEN doc_b END)
            AS BIGINT) AS n_eval_docs_leaked
FROM labeled
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("p28_split_leakage", oracle=_p28_oracle())
def p28_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from dbt_osmosis_spark.operators.caching import keep_cached
    from dbt_osmosis_spark.operators.pipeline_ext import (
        _P21_BUCKET_SPARK,
        _P21_TRAIN,
        _P21_VAL,
    )

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    cand = lsh_candidate_pairs(lsh_bands(sig))
    x = sig.select(F.col("doc_id").alias("xid"), F.col("s").alias("xs"))
    y = sig.select(F.col("doc_id").alias("yid"), F.col("s").alias("ys"))
    inter = F.size(F.array_intersect(F.col("xs"), F.col("ys")))
    jac = inter.cast("double") / (F.size("xs") + F.size("ys") - inter)
    verified = (
        cand.join(x, F.col("doc_a") == F.col("xid"))
        .join(y, F.col("doc_b") == F.col("yid"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    split_expr = (
        f"CASE WHEN {_P21_BUCKET_SPARK} < {_P21_TRAIN} THEN 'train' "
        f"WHEN {_P21_BUCKET_SPARK} < {_P21_VAL} THEN 'val' ELSE 'test' END"
    )
    splits = docs.select("doc_id", F.expr(split_expr).alias("split"))
    labeled = (
        verified.join(
            splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    eval_doc = F.when(F.col("split_a") != "train", F.col("doc_a")).when(
        F.col("split_b") != "train", F.col("doc_b")
    )
    return (
        labeled.groupBy(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct(eval_doc).cast("bigint").alias("n_eval_docs_leaked"),
        )
        .orderBy("split_lo", "split_hi")
    )


# ---- p26: cluster-balanced diversity sampling (D4-style) -------------------
# After near-dup clustering, dropping all-but-one doc per cluster (d09)
# discards intra-cluster variation; keeping everything over-represents
# duplicated content. The published middle ground (D4: "Improving LLM
# Pretraining via Document De-Duplication and Diversification", Tirumala
# et al. 2023) samples INVERSELY to duplicate-cluster size: each doc keeps
# with p = 1/cluster_size, so every near-dup cluster contributes ~one
# expected representative while singletons always survive — duplicate
# density is flattened, not truncated.
#
# Determinism: the keep rule is exact integer math — u = 60-bit
# md5('p26#'||doc_id) < 2^60 DIV cluster_size — no float probabilities,
# so the SAME docs are kept across runs, partitionings, and engines (the
# oracle reproduces the rule bit-for-bit). Scale shape: the cluster
# machinery is the shared d06/d09 chain (band-key shuffle + hybrid CC);
# on top of it, one groupBy(component) count and one join on component —
# both partition on the same key, no new scan of text, no global sort.

def _p26_oracle() -> str:
    from dbt_osmosis_spark.operators.dedup import DUCK_LSH_CTES

    return f"""
WITH RECURSIVE {DUCK_LSH_CTES},
edges2 AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges2 e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
sized AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component
),
keyed AS (
  SELECT c.doc_id, c.component, s.cluster_size,
         CAST('0x' || substr(md5('p26#' || CAST(c.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS u
  FROM comp c JOIN sized s USING (component)
)
SELECT doc_id, component, cluster_size
FROM keyed
WHERE u < CAST({1 << 60} AS BIGINT) // cluster_size
ORDER BY doc_id
"""


@register("p26_cluster_balanced_sample", oracle=_p26_oracle())
def p26_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.pipeline import lsh_components

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    comp = lsh_components(docs)
    sized = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    from dbt_osmosis_spark.operators.text import SPARK_MD5INT

    u = F.expr(SPARK_MD5INT.format(x="concat('p26#', CAST(id AS STRING))"))
    return (
        comp.join(sized, "component")
        .withColumn("u", u)
        .filter(F.col("u") < F.expr(f"CAST({1 << 60} AS BIGINT) DIV cluster_size"))
        .select(F.col("id").alias("doc_id"), "component", "cluster_size")
        .orderBy("doc_id")
    )


# ---- p30: quality-aware canonical selection in near-dup clusters -----------
# d09 keeps the MIN-ID member of every near-dup cluster — fine for
# determinism, wrong for data value: production dedup (CCNet, RefinedWeb,
# FineWeb ablations) keeps the BEST copy, because near-dup clusters mix
# clean originals with boilerplate-wrapped or truncated variants. p30 is
# d09 with the production keep-rule: per connected component, keep the
# member with the highest t02 quality score (tie -> smallest doc_id).
#
# Scale shape: reuses the shared MinHash->LSH->hybrid-CC chain (the d06/
# d09 engine — no new corpus scan beyond the quality features), then ONE
# window over (component) to pick the representative; quality is exact
# integer ratios, so the rank order is engine-exact with no rounding.
# Reference analog: none (north-star dedup/pipeline family).

from dbt_osmosis_spark.operators.dedup import DUCK_LSH_CTES  # noqa: E402
from dbt_osmosis_spark.operators.pipeline import lsh_components  # noqa: E402
from dbt_osmosis_spark.operators.text import tokens  # noqa: E402

_P30_ORACLE = f"""
WITH RECURSIVE {DUCK_LSH_CTES},
edges2 AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges2 e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
feat AS (
  SELECT doc_id,
         (CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS DOUBLE) / len(w))
           + (CAST(len(list_filter(w, x -> len(x) >= 6)) AS DOUBLE) / len(w))
           + (CASE WHEN len(w) BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END)
           AS quality_score
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
  WHERE len(w) > 0
),
ranked AS (
  SELECT f.doc_id, c.component, f.quality_score,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY f.quality_score DESC, f.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.component) AS cluster_size
  FROM feat f JOIN comp c ON c.doc_id = f.doc_id
)
SELECT d.doc_id, CAST(r.cluster_size AS BIGINT) AS cluster_size,
       r.quality_score, d.lang, d.source
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rn = 1
ORDER BY d.doc_id
"""


@register("p30_quality_keep", oracle=_P30_ORACLE)
def p30_quality_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    tok = tokens()
    stop_ratio = F.expr(
        "CAST(size(filter(split(trim(text), ' '), x -> x IN ('the', 'a'))) AS DOUBLE)"
    ) / F.size(tok)
    long_ratio = F.expr(
        "CAST(size(filter(split(trim(text), ' '), x -> length(x) >= 6)) AS DOUBLE)"
    ) / F.size(tok)
    length_ok = F.when(F.size(tok).between(20, 80), 1.0).otherwise(0.0)
    feat = docs.filter(F.size(tok) > 0).select(
        "doc_id", (stop_ratio + long_ratio + length_ok).alias("quality_score")
    )
    comp = lsh_components(docs).select(
        F.col("id").alias("doc_id"), "component"
    )
    ranked = feat.join(comp, "doc_id")
    w = W.partitionBy("component").orderBy(F.desc("quality_score"), "doc_id")
    wn = W.partitionBy("component")
    kept = (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wn).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_size", "quality_score")
    )
    return (
        kept.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "cluster_size", "quality_score", "lang", "source")
        .orderBy("doc_id")
    )


# ---- p31: the composed corpus-hygiene pipeline, round-6 edition ------------
# p18 composes the r3-era steps (quality gate -> exact dedup -> exact
# shingle decontamination -> per-source cap). p31 is the same "one fused
# job" discipline over the round-6 hygiene chain a production run
# actually schedules:
#   1. hold out the benchmark set (it must never train),
#   2. Gopher-gate the training side (t12's published rules),
#   3. FUZZY-decontaminate: drop training docs near-duplicating any
#      benchmark item (the d17 stage, reused verbatim),
#   4. near-dup dedup keeping the BEST-quality representative per
#      cluster (the p30 rule) — dedup runs AFTER decontamination so
#      contaminated docs can't survive as cluster representatives.
# One Catalyst chain: the eval side broadcasts (d17), the anti-join keys
# on doc_id, the CC engine runs on the already-gated/cleaned subset
# (strictly smaller than the corpus), and the representative choice is
# one window over component. No step rescans text it already processed.
# Reference analog: none (north-star pipeline family, sibling of p18).

from dbt_osmosis_spark.operators.dedup import duck_lsh_side_ctes  # noqa: E402
from dbt_osmosis_spark.operators.dedup_ext import (  # noqa: E402
    _D17_EVAL_MOD,
    fuzzy_contamination_pairs,
)
from dbt_osmosis_spark.operators.pipeline import lsh_components  # noqa: E402
from dbt_osmosis_spark.operators.text_ext import gopher_features  # noqa: E402

_P31_TAU = 0.35  # same recall-leaning contamination bar as d17

_DUCK_W = "string_split(trim(text), ' ')"
_P31_GOPHER_PRED = (
    f"len({_DUCK_W}) BETWEEN 50 AND 100000"
    f" AND (CAST(list_sum(list_transform({_DUCK_W}, x -> len(x))) AS DOUBLE)"
    f"      / len({_DUCK_W})) BETWEEN 3.0 AND 10.0"
    f" AND (CAST(len(list_filter({_DUCK_W}, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)"
    f"      / len({_DUCK_W})) > 0.80"
    f" AND len(list_filter({_DUCK_W}, x -> x IN ('the', 'a'))) >= 2"
)

_P31_ORACLE = f"""
WITH RECURSIVE {duck_lsh_side_ctes("corp", f"doc_id % {_D17_EVAL_MOD} <> 0")},
{duck_lsh_side_ctes("ev", f"doc_id % {_D17_EVAL_MOD} = 0")},
ccand AS (
  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS eval_id
  FROM corp_bands a JOIN ev_bands b
    ON a.band = b.band AND a.band_key = b.band_key
),
contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM ccand c
  JOIN corp x ON x.doc_id = c.doc_id
  JOIN ev y ON y.doc_id = c.eval_id
  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
          / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= {_P31_TAU}
),
{duck_lsh_side_ctes(
    "cl",
    f"doc_id % {_D17_EVAL_MOD} <> 0 AND {_P31_GOPHER_PRED}"
    " AND doc_id NOT IN (SELECT doc_id FROM contaminated)",
)},
dcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cl_bands a JOIN cl_bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
edges2 AS (
  SELECT doc_a AS src, doc_b AS dst FROM dcand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM dcand
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM cl
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges2 e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
feat AS (
  SELECT c.doc_id, c.component,
         (CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS DOUBLE) / len(w))
           + (CAST(len(list_filter(w, x -> len(x) >= 6)) AS DOUBLE) / len(w))
           + (CASE WHEN len(w) BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END)
           AS quality_score
  FROM comp c JOIN (SELECT doc_id, {_DUCK_W} AS w FROM documents) d
    ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT doc_id, component, quality_score,
         row_number() OVER (PARTITION BY component
                            ORDER BY quality_score DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS cluster_size
  FROM feat
)
SELECT r.doc_id, CAST(r.cluster_size AS BIGINT) AS cluster_size,
       r.quality_score, d.lang, d.source
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rn = 1
ORDER BY r.doc_id
"""


@register("p31_decontaminated_corpus", oracle=_P31_ORACLE)
def p31_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % _D17_EVAL_MOD != 0)
    eval_docs = docs.filter(F.col("doc_id") % _D17_EVAL_MOD == 0)

    gated = (
        gopher_features(train)
        .filter(
            F.col("n_words").between(50, 100_000)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("frac_alpha") > 0.80)
            & (F.col("n_stopwords") >= 2)
        )
        .select("doc_id", "text", "lang", "source")
    )
    contaminated = (
        fuzzy_contamination_pairs(train, eval_docs).select("doc_id").distinct()
    )
    # Round 13 (guide §5, §1.2): `clean` feeds BOTH the LSH component
    # chain and the quality-feature branch; left lazy, the whole
    # upstream — gopher featurization of the corpus plus the
    # LSH-decontamination anti-join (itself two MinHash passes over the
    # corpus) — executed twice. Persist it once for the operator's span
    # (keep_cached releases it when the next operator starts).
    from dbt_osmosis_spark.operators.caching import keep_cached

    clean = gated.join(contaminated, "doc_id", "left_anti").transform(keep_cached)

    comp = lsh_components(clean).select(F.col("id").alias("doc_id"), "component")
    tok = F.split(F.trim(F.col("text")), " ")
    stop_ratio = F.expr(
        "CAST(size(filter(split(trim(text), ' '), x -> x IN ('the', 'a'))) AS DOUBLE)"
    ) / F.size(tok)
    long_ratio = F.expr(
        "CAST(size(filter(split(trim(text), ' '), x -> length(x) >= 6)) AS DOUBLE)"
    ) / F.size(tok)
    length_ok = F.when(F.size(tok).between(20, 80), 1.0).otherwise(0.0)
    feat = clean.select(
        "doc_id",
        "lang",
        "source",
        (stop_ratio + long_ratio + length_ok).alias("quality_score"),
    ).join(comp, "doc_id")
    w = W.partitionBy("component").orderBy(F.desc("quality_score"), "doc_id")
    wn = W.partitionBy("component")
    return (
        feat.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wn).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_size", "quality_score", "lang", "source")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# p32: incremental corpus statistics — mergeable partial-aggregate state
# --------------------------------------------------------------------------
# A 100 TB corpus is never re-scanned to refresh its dashboard: each ingest
# batch contributes a PARTIAL state, and the report is a merge of partials.
# That only works if every statistic is algebraic (sum/count/max merge by
# sum/sum/max) — and the one that is NOT (distinct languages per source)
# becomes mergeable by keeping state at the finer (source, lang) grain and
# counting grain rows at report time. p32 exercises exactly that contract:
# the corpus is processed as two disjoint batches (doc_id parity), each
# reduced to (source, lang) partials map-side, the partials merged, and
# the merged report must equal the oracle's single-scan GROUP BY — the
# proof that batch boundaries never leak into the numbers.
#
# Scale shape: each batch's partial agg is one partial-aggregated shuffle
# on (source, lang) — at steady state only the NEW batch is scanned; the
# stored partial table (|sources| x |langs| rows) unions in for free. No
# distinct-aggregation over history, no re-scan, no global anything.

_P32_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       floor(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_chars,
       MAX(n_chars) AS max_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


def partial_stats(batch: DataFrame) -> DataFrame:
    """One batch's mergeable state: algebraic sums/counts/max at the
    (source, lang) grain."""
    return batch.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(18,0)")).alias("sum_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def merge_stats(partials: DataFrame) -> DataFrame:
    """Merge any number of partial-state frames (pre-unioned) into the
    per-source report. Distinct languages = COUNT of merged grain rows."""
    merged = partials.groupBy("source", "lang").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_chars").alias("sum_chars"),
        F.max("max_chars").alias("max_chars"),
    )
    total = F.sum("sum_chars").cast("bigint")
    n = F.sum("n_docs").cast("bigint")
    return (
        merged.groupBy("source")
        .agg(
            n.alias("n_docs"),
            total.alias("total_chars"),
            F.floor(
                total.cast("double") / n.cast("double") * F.lit(1e6) + F.lit(0.5)
            ).cast("double").alias("avg_chars_e6"),
            F.max("max_chars").alias("max_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            (F.col("avg_chars_e6") / F.lit(1e6)).alias("avg_chars"),
            "max_chars",
            "n_langs",
        )
    )


@register("p32_incremental_stats", oracle=_P32_ORACLE)
def p32_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    batch_a = partial_stats(docs.filter(F.col("doc_id") % 2 == 0))
    batch_b = partial_stats(docs.filter(F.col("doc_id") % 2 == 1))
    return merge_stats(batch_a.unionByName(batch_b)).orderBy("source")


# --------------------------------------------------------------------------
# p33: key-skew report — the diagnostic you run BEFORE choosing a salt
# --------------------------------------------------------------------------
# Every skew mitigation in this tree (salting, AQE skew join, adaptive key
# widths) starts from the same question: how hot is the hottest key? p33
# answers it per event_type over the events stream: row/key counts, the
# heaviest key's share, and max/mean ratio — all from ONE partial-aggregated
# shuffle on (event_type, user_id) plus tiny per-type rollups. The heavy
# key itself is identified deterministically (smallest user_id among the
# maxima) by joining the broadcast per-type max back to the counts frame.
# skew_ratio = max*n_keys/n_rows is integer math until one final pinned
# rounding, so the report value-hashes across engines.

_P33_ORACLE = """
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY event_type, user_id
),
per_type AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         COUNT(*) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_key_rows
  FROM counts GROUP BY event_type
),
top AS (
  SELECT c.event_type, MIN(c.user_id) AS top_user_id
  FROM counts c JOIN per_type p
    ON c.event_type = p.event_type AND c.c = p.max_key_rows
  GROUP BY c.event_type
)
SELECT p.event_type, p.n_rows, p.n_keys, p.max_key_rows, t.top_user_id,
       floor(CAST(p.max_key_rows * p.n_keys AS DOUBLE) / p.n_rows * 1e6 + 0.5) / 1e6
         AS skew_ratio
FROM per_type p JOIN top t ON p.event_type = t.event_type
ORDER BY p.event_type
"""


@register("p33_skew_report", oracle=_P33_ORACLE)
def p33_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_parquet(spark, f"{sf_dir}/events.parquet")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    per_type = counts.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").cast("bigint").alias("max_key_rows"),
    )
    top = (
        counts.join(
            F.broadcast(per_type.select("event_type", "max_key_rows")),
            ["event_type"],
        )
        .filter(F.col("c") == F.col("max_key_rows"))
        .groupBy("event_type")
        .agg(F.min("user_id").alias("top_user_id"))
    )
    ratio = (
        F.floor(
            (F.col("max_key_rows") * F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        / F.lit(1e6)
    )
    return (
        per_type.join(F.broadcast(top), "event_type")
        .select(
            "event_type", "n_rows", "n_keys", "max_key_rows", "top_user_id",
            ratio.alias("skew_ratio"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# p34: per-group top-k under extreme group skew — two-phase salted window
# --------------------------------------------------------------------------
# "Top vocabulary PER LANGUAGE" has a pathological shape at scale: only
# |langs| (~5) groups, so a row_number() OVER (PARTITION BY lang) window
# funnels the whole vocabulary through 5 reducers — the window twin of the
# low-cardinality-key hotspot p33 measures. The fix is the classic salted
# two-phase: rank within (lang, salt) buckets in parallel — any
# deterministic salt of the WORD is correct, because each word's total
# count is already final before salting, every word lives in exactly one
# bucket, and a global top-k member is necessarily a top-k member of its
# own bucket — then re-rank only the |langs| x _P34_SALTS x k surviving
# candidates in the cheap final window. The salt function never needs
# cross-engine agreement: it shapes intermediate candidate sets only, and
# the final re-rank restores the exact answer (asserted by the oracle,
# which computes the single-window form directly).
#
# Scale shape: one well-spread shuffle on (lang, word) for the counts, a
# (lang, salt)-partitioned window (parallelism = |langs| x 32), and a
# final window over <= |langs| x 32 x k rows. No 5-reducer stage anywhere.

_P34_TOPK = 10
_P34_SALTS = 32

_P34_ORACLE = f"""
WITH words AS (
  SELECT lang, unnest({{tok}}) AS word FROM documents
),
counts AS (
  SELECT lang, word, COUNT(*) AS n FROM words GROUP BY lang, word
),
ranked AS (
  SELECT lang, word, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rn
  FROM counts
)
SELECT lang, CAST(rn AS INT) AS rnk, word, n
FROM ranked WHERE rn <= {_P34_TOPK}
ORDER BY lang, rnk
""".format(tok="string_split(trim(text), ' ')")


@register("p34_salted_topk", oracle=_P34_ORACLE)
def p34_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.text import tokens

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    counts = (
        spread(docs)
        .select("lang", F.explode(tokens()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = counts.withColumn(
        "salt", F.pmod(F.conv(F.substring(F.md5("word"), 1, 6), 16, 10).cast("long"), F.lit(_P34_SALTS))
    )
    pre = W.partitionBy("lang", "salt").orderBy(F.desc("n"), "word")
    cand = (
        salted.withColumn("prn", F.row_number().over(pre))
        .filter(F.col("prn") <= _P34_TOPK)
        .drop("prn", "salt")
    )
    final = W.partitionBy("lang").orderBy(F.desc("n"), "word")
    return (
        cand.withColumn("rnk", F.row_number().over(final))
        .filter(F.col("rnk") <= _P34_TOPK)
        .select("lang", "rnk", "word", "n")
        .orderBy("lang", "rnk")
    )


# ---- p35: DoReMi-style domain reweighting ---------------------------------
# Mixture design with a loss signal (Xie et al., "DoReMi", 2023): domains
# whose text is HARDER for a reference model than the corpus floor get
# up-weighted (they carry more learnable signal); trivially-easy domains
# get only their size share. The proxy reference model here is t13's
# corpus-trained add-alpha bigram LM — per-source mean negative
# log-likelihood stands in for the per-domain excess loss, and the weight
# is w_s ∝ n_bigrams_s · 2^(excess_s), normalized (the exponential-of-
# excess form of DoReMi's multiplicative-weights update, one step from
# the size-proportional prior).
#
# Determinism: per-bigram log-probs quantize to exact ints (t13's move);
# the per-source MEAN quantizes to integer micro-bits with a single IEEE
# division of exact ints; the excess is then an exact integer difference,
# and the normalization denominator sums exact quantized weights — no
# float accumulation anywhere an order could vary. The one transcendental
# (pow(2, excess)) is a single scalar op per source, absorbed by the 1e-3
# weight quantization + round(6) like t11's log2.
#
# Scale shape: the model build is t13's two partial-agg shuffles; scoring
# re-joins bigrams against the (broadcastable) model; everything after
# the per-source aggregate runs on |sources| rows (~20) — the final
# min/sum "windows" are over the source dimension, never the corpus.

_P35_ALPHA = 0.5  # add-alpha smoothing (t13's constant)

_P35_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
big AS (
  SELECT doc_id, source, w[i] AS a, w[i + 1] AS b
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
c2 AS (SELECT a, b, COUNT(*) AS n2 FROM big GROUP BY a, b),
c1 AS (SELECT a, SUM(n2) AS n1 FROM c2 GROUP BY a),
vocab AS (SELECT COUNT(DISTINCT b) AS v FROM c2),
scored AS (
  SELECT g.source,
         floor(log2((c2.n2 + {_P35_ALPHA}) / (c1.n1 + {_P35_ALPHA} * vocab.v)) * 1e9 + 0.5) AS qlp
  FROM big g
  JOIN c2 ON g.a = c2.a AND g.b = c2.b
  JOIN c1 ON g.a = c1.a
  CROSS JOIN vocab
),
per_src AS (
  SELECT source,
         COUNT(*) AS n_bigrams,
         CAST(floor(-CAST(SUM(CAST(qlp AS DECIMAL(28,0))) AS DOUBLE)
                    / (COUNT(*) * 1000.0) + 0.5) AS BIGINT) AS loss_ubits
  FROM scored GROUP BY source
),
floored AS (
  SELECT source, n_bigrams, loss_ubits,
         loss_ubits - MIN(loss_ubits) OVER () AS excess_ubits
  FROM per_src
),
quantized AS (
  SELECT source, n_bigrams, loss_ubits, excess_ubits,
         CAST(floor(n_bigrams * pow(2.0, excess_ubits / 1e6) * 1000 + 0.5)
              AS BIGINT) AS qw
  FROM floored
)
SELECT source, n_bigrams, loss_ubits, excess_ubits,
       round(CAST(qw AS DOUBLE) / SUM(qw) OVER (), 6) AS weight
FROM quantized
ORDER BY source
"""


@register("p35_doremi_weights", oracle=_P35_ORACLE)
def p35_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), " ").alias("w")
    ).filter(F.size("w") >= 2)
    big = toks.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> struct("
                "element_at(w, i) AS a, element_at(w, i + 1) AS b))"
            )
        ).alias("g"),
    ).select("source", "g.a", "g.b")
    c2 = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("a").agg(F.sum("n2").alias("n1"))
    vocab = c2.agg(F.countDistinct("b").alias("v"))
    scored = (
        big.join(F.broadcast(c2), ["a", "b"])
        .join(F.broadcast(c1), "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            F.expr(
                f"floor(log2((n2 + {_P35_ALPHA}) / (n1 + {_P35_ALPHA} * v)) * 1e9 + 0.5)"
            ).alias("qlp"),
        )
    )
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr(
            "CAST(floor(-CAST(SUM(CAST(qlp AS DECIMAL(28,0))) AS DOUBLE)"
            " / (COUNT(*) * 1000.0) + 0.5) AS BIGINT)"
        ).alias("loss_ubits"),
    )
    # |sources| rows from here on — the unpartitioned windows are over the
    # source dimension only (~20 rows), never the corpus.
    all_w = W.partitionBy()
    floored = per_src.withColumn(
        "excess_ubits", F.col("loss_ubits") - F.min("loss_ubits").over(all_w)
    )
    quantized = floored.withColumn(
        "qw",
        F.expr(
            "CAST(floor(n_bigrams * pow(2.0, excess_ubits / 1e6) * 1000 + 0.5) AS BIGINT)"
        ),
    )
    return (
        quantized.select(
            "source",
            "n_bigrams",
            "loss_ubits",
            "excess_ubits",
            F.round(
                F.col("qw").cast("double") / F.sum("qw").over(all_w), 6
            ).alias("weight"),
        )
        .orderBy("source")
    )
