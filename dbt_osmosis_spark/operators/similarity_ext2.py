"""Similarity extensions II: radius (range) search and hard-negative mining.

Reference analog: none (dbt-osmosis has no vector plane); these extend the
engine's ANN family (similarity.py) with the two retrieval shapes a
training-data pipeline needs beyond top-k:

- **s22 radius search** — "everything within cosine >= tau of the query
  batch", the primitive behind near-duplicate audit trails and
  contrastive-pair mining where the NUMBER of neighbors matters, not a
  fixed k. The query batch is a broadcast scalar side; the corpus scan is
  one map-side pass (filter fuses into the scan projection), and only
  rows inside the radius ever leave an executor — output-bound, not
  corpus-bound. At 10^9 vectors the same plan holds; to also cut the
  SCANNED set you put s15's LSH bucket bound in front (the composition is
  exactly s15 with the top-k window replaced by this filter).
- **s23 hard-negative mining** — per query, the k nearest vectors with a
  DIFFERENT label: the standard negative-sampling step for contrastive /
  metric learning (highest-similarity wrong-label examples are the
  gradient-richest negatives). Same broadcast-scan shape; the per-query
  top-k is a window over query-batch-sized partitions (8 keys), never the
  corpus.

Numeric determinism: both scores use the sequential left-fold dot product
(similarity.py's _SPARK_DOT / _DUCK_DOT), bit-identical across engines, so
no rounding is needed for the radius FILTER or the rank ORDER; the emitted
cosine is rounded to 1e-6 for display-hash stability only after all
decisions are made.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.similarity import (
    _DIM,
    _DUCK_DOT,
    _DUCK_NORM2,
    _SPARK_DOT,
    _SPARK_NORM2,
)
from dbt_osmosis_spark.sources.parquet import read_parquet

_N_QUERIES = 8  # vec_id < 8 is the fixed query batch (s04/s15 convention)
_TAU = 0.3  # radius: sf0.01 yields ~33 pairs, sf0.1 proportionally more
_K_NEG = 5  # hard negatives per query

_SPARK_COS = (
    f"{_SPARK_DOT.format(a='v', b='qv')}"
    f" / (sqrt({_SPARK_NORM2.format(a='v')}) * sqrt({_SPARK_NORM2.format(a='qv')}))"
)
_DUCK_COS = (
    f"{_DUCK_DOT.format(a='e.v', b='q.qv', n=_DIM)}"
    f" / (sqrt({_DUCK_NORM2.format(a='e.v')}) * sqrt({_DUCK_NORM2.format(a='q.qv')}))"
)


def _batch_scan(spark: SparkSession, sf_dir: str):
    """(corpus df with v, broadcast query df with query_id/qv/qlabel)."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    return emb, q


# ---- s22: cosine radius search ---------------------------------------------

_S22_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id, e.label, {_DUCK_COS} AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, label,
       round(cos, 6) AS cosine
FROM scored
WHERE cos >= {_TAU}
ORDER BY query_id, vec_id
"""


@register("s22_radius_search", oracle=_S22_ORACLE)
def s22_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _batch_scan(spark, sf_dir)
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "label", F.expr(_SPARK_COS).alias("cos")
        )
    )
    return (
        scored.filter(F.col("cos") >= _TAU)
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "vec_id")
    )


# ---- s23: hard-negative mining ---------------------------------------------

_S23_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, label AS qlabel, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id, e.label, {_DUCK_COS} AS cos
  FROM e, q
  WHERE e.label <> q.qlabel
),
ranked AS (
  SELECT query_id, vec_id, label, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id) AS rk
  FROM scored
)
SELECT query_id, vec_id, label, CAST(rk AS INT) AS rank,
       round(cos, 6) AS cosine
FROM ranked
WHERE rk <= {_K_NEG}
ORDER BY query_id, rank
"""


@register("s23_hard_negatives", oracle=_S23_ORACLE)
def s23_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _batch_scan(spark, sf_dir)
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "query_id", "vec_id", "label", F.expr(_SPARK_COS).alias("cos")
        )
    )
    rk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= _K_NEG)
        .select(
            "query_id",
            "vec_id",
            "label",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )
