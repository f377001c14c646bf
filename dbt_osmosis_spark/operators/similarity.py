"""Similarity search over embedding columns (array<float>).

Numeric determinism: both Spark's ``aggregate`` and DuckDB's ``list_sum``
left-fold sequentially over the array, so dot products over double-cast
arrays are bit-identical across engines (verified empirically) — cosine
scores need no rounding for oracle parity.

Scale design:
- **brute-force top-k** (s01): the query vector is a broadcast scalar; the
  scan is map-side; ``orderBy(desc).limit(k)`` plans as per-partition top-k
  + tiny merge (TakeOrderedAndProject). Linear scan, perfect pushdown — the
  right baseline even at 10^9 vectors when k is small.
- **random-hyperplane LSH** (s02): P sign-bits per vector (map-side);
  candidates share the query's bucket → exact re-rank of a tiny candidate
  set. The 100 TB path: bucket cardinality ~n/2^P, re-rank cost independent
  of corpus size. Planes are md5-derived pseudo-random constants, so the
  whole pipeline — bucketing included — is oracle-checkable.
- **label centroids** (s03): vector-valued aggregation via posexplode +
  decimal-sum per (label, dim) — the order-independent way to average
  vectors on a cluster (a plain avg of doubles would drift run-to-run).
- **batched kNN via Arrow** (s04, tests only): mapInPandas + numpy matmul —
  the pattern for *many* queries at once, where per-row folds lose to BLAS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_K = 10
_DIM = 64
_QUERY_ID = 0

_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_SPARK_NORM2 = "aggregate(transform({a}, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

_DUCK_DOT = "list_sum(list_transform(range(1, {n} + 1), i -> ({a})[i] * ({b})[i]))"
_DUCK_NORM2 = "list_sum(list_transform({a}, x -> x * x))"


# ---- s01: brute-force cosine top-k ----------------------------------------

_S01_ORACLE = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {_QUERY_ID}
),
scored AS (
  SELECT e.vec_id, e.label,
         {_DUCK_DOT.format(a="e.embedding::DOUBLE[]", b="q.qv", n=_DIM)}
           / (sqrt({_DUCK_NORM2.format(a="e.embedding::DOUBLE[]")})
              * sqrt({_DUCK_NORM2.format(a="q.qv")})) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> {_QUERY_ID}
)
SELECT vec_id, label, cosine
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT {_K}
"""


@register("s01_cosine_topk", oracle=_S01_ORACLE)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(F.col("v").alias("qv"))
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))
    return (
        emb.filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_K)
    )


# ---- s02: random-hyperplane LSH bucket + exact re-rank ---------------------
# Plane p, dim d constant: (md5int(p ',' d) % 2001 - 1000) / 1000 ∈ [-1, 1].

# P sizes the bucket count (2^P). 4 keeps ~1/16 of the corpus as candidates —
# right for the 500-5000-vector testdata; at 10^9 vectors you'd raise P (and
# probe neighboring buckets for recall).
_P = 4

_SPARK_PLANE = (
    "transform(sequence(0, {dim} - 1), d -> "
    "(CAST(conv(substr(md5(cast(concat(CAST({p} AS STRING), ',', CAST(d AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000) / 1000.0)"
)
_DUCK_PLANE = (
    "list_transform(range(0, {dim}), d -> "
    "(CAST('0x' || substr(md5(CAST({p} AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000) / 1000.0)"
)

_SPARK_BUCKET = (
    f"aggregate(sequence(0, {_P - 1}), CAST(0 AS BIGINT), (acc, p) -> acc + "
    f"CASE WHEN {_SPARK_DOT.format(a='v', b=_SPARK_PLANE.format(p='p', dim=_DIM))} > 0 "
    f"THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)"
)
_DUCK_BUCKET = (
    f"list_aggregate(list_transform(range(0, {_P}), p -> "
    f"CASE WHEN {_DUCK_DOT.format(a='v', b=_DUCK_PLANE.format(p='p', dim=_DIM), n=_DIM)} > 0 "
    f"THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END), 'sum')"
)

_S02_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, label, v, {_DUCK_BUCKET} AS bucket FROM vecs
),
q AS (
  SELECT v AS qv, bucket AS qbucket FROM bucketed WHERE vec_id = {_QUERY_ID}
),
cand AS (
  SELECT b.vec_id, b.label, b.v, q.qv
  FROM bucketed b, q
  WHERE b.bucket = q.qbucket AND b.vec_id <> {_QUERY_ID}
)
SELECT vec_id, label,
       {_DUCK_DOT.format(a="v", b="qv", n=_DIM)}
         / (sqrt({_DUCK_NORM2.format(a="v")}) * sqrt({_DUCK_NORM2.format(a="qv")})) AS cosine
FROM cand
ORDER BY cosine DESC, vec_id
LIMIT {_K}
"""


@register("s02_lsh_ann_topk", oracle=_S02_ORACLE)
def s02_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    bucketed = emb.select("vec_id", "label", "v", F.expr(_SPARK_BUCKET).alias("bucket"))
    q = bucketed.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))
    return (
        bucketed.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != _QUERY_ID))
        .select("vec_id", "label", (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_K)
    )


# ---- s03: per-label centroids (order-independent vector mean) --------------

# Determinism note: decimal-casting doubles is NOT cross-engine-safe here —
# float32-origin values can land exactly on a rounding tie at any fixed
# scale, and Spark rounds HALF_UP while DuckDB rounds HALF_EVEN. Instead
# both engines left-fold the *sorted* value list: same multiset + same order
# + same IEEE adds = bit-identical, at any partitioning.
_S03_ORACLE = f"""
WITH comp AS (
  SELECT label, d AS pos, (embedding::DOUBLE[])[d + 1] AS x
  FROM embeddings, (SELECT unnest(range(0, {_DIM})) AS d)
),
means AS (
  SELECT label, pos,
         list_reduce(list(x ORDER BY x), (a, b) -> a + b) / COUNT(*) AS m
  FROM comp GROUP BY label, pos
)
SELECT label, list(m ORDER BY pos) AS centroid, COUNT(*) AS dim
FROM means GROUP BY label ORDER BY label
"""


@register("s03_label_centroids", oracle=_S03_ORACLE)
def s03_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    means = comp.groupBy("label", "pos").agg(
        (
            F.expr(
                "aggregate(array_sort(collect_list(x)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            / F.count(F.lit(1))
        ).alias("m")
    )
    return (
        means.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
            ).alias("centroid"),
            F.count(F.lit(1)).alias("dim"),
        )
        .orderBy("label")
    )


# ---- s04: Arrow-batched brute-force kNN (the many-queries pattern) ---------
# Not oracle-registered (numpy reduction order ≠ sequential fold); verified
# against s01's result in tests. This is the shape you use when there are
# thousands of query vectors: per-partition numpy matmul via mapInPandas.


def knn_batch(
    spark: SparkSession, sf_dir: str, query_ids: list[int], k: int = _K
) -> DataFrame:
    import pandas as pd

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qrows = queries.collect()  # small: |query_ids| rows, broadcast below
    import numpy as np

    qmat = np.array([r.qv for r in qrows], dtype=np.float64)
    qids = np.array([r.query_id for r in qrows])
    qnorm = np.linalg.norm(qmat, axis=1)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def score(batches):
        ids, qm, qn = bc.value
        for pdf in batches:
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            cos = (m @ qm.T) / np.outer(norms, qn)
            out = []
            for qi, qid in enumerate(ids):
                for ri in range(len(pdf)):
                    if pdf["vec_id"].iloc[ri] != qid:
                        out.append((int(qid), int(pdf["vec_id"].iloc[ri]), float(cos[ri, qi])))
            yield pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# ---- s05: IVF (inverted-file) ANN — coarse quantize, probe, re-rank --------
# The other classic ANN scale path next to LSH (s02): k-means centroids
# partition the corpus into cells; a query probes only the `nprobe` nearest
# cells and re-ranks those candidates exactly. Spark layout:
#   train: KMeans on a bounded sample (driver-coordinated, executors do the
#          heavy lifting); centroids are a tiny broadcast model.
#   index: one map-side pass assigns every vector its cell id — persisted
#          with the data, so queries shuffle nothing.
#   query: centroid distances on the driver (k values), candidate scan
#          prunes to ~nprobe/k of the corpus, exact top-k merge.
# Registered WITHOUT an oracle (k-means floats are not cross-engine
# reproducible); the driver does the rows-only check, and the recall test in
# tests/test_pipeline_ops.py compares against s01's exact ground truth.


def _ivf_index(emb: DataFrame, n_cells: int, seed: int = 42):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select("vec_id", array_to_vector(F.col("v")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    assigned = model.transform(train).select(
        "vec_id", F.col("prediction").alias("cell")
    )
    return model, emb.join(assigned, "vec_id")


@register("s05_ivf_topk")
def s05_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    n_cells, nprobe = 16, 4
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    model, indexed = _ivf_index(emb, n_cells)

    qrow = emb.filter(F.col("vec_id") == _QUERY_ID).select("v").head()
    qv = np.array(qrow.v)
    centers = model.clusterCenters()
    probe = sorted(
        range(len(centers)), key=lambda c: float(np.linalg.norm(centers[c] - qv))
    )[:nprobe]

    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(F.col("v").alias("qv"))
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))
    return (
        indexed.filter(F.col("cell").isin(probe) & (F.col("vec_id") != _QUERY_ID))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_K)
    )
