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
- **batched kNN via Arrow** (s04): mapInPandas + numpy matmul — the pattern
  for *many* queries at once, where per-row folds lose to BLAS; oracle-exact
  via 1e-6 half-up score quantization applied before ranking.
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

# P sizes the bucket count (2^P). 4 keeps ~1/16 of the corpus per bucket —
# right for the 500-5000-vector testdata; at 10^9 vectors you'd raise P.
# MULTI-PROBE: the query probes its own bucket plus every bucket at sign-
# Hamming distance 1 (P+1 buckets total) — the standard recall lever
# (Lv et al., "Multi-Probe LSH", VLDB 2007): a true neighbor that falls
# on the wrong side of ONE hyperplane is still found. s12's in-engine
# recall eval is the evidence: single-bucket probing measured recall@10 =
# 0.0 on this corpus; distance-1 probing recovers the neighbors while
# still scanning only (P+1)/2^P ≈ 31% of it (shrinking as P grows).
# The probe set explodes on the QUERY side (P+1 rows) and equi-joins the
# bucketed corpus on the bucket key — the join stays hash/broadcast,
# never a scan-side IN-list, so the shape survives a batched query set.
_P = 4

# The plane/centroid constants are md5-derived and DATA-INDEPENDENT, so
# they are computed ONCE here on the driver and inlined as double literals
# in both engines' SQL. The formula-in-SQL variant (md5 inside the lambda)
# is NOT constant-folded by either engine — it re-hashed every (plane, dim)
# pair per ROW (256-3000+ md5 calls/row), which dominated every IVF/LSH
# operator's runtime; literal inlining removed ~9 s/2000 rows of pure
# constant recomputation at sf0.1. Value identity with the old formula is
# asserted by test_plans/test_properties (repr round-trips the exact
# double; (n % 2001 - 1000)/1000.0 is the same IEEE op in Python, Spark
# and DuckDB — verified element-wise).


def _md5int60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _plane_val(p: int, d: int) -> float:
    return (_md5int60(f"{p},{d}") % 2001 - 1000) / 1000.0


def _spark_dlit(vals: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in vals) + ")"


def _duck_dlit(vals: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in vals) + "]"


_PLANE_VALS = [[_plane_val(p, d) for d in range(_DIM)] for p in range(_P)]

_SPARK_BUCKET = (
    "("
    + " + ".join(
        f"CASE WHEN {_SPARK_DOT.format(a='v', b=_spark_dlit(_PLANE_VALS[p]))} > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for p in range(_P)
    )
    + ")"
)
_DUCK_BUCKET = (
    "("
    + " + ".join(
        f"CASE WHEN {_DUCK_DOT.format(a='v', b=_duck_dlit(_PLANE_VALS[p]), n=_DIM)} > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for p in range(_P)
    )
    + ")"
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
probes AS (
  SELECT qv, unnest([qbucket] || list_transform(range(0, {_P}),
                    j -> xor(qbucket, CAST(1 AS BIGINT) << j))) AS bucket
  FROM q
),
cand AS (
  SELECT b.vec_id, b.label, b.v, p.qv
  FROM bucketed b JOIN probes p ON b.bucket = p.bucket
  WHERE b.vec_id <> {_QUERY_ID}
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
    probes = q.select(
        "qv",
        F.explode(
            F.expr(
                f"concat(array(qbucket), transform(sequence(0, {_P} - 1),"
                f" j -> qbucket ^ shiftleft(CAST(1 AS BIGINT), j)))"
            )
        ).alias("bucket"),
    )
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))
    return (
        bucketed.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != _QUERY_ID)
        .select("vec_id", "label", (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_K)
    )


# ---- s03: per-label centroids (order-independent vector mean) --------------

# Determinism design: float addition is not associative, and decimal-casting
# raw doubles is not cross-engine-safe either (float32-origin dyadics like
# k*2^-13 land exactly on a .5 rounding tie at fixed decimal scale, where
# Spark rounds HALF_UP and DuckDB HALF_EVEN). So each component is first
# quantized to an exact INTEGER with an explicit half-up floor —
# floor(x * 1e9 + 0.5) is the same IEEE double op sequence in both engines,
# so the integer is identical everywhere — then summed as DECIMAL(38,0):
# integer addition is associative, so the sum is exact and independent of
# partitioning/merge order, and Spark plans it as a map-side partial agg
# with one shuffle on (label, pos). Per-group state is a single accumulator;
# nothing is materialized per group. This is the 100 TB plan, not a
# small-data stand-in.
_S03_ORACLE = f"""
WITH comp AS (
  SELECT label, d AS pos, (embedding::DOUBLE[])[d + 1] AS x
  FROM embeddings, (SELECT unnest(range(0, {_DIM})) AS d)
)
SELECT label, CAST(pos AS INT) AS pos,
       CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS DECIMAL(28,0))) AS DOUBLE)
         / COUNT(*) / 1e9 AS m
FROM comp GROUP BY label, pos
ORDER BY label, pos
"""


@register("s03_label_centroids", oracle=_S03_ORACLE)
def s03_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output is flattened to one row per (label, pos) — the harness canonical
    hash cannot sort array cells, and the flat shape is also what a writer
    would partition on. Reassemble with collect_list(struct(pos, m)) if a
    vector column is needed downstream.

    The mean is over 1e-9-quantized components (exact associative integer
    sum — see the determinism note above); for the unquantized float mean
    use label_centroid_means.
    """
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    return (
        comp.groupBy("label", "pos")
        .agg(
            (
                F.expr("CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS DECIMAL(28,0))) AS DOUBLE)")
                / F.count(F.lit(1))
                / F.lit(1e9)
            ).alias("m")
        )
        .orderBy("label", "pos")
    )


def label_centroid_means(emb: DataFrame) -> DataFrame:
    """Scale path for s03: plain avg per (label, pos) — map-side partial agg,
    one shuffle, no collect_list materialization. Values drift by float
    reduction order run-to-run (~1e-15 relative), which is fine everywhere
    except the bit-exact oracle harness."""
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    return comp.groupBy("label", "pos").agg(F.avg("x").alias("m"))


# ---- s04: Arrow-batched brute-force kNN (the many-queries pattern) ---------
# Oracle-registered via quantized scores: numpy's pairwise/SIMD reduction
# order differs from DuckDB's sequential fold only at ~1e-15 relative, so
# both engines emit floor(cosine * 1e6 + 0.5) / 1e6 (explicit half-up —
# engines' round() rounding modes differ) and rank on the ROUNDED value with
# a vec_id tie-break. Quantizing BEFORE top-k selection makes the ranking
# itself engine- and partitioning-independent. This is the shape you use
# when there are thousands of query vectors: per-partition numpy matmul via
# mapInPandas — BLAS beats per-row folds by orders of magnitude.


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
        # Fully columnar: matmul for all scores, then per-query top-k
        # *inside the partition*. Only p×q×k rows leave the Python worker
        # (vs n×q for the naive emit), so the downstream window shuffle is
        # tiny and independent of corpus size. Per-batch selection uses
        # lexsort on (-cosine, vec_id) — the SAME tie-break the global
        # window applies — so a cosine tie at the batch boundary keeps the
        # row the final ranking would keep (argpartition's arbitrary tie
        # handling would make the output partitioning-dependent).
        ids, qm, qn = bc.value
        nq = len(ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            vids = pdf["vec_id"].to_numpy()
            norms = np.linalg.norm(m, axis=1)
            cos = (m @ qm.T) / np.outer(norms, qn)  # (rows, nq)
            # Quantize to 1e-6 (half-up, same formula as the oracle) BEFORE
            # selection so rank order can't depend on sub-1e-6 float noise.
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            # mask self-matches before top-k selection
            cos[vids[:, None] == ids[None, :]] = -np.inf
            kk = min(k, len(pdf))
            out_q, out_r = [], []
            for qi in range(nq):
                order = np.lexsort((vids, -cos[:, qi]))[:kk]
                out_q.append(np.full(kk, qi))
                out_r.append(order)
            q_idx = np.concatenate(out_q)
            r_idx = np.concatenate(out_r)
            sel = cos[r_idx, q_idx]
            keep = np.isfinite(sel)
            yield pd.DataFrame(
                {
                    "query_id": ids[q_idx[keep]],
                    "vec_id": vids[r_idx[keep]],
                    "cosine": sel[keep],
                }
            )

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


_S04_IDS = (_QUERY_ID, _QUERY_ID + 1, _QUERY_ID + 2)

_S04_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN {_S04_IDS}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         floor(({_DUCK_DOT.format(a="e.embedding::DOUBLE[]", b="q.qv", n=_DIM)}
           / (sqrt({_DUCK_NORM2.format(a="e.embedding::DOUBLE[]")})
              * sqrt({_DUCK_NORM2.format(a="q.qv")}))) * 1e6 + 0.5) / 1e6 AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cosine
FROM ranked WHERE rn <= {_K}
ORDER BY query_id, cosine DESC, vec_id
"""


@register("s04_knn_batch", oracle=_S04_ORACLE)
def s04_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-queries kNN with a full value-hash oracle: both engines rank on
    the 1e-6-quantized cosine (explicit half-up floor, vec_id tie-break), so
    the sub-1e-6 difference between numpy's blocked reduction and DuckDB's
    sequential fold cannot change either the ranking or the emitted values."""
    return knn_batch(spark, sf_dir, query_ids=list(_S04_IDS))


# ---- s05: IVF (inverted-file) ANN — coarse quantize, probe, re-rank --------
# The other classic ANN scale path next to LSH (s02): coarse centroids
# partition the corpus into cells; a query probes only the `nprobe` nearest
# cells and re-ranks those candidates exactly. Spark layout:
#   index: one map-side pass assigns every vector its nearest-centroid cell
#          id — persisted with the data, so queries shuffle nothing.
#   query: centroid distances are k scalar folds, the candidate scan prunes
#          to ~nprobe/n_cells of the corpus, exact top-k merge
#          (TakeOrderedAndProject).
# The coarse quantizer here is DETERMINISTIC — md5-derived pseudo-random
# centroids, the same trick as s02's hyperplanes — so cell assignment is
# bit-identical in DuckDB and a full value-hash oracle applies. A trained
# k-means quantizer (pyspark.ml.clustering.KMeans on a bounded sample,
# broadcast model) drops in behind ivf_assign() when recall matters more
# than reproducibility; the probe/re-rank plan is unchanged.

_N_CELLS = 16
_NPROBE = 4

# Centroid c, dim d constant in [-1, 1]: md5('ivf' c ',' d) — salted so the
# constants differ from s02's hyperplanes. Computed on the driver and
# inlined as double literals (see the plane-constant note above): the
# formula-in-SQL variant re-hashed 16x64 md5s per ROW per evaluation,
# which neither engine constant-folds.


def _cent_val(c: int, d: int) -> float:
    return (_md5int60(f"ivf{c},{d}") % 2001 - 1000) / 1000.0


_CENT_VALS = [[_cent_val(c, d) for d in range(_DIM)] for c in range(_N_CELLS)]

_SPARK_DIST2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_DUCK_DIST2 = (
    "list_sum(list_transform(range(1, {n} + 1), i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])))"
)

# All-cell distance vector for a vector column {a} (unrolled over the
# literal centroids); argmin = cell id.
_SPARK_CELL_DISTS = (
    "array("
    + ", ".join(
        _SPARK_DIST2.format(a="{a}", b=_spark_dlit(_CENT_VALS[c])) for c in range(_N_CELLS)
    )
    + ")"
)
_DUCK_CELL_DISTS = (
    "["
    + ", ".join(
        _DUCK_DIST2.format(a="{a}", b=_duck_dlit(_CENT_VALS[c]), n=_DIM)
        for c in range(_N_CELLS)
    )
    + "]"
)

# argmin by value equality (exact doubles, same fold order both engines);
# array_position/list_position return the FIRST match → deterministic
# smallest-cell tie-break.
_SPARK_CELL = (
    "CAST(array_position(" + _SPARK_CELL_DISTS + ", array_min(" + _SPARK_CELL_DISTS + ")) - 1 AS INT)"
)
_DUCK_CELL = (
    "CAST(list_position(" + _DUCK_CELL_DISTS + ", list_min(" + _DUCK_CELL_DISTS + ")) - 1 AS INT)"
)

# nprobe nearest cells for the query: sort (dist, cell) structs, take cells.
_SPARK_PROBE = (
    "slice(transform(array_sort(array("
    + ", ".join(
        "struct("
        + _SPARK_DIST2.format(a="{a}", b=_spark_dlit(_CENT_VALS[c]))
        + f" AS d, {c} AS c)"
        for c in range(_N_CELLS)
    )
    + f")), s -> s.c), 1, {_NPROBE})"
)
_DUCK_PROBE = (
    "list_transform(list_sort(["
    + ", ".join(
        "{{'d': "
        + _DUCK_DIST2.format(a="{a}", b=_duck_dlit(_CENT_VALS[c]), n=_DIM)
        + ", 'c': "
        + str(c)
        + "}}"
        for c in range(_N_CELLS)
    )
    + f"]), s -> s.c)[1:{_NPROBE}]"
)

_S05_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
assigned AS (
  SELECT vec_id, label, v, {_DUCK_CELL.format(a="v")} AS cell FROM vecs
),
q AS (
  SELECT v AS qv, {_DUCK_PROBE.format(a="v")} AS probe FROM vecs WHERE vec_id = {_QUERY_ID}
),
cand AS (
  SELECT a.vec_id, a.label, a.v, q.qv
  FROM assigned a, q
  WHERE list_contains(q.probe, a.cell) AND a.vec_id <> {_QUERY_ID}
)
SELECT vec_id, label,
       {_DUCK_DOT.format(a="v", b="qv", n=_DIM)}
         / (sqrt({_DUCK_NORM2.format(a="v")}) * sqrt({_DUCK_NORM2.format(a="qv")})) AS cosine
FROM cand
ORDER BY cosine DESC, vec_id
LIMIT {_K}
"""


def ivf_assign(emb: DataFrame, vec_col: str = "v") -> DataFrame:
    """Map-side cell assignment against the deterministic coarse centroids.
    At index-build time you'd persist this (partitionBy('cell')) so query
    scans prune to the probed cells via partition pruning.

    The 16-cell × 64-dim distance vector is materialized ONCE as a column
    and argmin'd from it — inlining it into array_position(dists,
    array_min(dists)) would evaluate the dominant per-row fold twice
    (Catalyst does not CSE duplicated expression trees)."""
    dists = F.expr(_SPARK_CELL_DISTS.format(a=vec_col))
    return (
        emb.withColumn("_dists", dists)
        .withColumn(
            "cell",
            (F.expr("array_position(_dists, array_min(_dists))") - 1).cast("int"),
        )
        .drop("_dists")
    )


def _ivf_index(emb: DataFrame, n_cells: int, seed: int = 42):
    """Trained-quantizer variant (pyspark.ml KMeans) — better recall, not
    cross-engine reproducible; used when an oracle is not required."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select("vec_id", array_to_vector(F.col("v")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    assigned = model.transform(train).select(
        "vec_id", F.col("prediction").alias("cell")
    )
    return model, emb.join(assigned, "vec_id")


@register("s05_ivf_topk", oracle=_S05_ORACLE)
def s05_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    indexed = ivf_assign(emb)
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("v").alias("qv"), F.expr(_SPARK_PROBE.format(a="v")).alias("probe")
    )
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))
    return (
        indexed.crossJoin(F.broadcast(q))
        .filter(F.array_contains(F.col("probe"), F.col("cell")) & (F.col("vec_id") != _QUERY_ID))
        .select("vec_id", "label", (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_K)
    )


# ---- s06: int8 embedding quantization --------------------------------------
# Per-vector symmetric int8 quantization — the storage/bandwidth scale
# lever for vector search (4x smaller than float32, 8x smaller than the
# float64 compute form; SIMD int8 dot products downstream). Pure map-side
# higher-order functions: zero shuffle, zero Python. Rounding is
# floor(x + 0.5) in BOTH engines (half-up, engine-exact) — never the
# engines' round(), whose half-even/half-up defaults differ.

_S06_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
scaled AS (
  SELECT vec_id, label, v,
         list_max(list_transform(v, x -> abs(x))) AS amax
  FROM vecs
),
quant AS (
  SELECT vec_id, label, v, amax,
         list_transform(v, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT)) AS q
  FROM scaled WHERE amax > 0
)
SELECT vec_id, label, amax,
       CAST(len(list_filter(q, x -> abs(x) >= 127)) AS INTEGER) AS n_sat,
       round(list_sum(list_transform(range(1, {_DIM} + 1),
             i -> abs(v[i] - q[i] * amax / 127.0))), 6) AS abs_err
FROM quant
ORDER BY vec_id
"""


def quantize_int8(emb: DataFrame, vec_col: str = "v") -> DataFrame:
    """Adds amax (per-vector absolute max), q (int8 codes as bigint array),
    n_sat (saturated lanes), abs_err (total dequantization error)."""
    amax = F.expr(f"array_max(transform({vec_col}, x -> abs(x)))")
    out = emb.withColumn("amax", amax).filter(F.col("amax") > 0)
    out = out.withColumn(
        "q",
        F.expr(f"transform({vec_col}, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT))"),
    )
    return out.withColumn(
        "n_sat", F.expr("size(filter(q, x -> abs(x) >= 127))")
    ).withColumn(
        "abs_err",
        F.round(
            F.expr(
                f"aggregate(zip_with({vec_col}, q, (x, c) -> abs(x - c * amax / 127.0)), "
                "CAST(0 AS DOUBLE), (acc, e) -> acc + e)"
            ),
            6,
        ),
    )


@register("s06_int8_quantize", oracle=_S06_ORACLE)
def s06_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    return (
        quantize_int8(emb)
        .select("vec_id", "label", "amax", "n_sat", "abs_err")
        .orderBy("vec_id")
    )


# ---- s07: random-projection dimensionality reduction -----------------------
# Johnson-Lindenstrauss sign projection 64 -> 8 dims: out_j = sum_d v_d *
# sign(j,d) / sqrt(8), with the +-1 signs md5-derived (same determinism
# trick as s02's hyperplanes) so both engines build the identical matrix
# with no trained/broadcast state. Map-side only; the reduced vectors are
# the input to cheaper ANN (8-dim distances are 8x less compute and the
# projection preserves pairwise distances within ~1/sqrt(8)).
# Output is FLAT (vec_id, dim, value) — partition/write-friendly, and the
# harness canonical hash cannot sort array cells.

_S07_OUT_DIM = 8

# ±1 signs md5('rp' j ',' d)-derived — data-independent like the
# planes/centroids above, so they are computed once and inlined as INT
# literals (the in-SQL md5 re-hashed 8x64 signs per row in both engines).
_SIGN_VALS = [
    [(_md5int60(f"rp{j},{d}") % 2) * 2 - 1 for d in range(_DIM)]
    for j in range(_S07_OUT_DIM)
]


def _int_arr(vals: list[int], duck: bool) -> str:
    body = ", ".join(str(v) for v in vals)
    return ("[" + body + "]") if duck else ("array(" + body + ")")


_S07_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
flat AS (
  {" UNION ALL ".join(
    f'''SELECT vec_id, {j} AS dim,
       round(list_sum(list_transform(range(1, {_DIM} + 1),
             d -> v[d] * ({_int_arr(_SIGN_VALS[j], True)})[d])) / sqrt({_S07_OUT_DIM}.0), 6) AS value
    FROM vecs''' for j in range(_S07_OUT_DIM))}
)
SELECT vec_id, CAST(dim AS INT) AS dim, value
FROM flat
ORDER BY vec_id, dim
"""


def random_projection(emb: DataFrame, vec_col: str = "v", out_dim: int = _S07_OUT_DIM) -> DataFrame:
    """JL sign-projection of ``vec_col`` to ``out_dim`` flat (dim, value) rows.

    Any ``out_dim`` is supported: the first ``_S07_OUT_DIM`` sign rows are
    the precomputed literals (shared with the s07 oracle); beyond that the
    rows come from the same md5 formula, sized lazily at plan-build time
    (driver-side, data-independent — a few microseconds per extra row).
    """
    signs = _SIGN_VALS + [
        [(_md5int60(f"rp{j},{d}") % 2) * 2 - 1 for d in range(_DIM)]
        for j in range(_S07_OUT_DIM, out_dim)
    ]
    proj = (
        "array("
        + ", ".join(
            f"round(aggregate(zip_with({vec_col}, {_int_arr(signs[j], False)}, "
            f"(x, s) -> x * s), "
            f"CAST(0 AS DOUBLE), (acc, e) -> acc + e) / sqrt({out_dim}.0), 6)"
            for j in range(out_dim)
        )
        + ")"
    )
    return emb.select(
        "vec_id", F.posexplode(F.expr(proj)).alias("dim", "value")
    )


@register("s07_random_projection", oracle=_S07_ORACLE)
def s07_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    return random_projection(emb).orderBy("vec_id", "dim")


# ---- s08: product quantization + ADC search with exact re-rank -------------
# The memory-scale path for billion-vector search (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011): each 64-dim
# vector compresses to M=8 sub-codes of 4 bits (32x smaller than float32);
# a query scans CODES ONLY through an 8x16 lookup table of exact
# query-to-centroid sub-distances, shortlists by that approximate distance,
# then re-ranks ONLY the shortlist exactly — the standard two-stage layout,
# because with K=16 centroids per subspace the ADC ordering is a coarse
# sieve, not a ranking (measured recall@10 of the bare ADC ordering on
# this structureless uniform testdata: ~1/10; with the 100-candidate
# shortlist + exact re-rank: 6-7/10).
#
# Spark plan shape:
#   codebook: the 16 seed vectors are the md5-rank sample of the corpus
#             (TakeOrderedAndProject, not a global sort), folded into ONE
#             broadcast row as a 16x64 nested array — codebook state is
#             always tiny, train-side cost is a top-16.
#   encode:   one map-side pass per vector against the broadcast codebook;
#             the 8x16 distance tensor is materialized once per row
#             (`_pqd`) so the argmin does not re-evaluate it (Catalyst
#             does not CSE duplicated trees — the s05 lesson).
#   scan:     per-candidate ADC cost is 8 lookups + 8 adds, independent of
#             dim; shortlist and final top-k both plan as
#             TakeOrderedAndProject (per-partition top-k, tiny merge).
# Everything is deterministic — seed selection by (md5(vec_id), vec_id),
# first-match argmin tie-break, (adc, vec_id) shortlist boundary — and
# every float fold has identical order in both engines, so the full
# value-hash oracle applies with no rounding. A trained per-subspace
# k-means codebook (pyspark.ml) drops into the same broadcast row without
# changing the plan.

_PQ_M = 8          # subspaces
_PQ_SUBDIM = _DIM // _PQ_M
_PQ_K = 16         # centroids per subspace (4-bit codes)
_PQ_SHORTLIST = 100

# Sub-distance between subvector {m} of vector column {a} and subvector {m}
# of codebook entry {c} (both flat 64-dim arrays; cb is array<array<double>>).
_SPARK_PQ_D2 = (
    f"aggregate(sequence(0, {_PQ_SUBDIM} - 1), CAST(0 AS DOUBLE), (acc, d) -> acc + "
    f"(element_at({{a}}, {{m}} * {_PQ_SUBDIM} + d + 1) - element_at(element_at(cb, {{c}} + 1), {{m}} * {_PQ_SUBDIM} + d + 1)) "
    f"* (element_at({{a}}, {{m}} * {_PQ_SUBDIM} + d + 1) - element_at(element_at(cb, {{c}} + 1), {{m}} * {_PQ_SUBDIM} + d + 1)))"
)
_DUCK_PQ_D2 = (
    f"list_sum(list_transform(range(0, {_PQ_SUBDIM}), d -> "
    f"(({{a}})[{{m}} * {_PQ_SUBDIM} + d + 1] - cb[{{c}} + 1][{{m}} * {_PQ_SUBDIM} + d + 1]) "
    f"* (({{a}})[{{m}} * {_PQ_SUBDIM} + d + 1] - cb[{{c}} + 1][{{m}} * {_PQ_SUBDIM} + d + 1])))"
)

# 8x16 nested distance tensor for vector column {a} against the codebook.
_SPARK_PQ_TENSOR = (
    f"transform(sequence(0, {_PQ_M} - 1), m -> transform(sequence(0, {_PQ_K} - 1), c -> "
    + _SPARK_PQ_D2.format(a="{a}", m="m", c="c")
    + "))"
)
_DUCK_PQ_TENSOR = (
    f"list_transform(range(0, {_PQ_M}), m -> list_transform(range(0, {_PQ_K}), c -> "
    + _DUCK_PQ_D2.format(a="{a}", m="m", c="c")
    + "))"
)

# Codes from a materialized tensor column {t}: per-subspace argmin,
# first-match (smallest code) tie-break.
_SPARK_PQ_CODES = "transform({t}, ds -> array_position(ds, array_min(ds)) - 1)"
_DUCK_PQ_CODES = "list_transform({t}, ds -> list_position(ds, list_min(ds)) - 1)"

# ADC distance of codes {codes} against LUT {lut} (the query's tensor).
_SPARK_PQ_ADC = (
    f"aggregate(sequence(0, {_PQ_M} - 1), CAST(0 AS DOUBLE), (acc, m) -> acc + "
    "element_at(element_at({lut}, m + 1), CAST(element_at({codes}, m + 1) + 1 AS INT)))"
)
_DUCK_PQ_ADC = (
    f"list_sum(list_transform(range(0, {_PQ_M}), m -> ({{lut}})[m + 1][({{codes}})[m + 1] + 1]))"
)

_S08_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT v, md5(CAST(vec_id AS VARCHAR)) AS mk, vec_id FROM vecs
  ORDER BY mk, vec_id LIMIT {_PQ_K}
),
book AS (
  SELECT list(v ORDER BY mk, vec_id) AS cb FROM seeds
),
encoded AS (
  SELECT vec_id, label, v, {_DUCK_PQ_CODES.format(t=_DUCK_PQ_TENSOR.format(a="v"))} AS codes
  FROM vecs, book
),
q AS (
  SELECT v AS qv, {_DUCK_PQ_TENSOR.format(a="v")} AS lut FROM vecs, book WHERE vec_id = {_QUERY_ID}
),
short AS (
  SELECT e.vec_id, e.label, e.v, q.qv,
         {_DUCK_PQ_ADC.format(lut="q.lut", codes="e.codes")} AS adc_dist
  FROM encoded e, q
  WHERE e.vec_id <> {_QUERY_ID}
  ORDER BY adc_dist, vec_id
  LIMIT {_PQ_SHORTLIST}
)
SELECT vec_id, label, adc_dist,
       {_DUCK_DIST2.format(a="v", b="qv", n=_DIM)} AS sq_dist
FROM short
ORDER BY sq_dist, vec_id
LIMIT {_K}
"""


def pq_codebook(emb: DataFrame, vec_col: str = "v") -> DataFrame:
    """Deterministic 16-seed codebook as ONE broadcastable row: `cb` =
    array<array<double>> (16x64). Seed selection is a md5-rank top-16 —
    TakeOrderedAndProject, never a global sort — so building the codebook
    costs one bounded pass however large the corpus is."""
    mk = F.md5(F.col("vec_id").cast("string").cast("binary"))
    seeds = (
        emb.select(mk.alias("mk"), "vec_id", F.col(vec_col).alias("_sv"))
        .orderBy("mk", "vec_id")
        .limit(_PQ_K)
    )
    return seeds.agg(
        F.expr("transform(array_sort(collect_list(struct(mk, vec_id, _sv))), s -> s._sv)").alias("cb")
    )


def pq_encode(emb: DataFrame, codebook: DataFrame, vec_col: str = "v") -> DataFrame:
    """Map-side PQ encoding against the broadcast codebook: adds a `codes`
    column (array<bigint>, one 0..15 code per subspace). At index build
    time you persist (vec_id, codes) — 4 bytes of payload per vector —
    and the float column leaves the search path."""
    return (
        emb.crossJoin(F.broadcast(codebook))
        .withColumn("_pqd", F.expr(_SPARK_PQ_TENSOR.format(a=vec_col)))
        .withColumn("codes", F.expr(_SPARK_PQ_CODES.format(t="_pqd")))
        .drop("_pqd")
    )


@register("s08_pq_adc_topk", oracle=_S08_ORACLE)
def s08_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    book = pq_codebook(emb)
    encoded = pq_encode(emb, book).select("vec_id", "label", "v", "codes")
    q = (
        emb.filter(F.col("vec_id") == _QUERY_ID)
        .crossJoin(F.broadcast(book))
        .select(
            F.col("v").alias("qv"),
            F.expr(_SPARK_PQ_TENSOR.format(a="v")).alias("lut"),
        )
    )
    short = (
        encoded.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != _QUERY_ID)
        .select(
            "vec_id",
            "label",
            "v",
            "qv",
            F.expr(_SPARK_PQ_ADC.format(lut="lut", codes="codes")).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(_PQ_SHORTLIST)
    )
    return (
        short.select(
            "vec_id",
            "label",
            "adc_dist",
            F.expr(_SPARK_DIST2.format(a="v", b="qv")).alias("sq_dist"),
        )
        .orderBy("sq_dist", "vec_id")
        .limit(_K)
    )


# ---- s09: IVF+PQ — the composed billion-vector index layout ----------------
# s05's coarse cells bound WHICH vectors a query touches; s08's product
# codes bound the BYTES per touched vector. Composed, they are the
# standard billion-scale ANN index (FAISS IVFPQ): probe nprobe cells,
# ADC-scan only those cells' codes, shortlist, exact re-rank the
# shortlist. Spark layout: cell assignment and PQ encoding are one
# map-side pass each at index build (persisted partitionBy('cell') in a
# real deployment, so the probe prunes partitions); the query side is a
# broadcast row carrying (probe list, LUT, exact vector). Per-candidate
# scan cost: one array_contains + 8 lookups. All constants are the same
# deterministic md5 derivations as the parent operators, so the composed
# pipeline keeps the full value-hash oracle.

_S09_SHORTLIST = 50

_S09_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT v, md5(CAST(vec_id AS VARCHAR)) AS mk, vec_id FROM vecs
  ORDER BY mk, vec_id LIMIT {_PQ_K}
),
book AS (
  SELECT list(v ORDER BY mk, vec_id) AS cb FROM seeds
),
indexed AS (
  SELECT vec_id, label, v,
         {_DUCK_CELL.format(a="v")} AS cell,
         {_DUCK_PQ_CODES.format(t=_DUCK_PQ_TENSOR.format(a="v"))} AS codes
  FROM vecs, book
),
q AS (
  SELECT v AS qv,
         {_DUCK_PROBE.format(a="v")} AS probe,
         {_DUCK_PQ_TENSOR.format(a="v")} AS lut
  FROM vecs, book WHERE vec_id = {_QUERY_ID}
),
short AS (
  SELECT i.vec_id, i.label, i.v, q.qv,
         {_DUCK_PQ_ADC.format(lut="q.lut", codes="i.codes")} AS adc_dist
  FROM indexed i, q
  WHERE list_contains(q.probe, i.cell) AND i.vec_id <> {_QUERY_ID}
  ORDER BY adc_dist, vec_id
  LIMIT {_S09_SHORTLIST}
)
SELECT vec_id, label, adc_dist,
       {_DUCK_DIST2.format(a="v", b="qv", n=_DIM)} AS sq_dist
FROM short
ORDER BY sq_dist, vec_id
LIMIT {_K}
"""


@register("s09_ivfpq_topk", oracle=_S09_ORACLE)
def s09_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    book = pq_codebook(emb)
    indexed = pq_encode(ivf_assign(emb, "v"), book).select(
        "vec_id", "label", "v", "cell", "codes"
    )
    q = (
        emb.filter(F.col("vec_id") == _QUERY_ID)
        .crossJoin(F.broadcast(book))
        .select(
            F.col("v").alias("qv"),
            F.expr(_SPARK_PROBE.format(a="v")).alias("probe"),
            F.expr(_SPARK_PQ_TENSOR.format(a="v")).alias("lut"),
        )
    )
    short = (
        indexed.crossJoin(F.broadcast(q))
        .filter(
            F.array_contains(F.col("probe"), F.col("cell"))
            & (F.col("vec_id") != _QUERY_ID)
        )
        .select(
            "vec_id",
            "label",
            "v",
            "qv",
            F.expr(_SPARK_PQ_ADC.format(lut="lut", codes="codes")).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(_S09_SHORTLIST)
    )
    return (
        short.select(
            "vec_id",
            "label",
            "adc_dist",
            F.expr(_SPARK_DIST2.format(a="v", b="qv")).alias("sq_dist"),
        )
        .orderBy("sq_dist", "vec_id")
        .limit(_K)
    )


# ---- s10: maximum inner product search (MIPS) ------------------------------
# Recommendation-scoring semantics: rank by RAW dot product, not cosine —
# item popularity (vector norm) is signal, not noise. Same broadcast-
# query + TakeOrderedAndProject shape as s01. For approximate MIPS at
# scale, the standard reduction (Shrivastava & Li, NeurIPS 2014) appends
# sqrt(M² − ‖x‖²) to each item and 0 to the query, turning MIPS into the
# L2/cosine problem s02/s05/s08/s09 already index — one extra map-side
# column, every ANN structure above reusable unchanged.

_S10_ORACLE = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {_QUERY_ID}
)
SELECT e.vec_id, e.label,
       {_DUCK_DOT.format(a="e.embedding::DOUBLE[]", b="q.qv", n=_DIM)} AS dot
FROM embeddings e, q
WHERE e.vec_id <> {_QUERY_ID}
ORDER BY dot DESC, vec_id
LIMIT {_K}
"""


@register("s10_mips_topk", oracle=_S10_ORACLE)
def s10_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(F.col("v").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.expr(_SPARK_DOT.format(a="v", b="qv")).alias("dot"))
        .orderBy(F.desc("dot"), "vec_id")
        .limit(_K)
    )


# ---- s11: 1-bit (sign) quantized Hamming top-k -----------------------------
# The most aggressive embedding compression that still searches: keep ONE
# bit per dimension (the sign), pack 64 dims into two BIGINT words, and
# rank by Hamming distance to the query's signature — popcount(xor), pure
# integer ALU work. 64 float32 dims (256 B) become 8 B: a 10^12-vector
# corpus's code table is ~8 TB and scans as sequential integer columns
# inside whole-stage codegen, no floats touched. Sign-bit Hamming is the
# classic angle estimator (Charikar 2002 SimHash: P[bit differs] = θ/π),
# so ranking by Hamming ≈ ranking by cosine; production recalls re-rank
# the Hamming shortlist with exact cosine (s01's plan on the shortlist —
# compose as needed). Unlike s04/s05's rounded-score oracles, every value
# here is an integer, so the oracle is exact with NO quantization step.
# Plan: map-side packing, broadcast 1-row query signature,
# TakeOrderedAndProject top-k — identical scan shape to s01 at 1/32 the
# bytes. Reference analog: none (north-star similarity family).

# Corpus-adaptive cluster-key widening (shared by d05/d13): real IVF/LSH
# systems grow the partition count with N; these fragments add
# ceil(log2(N / ref_n)) extra key bits taken from an already-computed
# sign word, with N measured in-plan (broadcast 1-row count). One source
# of truth so the two operators (x two engines) cannot drift.

ADAPTIVE_SUB_SQL = "{w} & ((1 << {xbits}) - 1)"  # same text both engines


def adaptive_xbits_agg_sql(ref_n: int) -> str:
    """Aggregate expression computing the extra-bit count from COUNT(*).
    Valid in both Spark SQL and DuckDB."""
    return f"CAST(greatest(0, ceil(log2(COUNT(*) / {ref_n}.0))) AS INT)"


_SPARK_SIGNWORD = (
    "aggregate(transform(sequence(0, 31), i -> "
    "IF(element_at({a}, {base} + i + 1) > CAST(0 AS DOUBLE), "
    "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)
_DUCK_SIGNWORD = (
    "CAST(list_sum(list_transform(range(0, 32), i -> "
    "CASE WHEN ({a})[{base} + i + 1] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT)"
)

_S11_ORACLE = f"""
WITH sigs AS (
  SELECT vec_id, label,
         {_DUCK_SIGNWORD.format(a="embedding::DOUBLE[]", base=0)} AS w0,
         {_DUCK_SIGNWORD.format(a="embedding::DOUBLE[]", base=32)} AS w1
  FROM embeddings
),
q AS (SELECT w0 AS q0, w1 AS q1 FROM sigs WHERE vec_id = {_QUERY_ID})
SELECT s.vec_id, s.label,
       CAST(bit_count(xor(s.w0, q.q0)) + bit_count(xor(s.w1, q.q1)) AS INT)
         AS hamming
FROM sigs s, q
WHERE s.vec_id <> {_QUERY_ID}
ORDER BY hamming, s.vec_id
LIMIT {_K}
"""


@register("s11_hamming_topk", oracle=_S11_ORACLE)
def s11_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    sigs = emb.select(
        "vec_id",
        "label",
        F.expr(_SPARK_SIGNWORD.format(a="v", base=0)).alias("w0"),
        F.expr(_SPARK_SIGNWORD.format(a="v", base=32)).alias("w1"),
    )
    q = sigs.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("w0").alias("q0"), F.col("w1").alias("q1")
    )
    hamming = (
        F.bit_count(F.expr("w0 ^ q0")) + F.bit_count(F.expr("w1 ^ q1"))
    ).cast("int")
    return (
        sigs.filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", hamming.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(_K)
    )


# ---- s12: ANN recall@k evaluation ------------------------------------------
# The operator that closes the ANN loop: at 100 TB you cannot eyeball
# whether P planes / nprobe cells / PQ codebooks / 1-bit codes are still
# recalling the true neighbors — you MEASURE recall in-engine and tune
# from the number. One plan evaluates every approximate path (s02 LSH,
# s05 IVF, s08 PQ, s11 Hamming) against s01's exact top-k: union the
# shortlists under a method tag, LEFT-join the (k-row, broadcast) exact
# set, count hits per method. recall@k = hits / k is an exact integer
# ratio, so the oracle is drift-free by construction. The composition
# reuses the registered builders and their DuckDB mirrors verbatim —
# nothing is re-specified, so s12 stays correct whenever its inputs are.
# At scale the eval runs on a sampled query set (many queries via s04's
# batched kNN as ground truth) — same plan shape, one union per method.
# Measured at sf0.01: ivf 1.0, pq 0.7, lsh 0.3, hamming 0.3. The lsh
# number is this operator's origin story: s02's original single-bucket
# probe measured recall@10 = 0.0 here — invisible until measured — and
# adding distance-1 multi-probe (now s02's registered plan) recovered it
# to 0.3. 64 sign bits simply can't separate this corpus finely (hamming
# agrees at 0.3); the structure-aware quantizers (IVF cells, PQ
# codebooks) are the recall path, and now there is a number proving it.

def _s12_sub(sql: str) -> str:
    return "(" + sql + ")"


_S12_ORACLE = f"""
WITH exact AS (SELECT vec_id FROM {_s12_sub(_S01_ORACLE)} _ex),
ann AS (
  SELECT 'lsh' AS method, vec_id FROM {_s12_sub(_S02_ORACLE)} _a1
  UNION ALL
  SELECT 'ivf' AS method, vec_id FROM {_s12_sub(_S05_ORACLE)} _a2
  UNION ALL
  SELECT 'pq' AS method, vec_id FROM {_s12_sub(_S08_ORACLE)} _a3
  UNION ALL
  SELECT 'hamming' AS method, vec_id FROM {_s12_sub(_S11_ORACLE)} _a4
),
counts AS (
  SELECT a.method AS method, COUNT(e.vec_id) AS n_hits
  FROM ann a LEFT JOIN exact e ON a.vec_id = e.vec_id
  GROUP BY a.method
)
SELECT m.method AS method,
       CAST(COALESCE(c.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {_K} AS recall_at_k
FROM (VALUES ('hamming'), ('ivf'), ('lsh'), ('pq')) m(method)
LEFT JOIN counts c ON m.method = c.method
ORDER BY m.method
"""


@register("s12_ann_recall", oracle=_S12_ORACLE)
def s12_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = s01_cosine_topk(spark, sf_dir).select("vec_id").withColumn(
        "_hit", F.lit(1)
    )
    methods = [
        ("lsh", s02_lsh_ann_topk),
        ("ivf", s05_ivf_topk),
        ("pq", s08_pq_adc_topk),
        ("hamming", s11_hamming_topk),
    ]
    ann = None
    for name, fn in methods:
        part = fn(spark, sf_dir).select(
            F.lit(name).alias("method"), F.col("vec_id")
        )
        ann = part if ann is None else ann.unionAll(part)
    counts = (
        ann.join(F.broadcast(exact), "vec_id", "left")
        .groupBy("method")
        .agg(F.count("_hit").alias("_n"))
    )
    # Left-join a fixed method spine so a method whose ANN shortlist comes
    # back empty still reports recall_at_k = 0.0 — the exact total-miss
    # failure mode this eval exists to surface — instead of vanishing from
    # the output (its union branch would contribute zero GROUP BY rows).
    spine = spark.createDataFrame(
        [(name,) for name, _ in methods], "method string"
    )
    return (
        F.broadcast(spine)
        .join(counts, "method", "left")
        .select(
            "method",
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("_n"), F.lit(0)).cast("double") / F.lit(_K)).alias(
                "recall_at_k"
            ),
        )
        .orderBy("method")
    )


# ---- s13: int8 two-stage retrieval (integer-dot shortlist + exact re-rank) --
# The production serving layout for billion-vector search on commodity
# nodes: the corpus lives as int8 codes (s06's symmetric quantization, 4x
# smaller than float32), stage 1 ranks by PURE-INTEGER dot product against
# the query's codes (SIMD int8 GEMM territory — the scan never touches a
# float until scoring), stage 2 re-ranks only the top-C shortlist with the
# exact float cosine. Approximate score = int_dot * amax_v * amax_q / 127^2
# — the dequantized dot; int_dot is an exact BIGINT fold and the two
# double multiplies are the same IEEE ops in both engines, so the
# shortlist is engine-exact with NO rounding. Plan: map-side quantization,
# broadcast 1-row query codes, TakeOrderedAndProject top-C (never a global
# sort), exact cosine on C rows. At 10^12 vectors the code table is ~64 TB
# (vs 256 TB float32) and stage 1 is a sequential integer-column scan
# inside whole-stage codegen; C stays constant, so re-rank cost is
# corpus-size-independent. Reference analog: none (north-star similarity
# family; sibling of s08's PQ and s11's 1-bit stages).

_S13_C = 50  # stage-1 shortlist size

_S13_INT_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
_S13_DUCK_INT_DOT = "list_sum(list_transform(range(1, {n} + 1), i -> ({a})[i] * ({b})[i]))"

_S13_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
quant AS (
  SELECT vec_id, label, v, amax,
         list_transform(v, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT)) AS q
  FROM (SELECT *, list_max(list_transform(v, x -> abs(x))) AS amax FROM vecs)
  WHERE amax > 0
),
qv AS (SELECT v AS qvec, q AS qcodes, amax AS qamax FROM quant WHERE vec_id = {_QUERY_ID}),
shortlist AS (
  SELECT c.vec_id, c.label, c.v, qv.qvec,
         ((CAST({_S13_DUCK_INT_DOT.format(a="c.q", b="qv.qcodes", n=_DIM)} AS DOUBLE)
           * c.amax) * qv.qamax) / 16129.0 AS approx
  FROM quant c, qv
  WHERE c.vec_id <> {_QUERY_ID}
  ORDER BY approx DESC, c.vec_id
  LIMIT {_S13_C}
)
SELECT vec_id, label, round(approx, 6) AS approx_dot,
       {_DUCK_DOT.format(a="v", b="qvec", n=_DIM)}
         / (sqrt({_DUCK_NORM2.format(a="v")}) * sqrt({_DUCK_NORM2.format(a="qvec")}))
         AS cosine
FROM shortlist
ORDER BY cosine DESC, vec_id
LIMIT {_K}
"""


@register("s13_int8_rerank_topk", oracle=_S13_ORACLE)
def s13_int8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    quant = quantize_int8(emb).select("vec_id", "label", "v", "amax", "q")
    qv = quant.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("v").alias("qvec"), F.col("q").alias("qcodes"), F.col("amax").alias("qamax")
    )
    int_dot = F.expr(_S13_INT_DOT.format(a="q", b="qcodes"))
    approx = ((int_dot.cast("double") * F.col("amax")) * F.col("qamax")) / F.lit(16129.0)
    shortlist = (
        quant.filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", "v", "qvec", approx.alias("approx"))
        .orderBy(F.desc("approx"), "vec_id")
        .limit(_S13_C)
    )
    dot = F.expr(_SPARK_DOT.format(a="v", b="qvec"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qvec"))
    return (
        shortlist.select(
            "vec_id",
            "label",
            F.round(F.col("approx"), 6).alias("approx_dot"),
            (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_K)
    )


# ---- s14: MMR diverse re-rank (maximal marginal relevance) -----------------
# Carbonell & Goldstein (SIGIR 1998): retrieval that balances relevance to
# the query against redundancy with what is already selected — the
# standard recipe for assembling a DIVERSE context set (RAG context
# packing, few-shot exemplar pools) instead of k near-identical hits.
# Greedy: next = argmax over remaining of lambda*rel(c) - (1-lambda)*
# max_{s in S} sim(c, s), seeded with the most relevant item.
#
# Scale shape — bounded two-stage (the s13 pattern): stage 1 is the s01
# exact-cosine shortlist (TakeOrderedAndProject, scan scales with the
# corpus); stage 2 — the inherently sequential greedy — runs over the
# CONSTANT-size shortlist only (C=30 rows, C^2=870 pair sims), so its
# cost is independent of corpus size. The pairwise sims are computed
# JVM-side with the same fold as everything else; the greedy itself is
# PURE INTEGER arithmetic over quantized scores inside one Arrow batch
# (applyInPandas on a single constant group), so selection order is
# bit-deterministic and the DuckDB oracle (the same greedy unrolled as
# K chained CTEs) matches exactly.

_S14_C = 30  # shortlist size (stage-1 top-C by relevance)
_S14_K = 8  # selections
_S14_LAM_NUM, _S14_DIV_NUM = 7, 3  # lambda = 0.7, as integers (x10)
_S14_Q = "1e9"  # cosine quantization: floor(cos * 1e9 + 0.5)


def _s14_oracle() -> str:
    cos_q = (
        f"({_DUCK_DOT.format(a='a.v', b='b.v', n=_DIM)}"
        f" / (sqrt({_DUCK_NORM2.format(a='a.v')}) * sqrt({_DUCK_NORM2.format(a='b.v')})))"
    )
    rel = (
        f"({_DUCK_DOT.format(a='e.v', b='q.qv', n=_DIM)}"
        f" / (sqrt({_DUCK_NORM2.format(a='e.v')}) * sqrt({_DUCK_NORM2.format(a='q.qv')})))"
    )
    parts = [
        f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
q AS MATERIALIZED (SELECT v AS qv FROM vecs WHERE vec_id = {_QUERY_ID}),
short AS MATERIALIZED (
  SELECT e.vec_id, e.v,
         CAST(floor({rel} * {_S14_Q} + 0.5) AS BIGINT) AS qrel
  FROM vecs e, q WHERE e.vec_id <> {_QUERY_ID}
  ORDER BY {rel} DESC, e.vec_id LIMIT {_S14_C}
),
pair AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(floor({cos_q} * {_S14_Q} + 0.5) AS BIGINT) AS qsim
  FROM short a JOIN short b ON a.vec_id <> b.vec_id
),
s1 AS MATERIALIZED (SELECT vec_id, qrel, {_S14_LAM_NUM} * qrel AS score
       FROM short ORDER BY score DESC, vec_id LIMIT 1),
p1 AS MATERIALIZED (SELECT vec_id FROM s1)"""
    ]
    for k in range(2, _S14_K + 1):
        parts.append(f""",
s{k} AS MATERIALIZED (
  SELECT s.vec_id, s.qrel,
         {_S14_LAM_NUM} * s.qrel - {_S14_DIV_NUM} * (
            SELECT MAX(qsim) FROM pair
            WHERE ia = s.vec_id AND ib IN (SELECT vec_id FROM p{k - 1})) AS score
  FROM short s WHERE s.vec_id NOT IN (SELECT vec_id FROM p{k - 1})
  ORDER BY score DESC, s.vec_id LIMIT 1
),
p{k} AS MATERIALIZED (SELECT vec_id FROM p{k - 1} UNION ALL SELECT vec_id FROM s{k})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, vec_id, qrel, score FROM s{k}"
        for k in range(1, _S14_K + 1)
    )
    parts.append(
        f"""
SELECT CAST(rank AS INT) AS rank, vec_id, qrel, score FROM ({union})
ORDER BY rank"""
    )
    return "".join(parts)


@register("s14_mmr_rerank", oracle=_s14_oracle())
def s14_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(F.col("v").alias("qv"))
    rel = (
        F.expr(_SPARK_DOT.format(a="v", b="qv"))
        / (
            F.sqrt(F.expr(_SPARK_NORM2.format(a="v")))
            * F.sqrt(F.expr(_SPARK_NORM2.format(a="qv")))
        )
    )
    short = (
        emb.filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.expr(
                f"CAST(floor(({_SPARK_DOT.format(a='v', b='qv')}"
                f" / (sqrt({_SPARK_NORM2.format(a='v')}) * sqrt({_SPARK_NORM2.format(a='qv')})))"
                f" * {_S14_Q} + 0.5) AS BIGINT)"
            ).alias("qrel"),
            rel.alias("_rel"),
        )
        .orderBy(F.desc("_rel"), "vec_id")
        .limit(_S14_C)
        .drop("_rel")
    )
    a = short.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), "qrel")
    b = short.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    cos_ab = (
        f"({_SPARK_DOT.format(a='va', b='vb')}"
        f" / (sqrt({_SPARK_NORM2.format(a='va')}) * sqrt({_SPARK_NORM2.format(a='vb')})))"
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            "qrel",
            F.expr(f"CAST(floor({cos_ab} * {_S14_Q} + 0.5) AS BIGINT)").alias("qsim"),
        )
        # self rows carry the candidate set itself: a 1-candidate shortlist
        # has NO pairs, and the greedy must still seed with that candidate
        # (the oracle's s1 CTE does) — deriving candidates from pairs alone
        # would return empty there
        .unionByName(
            short.select(
                F.col("vec_id").alias("ia"),
                F.col("vec_id").alias("ib"),
                "qrel",
                F.lit(None).cast("long").alias("qsim"),
            )
        )
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # pure-integer MMR over the constant-size shortlist — one batch
        qrel = {}
        qsim = {}
        for r in pdf.itertuples(index=False):
            qrel[int(r.ia)] = int(r.qrel)
            if r.ia != r.ib:
                qsim[(int(r.ia), int(r.ib))] = int(r.qsim)
        remaining = set(qrel)
        picked: list[tuple[int, int, int, int]] = []
        while remaining and len(picked) < _S14_K:
            best = None
            for c in sorted(remaining):  # ascending id -> ties pick min id
                if picked:
                    maxsim = max(qsim[(c, p[1])] for p in picked)
                    score = _S14_LAM_NUM * qrel[c] - _S14_DIV_NUM * maxsim
                else:
                    score = _S14_LAM_NUM * qrel[c]
                if best is None or score > best[1]:
                    best = (c, score)
            picked.append((len(picked) + 1, best[0], qrel[best[0]], best[1]))
            remaining.discard(best[0])
        return pd.DataFrame(picked, columns=["rank", "vec_id", "qrel", "score"])

    return (
        pairs.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(greedy, schema="rank int, vec_id long, qrel long, score long")
        .orderBy("rank")
    )
