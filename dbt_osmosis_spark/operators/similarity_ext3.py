"""Similarity / embedding operators, part 3: representation diagnostics
(s27 truncation recall curve, s28 centroid silhouette, s29 PQ codebook
distortion, s30 embedding health audit).


s27 is the Matryoshka-style dimension-truncation curve: recall@10 of
cosine top-k computed on the first d dims (d ∈ 4, 8, 16, 64) against the
full-dimension truth, for a fixed 8-query batch. This is the measurement
behind "can we serve ANN on a 16-dim prefix and re-rank on the full
vector?" — the cheapest storage/bandwidth lever an embedding pipeline
has (Kusupati et al., "Matryoshka Representation Learning", NeurIPS
2022). Scores quantize to 1e-6 half-up BIGINTs *before* ranking (the s04
discipline), so ranks are engine-exact. Top-k is two-phase — a
per-(query, dim, vec-bucket) local rank, then a final rank over the
≤ bucket·k survivors — so no (query, dim) group ever materializes a
corpus-sized single partition: the p19 bucket decomposition applied to
ranking.

s28 is the centroid silhouette per label: a = quantized squared L2 to
the own-label centroid, b = min over other labels; the per-vector score
is reported SHIFTED by +1 in basis points, s1_bp = (b − a + max(a,b)) ·
10⁴ DIV max(a,b) ∈ [0, 20000] (10000 = neutral) — the shift keeps every
integer division non-negative, the regime where no engine pair can
disagree about rounding direction. Centroids are exact-decimal
(quantize-before-sum, the s03/s26 discipline); distances quantize
per-component at 1e12 so the fold is order-independent. Work is one
posexplode-free map-side fold per (vector × |labels|) against a
broadcast ~20-row centroid table — corpus-linear at any scale.

Reference parity: the reference ships SQL to a warehouse
(src/dbt_osmosis/core/sql_operations.py); these are engine-side members
of the embedding-diagnostics surface this repo adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_DIM = 64
_S27_DIMS = (4, 8, 16, 64)
_S27_K = 10
_S27_NQ = 8  # query batch: vec_id 0..7
_S27_BUCKETS = 32

_S27_DUCK_COS = (
    "list_sum(list_transform(range(1, {d} + 1), i -> ev[i] * qv[i]))"
    " / (sqrt(list_sum(list_transform(range(1, {d} + 1), i -> ev[i] * ev[i])))"
    " * sqrt(list_sum(list_transform(range(1, {d} + 1), i -> qv[i] * qv[i]))))"
)

_S27_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {_S27_NQ}
),
scored AS (
  SELECT q.qid, e.vec_id, d.dim_len,
         CAST(floor(
           CASE {' '.join(f"WHEN d.dim_len = {d} THEN {_S27_DUCK_COS.format(d=d)}" for d in _S27_DIMS)} END
           * 1e6 + 0.5) AS BIGINT) AS qcos
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings) e
  CROSS JOIN q
  CROSS JOIN (SELECT unnest([{', '.join(str(d) for d in _S27_DIMS)}]) AS dim_len) d
  WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, dim_len, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid, dim_len
                            ORDER BY qcos DESC, vec_id) AS rn
  FROM scored
),
t10 AS (SELECT qid, dim_len, vec_id FROM ranked WHERE rn <= {_S27_K}),
truth AS (SELECT qid, vec_id FROM t10 WHERE dim_len = {_DIM})
SELECT t.qid, t.dim_len, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM t10 t JOIN truth u ON u.qid = t.qid AND u.vec_id = t.vec_id
GROUP BY t.qid, t.dim_len
ORDER BY t.qid, t.dim_len
"""


@register("s27_truncation_curve", oracle=_S27_ORACLE)
def s27_truncation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    q = (
        emb.filter(F.col("vec_id") < _S27_NQ)
        .select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"))
    )

    def qcos(d: int) -> str:
        dot = (
            f"aggregate(zip_with(slice(ev, 1, {d}), slice(qv, 1, {d}),"
            " (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nv = (
            f"aggregate(transform(slice(ev, 1, {d}), x -> x * x),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nq = (
            f"aggregate(transform(slice(qv, 1, {d}), x -> x * x),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        return (
            f"CAST(floor({dot} / (sqrt({nv}) * sqrt({nq})) * 1e6 + 0.5) AS BIGINT)"
        )

    dim_structs = ", ".join(
        f"struct(CAST({d} AS INT) AS dim_len, {qcos(d)} AS qcos)" for d in _S27_DIMS
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.explode(F.expr(f"array({dim_structs})")).alias("s"),
        )
        .select("qid", "vec_id", "s.dim_len", "s.qcos")
    )
    # Two-phase exact top-k: local rank inside (qid, dim, vec-bucket), then
    # a final rank over the <= _S27_BUCKETS * k survivors per (qid, dim).
    bucketed = scored.withColumn("bkt", F.col("vec_id") % _S27_BUCKETS)
    local = W.partitionBy("qid", "dim_len", "bkt").orderBy(F.desc("qcos"), "vec_id")
    survivors = (
        bucketed.withColumn("lrn", F.row_number().over(local))
        .filter(F.col("lrn") <= _S27_K)
    )
    final = W.partitionBy("qid", "dim_len").orderBy(F.desc("qcos"), "vec_id")
    t10 = (
        survivors.withColumn("rn", F.row_number().over(final))
        .filter(F.col("rn") <= _S27_K)
        .select("qid", "dim_len", "vec_id")
    )
    truth = t10.filter(F.col("dim_len") == _DIM).select("qid", "vec_id")
    return (
        t10.join(F.broadcast(truth), ["qid", "vec_id"])
        .groupBy("qid", "dim_len")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .orderBy("qid", "dim_len")
    )


# --------------------------------------------------------------------------
# s28: centroid silhouette per label
# --------------------------------------------------------------------------

_S28_ORACLE = f"""
WITH comp AS (
  SELECT label, d AS pos, (embedding::DOUBLE[])[d + 1] AS x
  FROM embeddings, (SELECT unnest(range(0, {_DIM})) AS d)
),
cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS DECIMAL(28,0))) AS DOUBLE)
           / COUNT(*) / 1e9 AS m
  FROM comp GROUP BY label, pos
),
carr AS (SELECT label, list(m ORDER BY pos) AS marr FROM cent GROUP BY label),
dists AS (
  SELECT e.vec_id, e.label AS own, c.label AS cl,
         CAST(list_sum(list_transform(range(1, {_DIM} + 1),
           i -> CAST(floor((ev[i] - c.marr[i]) * (ev[i] - c.marr[i]) * 1e12 + 0.5)
                     AS DECIMAL(28,0)))) AS BIGINT) AS qd2
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings) e
  CROSS JOIN carr c
),
ab AS (
  SELECT vec_id, own,
         MIN(CASE WHEN cl = own THEN qd2 END) AS qa,
         MIN(CASE WHEN cl <> own THEN qd2 END) AS qb
  FROM dists GROUP BY vec_id, own
),
s AS (
  SELECT own AS label,
         (qb - qa + greatest(qa, qb, 1)) * 10000 // greatest(qa, qb, 1) AS s1_bp
  FROM ab WHERE qb IS NOT NULL
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(s1_bp) AS BIGINT) // COUNT(*) AS mean_s1_bp
FROM s GROUP BY label ORDER BY label
"""


@register("s28_centroid_silhouette", oracle=_S28_ORACLE)
def s28_centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("ev")
    )
    comp = emb.select(
        "label", F.posexplode("ev").alias("pos", "x")
    )
    cent = comp.groupBy("label", "pos").agg(
        (
            F.sum(F.expr("CAST(floor(x * 1e9 + 0.5) AS DECIMAL(28,0))")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1e9)
        ).alias("m")
    )
    carr = cent.groupBy(F.col("label").alias("cl")).agg(
        F.expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").alias(
            "marr"
        )
    )
    qd2 = F.expr(
        "CAST(aggregate(zip_with(ev, marr, (x, y) ->"
        " CAST(floor((x - y) * (x - y) * 1e12 + 0.5) AS DECIMAL(28,0))),"
        " CAST(0 AS DECIMAL(28,0)), (acc, v) -> CAST(acc + v AS DECIMAL(28,0))) AS BIGINT)"
    )
    dists = (
        emb.crossJoin(F.broadcast(carr))
        .select("vec_id", F.col("label").alias("own"), "cl", qd2.alias("qd2"))
    )
    ab = dists.groupBy("vec_id", "own").agg(
        F.min(F.when(F.col("cl") == F.col("own"), F.col("qd2"))).alias("qa"),
        F.min(F.when(F.col("cl") != F.col("own"), F.col("qd2"))).alias("qb"),
    )
    return (
        ab.filter(F.col("qb").isNotNull())
        .select(
            F.col("own").alias("label"),
            F.expr(
                "(qb - qa + greatest(qa, qb, 1)) * 10000 DIV greatest(qa, qb, 1)"
            ).alias("s1_bp"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr("SUM(s1_bp) DIV COUNT(*)").alias("mean_s1_bp"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# s29: PQ codebook distortion report — the index-health dashboard
# --------------------------------------------------------------------------
# Product quantization (s08/s09) trades recall for bytes; this measures
# the trade per subspace: mean squared quantization error (the distance
# each subvector moves to its nearest codeword), how many of the K
# codewords are actually used, and the hottest codeword's share. A
# subspace with 3 live codes out of 16 or a 40% hot code is a codebook
# that needs retraining — at billion-vector scale you read THIS table
# before rebuilding an index, not recall@k after. Reuses s08's exact
# codebook/tensor/argmin expressions (imported, so the diagnostic can
# never measure a different codebook than the index uses). One map-side
# tensor pass + a (subspace, code)-keyed aggregate — 8·16 cells
# regardless of corpus size, the same mergeable-summary shape as t22.
# Determinism: per-(vector, subspace) errors quantize at 1e9 half-up to
# BIGINT before summation (both engines fold the sub-distance in the
# same index order, so the doubles agree bit-for-bit; quantization makes
# the SUM order-independent); means are floor-division exact.

from dbt_osmosis_spark.operators.similarity import (  # noqa: E402
    _DUCK_PQ_CODES,
    _DUCK_PQ_TENSOR,
    _PQ_K,
    _PQ_M,
    _SPARK_PQ_CODES,
    _SPARK_PQ_TENSOR,
)

_S29_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT v, md5(CAST(vec_id AS VARCHAR)) AS mk, vec_id FROM vecs
  ORDER BY mk, vec_id LIMIT {_PQ_K}
),
book AS (SELECT list(v ORDER BY mk, vec_id) AS cb FROM seeds),
ten AS (
  SELECT vec_id, {_DUCK_PQ_TENSOR.format(a="v")} AS t FROM vecs, book
),
pm AS (
  SELECT vec_id, CAST(m AS INTEGER) AS m,
         CAST(floor(list_min(t[m + 1]) * 1e9 + 0.5) AS BIGINT) AS qerr_q,
         list_position(t[m + 1], list_min(t[m + 1])) - 1 AS code
  FROM ten, (SELECT unnest(range(0, {_PQ_M})) AS m)
),
g1 AS (SELECT m, code, COUNT(*) AS n, SUM(qerr_q) AS sq FROM pm GROUP BY m, code)
SELECT m,
       CAST(SUM(n) AS BIGINT) AS n_vecs,
       CAST(COUNT(*) AS BIGINT) AS n_codes_used,
       CAST(MAX(n) AS BIGINT) * 10000 // CAST(SUM(n) AS BIGINT) AS top_code_share_bp,
       CAST(SUM(sq) AS BIGINT) // CAST(SUM(n) AS BIGINT) AS mean_qerr_q
FROM g1 GROUP BY m ORDER BY m
"""


@register("s29_pq_distortion", oracle=_S29_ORACLE)
def s29_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mk = F.md5(F.col("vec_id").cast("string"))
    seeds = (
        emb.select("v", mk.alias("mk"), "vec_id")
        .orderBy("mk", "vec_id")
        .limit(_PQ_K)
    )
    book = seeds.agg(
        F.expr("transform(array_sort(collect_list(struct(mk, vec_id, v))), s -> s.v)").alias("cb")
    )
    ten = emb.crossJoin(F.broadcast(book)).select(
        "vec_id", F.expr(_SPARK_PQ_TENSOR.format(a="v")).alias("t")
    )
    pm_struct = (
        f"transform(sequence(0, {_PQ_M} - 1), m -> struct("
        "CAST(m AS INT) AS m,"
        " CAST(floor(array_min(element_at(t, m + 1)) * 1e9 + 0.5) AS BIGINT) AS qerr_q,"
        " array_position(element_at(t, m + 1), array_min(element_at(t, m + 1))) - 1 AS code))"
    )
    pm = ten.select(F.explode(F.expr(pm_struct)).alias("x")).select(
        "x.m", "x.qerr_q", "x.code"
    )
    g1 = pm.groupBy("m", "code").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qerr_q").alias("sq")
    )
    return (
        g1.groupBy("m")
        .agg(
            F.sum("n").cast("bigint").alias("n_vecs"),
            F.count(F.lit(1)).alias("n_codes_used"),
            F.expr("CAST(MAX(n) AS BIGINT) * 10000 DIV CAST(SUM(n) AS BIGINT)").alias(
                "top_code_share_bp"
            ),
            F.expr("CAST(SUM(sq) AS BIGINT) DIV CAST(SUM(n) AS BIGINT)").alias(
                "mean_qerr_q"
            ),
        )
        .orderBy("m")
    )


# --------------------------------------------------------------------------
# s30: embedding health audit — the pre-indexing sanity gate
# --------------------------------------------------------------------------
# Run before building any index (s05/s08/s17): per label, the norm
# distribution (quantized exact min/max/mean), degenerate-vector counts
# (zero norm, non-finite components, wrong dimensionality) and the
# duplicate-vector count (exact md5 over the quantized component string
# — embedding pipelines emitting the same vector for distinct ids is
# the classic silent upstream bug). One map-side pass + a label-dim
# aggregate; norms quantize at 1e9 half-up before aggregation so every
# reported number is integer-exact.

_S30_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
),
per AS (
  SELECT vec_id, label,
         len(ev) AS dim,
         CASE WHEN len(list_filter(ev, x -> isnan(x) OR NOT isfinite(x))) > 0 THEN NULL
              ELSE CAST(floor(sqrt(list_sum(list_transform(ev, x -> x * x))) * 1e9 + 0.5) AS BIGINT)
         END AS norm_q,
         CASE WHEN len(list_filter(ev, x -> isnan(x) OR NOT isfinite(x))) > 0 THEN 1 ELSE 0 END AS bad,
         md5(list_aggregate(list_transform(ev, x -> CAST(CAST(floor(x * 1e9 + 0.5) AS BIGINT) AS VARCHAR)), 'string_agg', ',')) AS vh
  FROM v
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MIN(norm_q) AS BIGINT) AS min_norm_q,
       CAST(MAX(norm_q) AS BIGINT) AS max_norm_q,
       CAST(SUM(norm_q) AS BIGINT) // COUNT(norm_q) AS mean_norm_q,
       CAST(SUM(CASE WHEN norm_q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(SUM(bad) AS BIGINT) AS n_nonfinite,
       CAST(SUM(CASE WHEN dim <> {_DIM} THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
       CAST(COUNT(*) - COUNT(DISTINCT vh) AS BIGINT) AS n_dup_vectors
FROM per GROUP BY label ORDER BY label
"""


@register("s30_embedding_health", oracle=_S30_ORACLE)
def s30_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("ev")
    )
    per = emb.select(
        "label",
        F.size("ev").alias("dim"),
        F.expr(
            # non-finite vectors report NO norm (they are counted by
            # n_nonfinite; a NaN norm would otherwise cast to 0 and
            # double-count as zero-norm — caught by the degenerate test)
            "CASE WHEN size(filter(ev, x -> isnan(x) OR abs(x) = double('inf'))) > 0 THEN NULL"
            " ELSE CAST(floor(sqrt(aggregate(transform(ev, x -> x * x),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)) * 1e9 + 0.5) AS BIGINT) END"
        ).alias("norm_q"),
        F.expr(
            "CASE WHEN size(filter(ev, x -> isnan(x) OR abs(x) = double('inf'))) > 0"
            " THEN 1 ELSE 0 END"
        ).alias("bad"),
        F.md5(
            F.expr(
                "CAST(array_join(transform(ev,"
                " x -> CAST(CAST(floor(x * 1e9 + 0.5) AS BIGINT) AS STRING)), ',') AS BINARY)"
            )
        ).alias("vh"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm_q").alias("min_norm_q"),
            F.max("norm_q").alias("max_norm_q"),
            F.expr("CAST(SUM(norm_q) AS BIGINT) DIV COUNT(norm_q)").alias("mean_norm_q"),
            F.sum(F.when(F.col("norm_q") == 0, 1).otherwise(0)).cast("bigint").alias("n_zero"),
            F.sum("bad").cast("bigint").alias("n_nonfinite"),
            F.sum(F.when(F.col("dim") != _DIM, 1).otherwise(0)).cast("bigint").alias("n_wrong_dim"),
            (F.count(F.lit(1)) - F.countDistinct("vh")).cast("bigint").alias("n_dup_vectors"),
        )
        .orderBy("label")
    )
