"""ANN, part 4: trained-quantizer IVF (s40) — deterministic Lloyd
rounds composed with the s05 probe/re-rank plan.

s05's coarse quantizer is md5-derived (reproducible, but blind to the
data); its docstring has advertised a trained variant since round 4.
pyspark.ml KMeans would not be cross-engine reproducible, so s40
instead UNROLLS the exact-arithmetic Lloyd step p15 already registered:
N deterministic rounds from the same md5 seed centroids, each round's
update computing per-cell per-dimension means as DECIMAL(28,12) sums
(exact, order-free) divided once and rounded to 9 digits — the p15
recipe both engines reproduce bit-for-bit. Every subsequent assignment
argmin tie-breaks by (distance, cell), a total order, so the trained
centroids, the cell assignment, the probe set, and the final top-k are
all fully hash-checkable in DuckDB.

Distributed shape (the 100 TB lens): per Lloyd round, assignment is
MAP-SIDE — the <= 16-row centroid relation is packed into one sorted
array-of-structs row and broadcast, so each vector scores all centroids
in a single fused expression (no |corpus| x |cells| join materializes,
no shuffle) — and the update is one 16-key aggregate with map-side
partials. Training cost = rounds x (one corpus scan + one tiny
shuffle); serving is s05's: probe the nprobe nearest cells, re-rank
candidates exactly, TakeOrderedAndProject. At index-build time the
final assignment persists partitionBy(cell) exactly as s17 does for the
md5 quantizer — the layout, probe pruning, and serve plan are unchanged;
only the centroids are better placed. Empty cells simply drop out of
the centroid relation (both engines derive cells from the same GROUP
BY), shrinking k — the standard Lloyd degeneracy, deterministic here.

Recall: tests/test_round10_ops.py extends the s12 harness — recall@10
of s40 vs s01's exact top-k, side by side with s05's md5 cells — pinning
that training does not regress the corpus's measured recall (1.0 for
that single query). The round-11 `ivf_recall_sweep` below measures the
fuller picture over an 8-query batch across Lloyd rounds x nprobe:
small gains at sf0.01, non-monotone at sf0.001, md5 seed competitive
(SCALE.md round-11 — the honest result).

Reference parity: the reference ships SQL to a warehouse
(src/dbt_osmosis/core/sql_operations.py:69); the ANN family is
engine-side functionality this repo adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.operators.similarity import (
    _DIM,
    _DUCK_CELL,
    _DUCK_DIST2,
    _DUCK_DOT,
    _DUCK_NORM2,
    _K,
    _NPROBE,
    _QUERY_ID,
    _SPARK_DOT,
    _SPARK_NORM2,
    ivf_assign,
)
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_S40_ROUNDS = 2  # Lloyd iterations beyond the md5 seed assignment

# distance of column v to a packed centroid struct c (c.cv: array<double>)
_S40_SPARK_D2 = (
    "aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)),"
    " CAST(0 AS DOUBLE), (acc, w) -> acc + w)"
)
# all-centroid (d2, cell) structs, ascending — array_sort on
# struct<d:double, c:int> orders lexicographically, giving the same
# (distance, cell) argmin tie-break as the oracle's ORDER BY d2, cell.
_S40_SPARK_SCORED = (
    f"array_sort(transform(cents, c -> struct({_S40_SPARK_D2} AS d, c.cell AS c)))"
)

# per-dimension exact mean, the p15 recipe (DECIMAL sums are exact and
# order-free; one double division; round 9 matches across engines)
_S40_SPARK_MEAN = "round(CAST(SUM(CAST(element_at(v, {i}) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9)"
_S40_DUCK_MEAN = "round(CAST(SUM(CAST(v[{i}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9)"


def _duck_round(r: int) -> str:
    """One oracle Lloyd round: centroid update from a{r}, then reassign."""
    means = ", ".join(_S40_DUCK_MEAN.format(i=i + 1) for i in range(_DIM))
    d2 = _DUCK_DIST2.format(a="x.v", b="c.cv", n=_DIM)
    return f"""
c{r + 1} AS (
  SELECT cell, [{means}] AS cv FROM a{r} GROUP BY cell
),
a{r + 1} AS (
  SELECT vec_id, label, v, cell FROM (
    SELECT x.vec_id, x.label, x.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
                              ORDER BY {d2}, c.cell) AS rn
    FROM a{r} x CROSS JOIN c{r + 1} c
  ) z WHERE rn = 1
)"""


def _s40_oracle() -> str:
    rounds = "".join("," + _duck_round(r) for r in range(_S40_ROUNDS))
    d2q = _DUCK_DIST2.format(a="q.qv", b="c.cv", n=_DIM)
    return f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
a0 AS (
  SELECT vec_id, label, v, {_DUCK_CELL.format(a="v")} AS cell FROM vecs
){rounds},
probe AS (
  SELECT c.cell, ROW_NUMBER() OVER (ORDER BY {d2q}, c.cell) AS rn
  FROM (SELECT v AS qv FROM vecs WHERE vec_id = {_QUERY_ID}) q
  CROSS JOIN c{_S40_ROUNDS} c
),
cand AS (
  SELECT a.vec_id, a.label, a.v, q.qv
  FROM a{_S40_ROUNDS} a
  CROSS JOIN (SELECT v AS qv FROM vecs WHERE vec_id = {_QUERY_ID}) q
  WHERE a.cell IN (SELECT cell FROM probe WHERE rn <= {_NPROBE})
    AND a.vec_id <> {_QUERY_ID}
)
SELECT vec_id, label,
       {_DUCK_DOT.format(a="v", b="qv", n=_DIM)}
         / (sqrt({_DUCK_NORM2.format(a="v")}) * sqrt({_DUCK_NORM2.format(a="qv")})) AS cosine
FROM cand
ORDER BY cosine DESC, vec_id
LIMIT {_K}
"""


def _pack_centroids(cents: DataFrame) -> DataFrame:
    """<= 16-row (cell, cv) relation -> ONE row holding a cell-sorted
    array of structs (sort_array makes collect_list's order irrelevant),
    broadcastable next to every vector for map-side assignment."""
    return cents.agg(
        F.sort_array(F.collect_list(F.struct("cell", "cv"))).alias("cents")
    )


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Map-side reassignment against a centroid RELATION (vs s05's
    literal-unrolled seed assignment): broadcast the packed 1-row
    centroid array, score all cells in one fused fold, argmin."""
    return (
        emb.crossJoin(F.broadcast(_pack_centroids(cents)))
        .withColumn("cell", F.expr(f"{_S40_SPARK_SCORED}[0].c"))
        .drop("cents")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Lloyd update: exact per-cell per-dimension means (p15 recipe)."""
    means = [
        F.expr(_S40_SPARK_MEAN.format(i=i + 1)).alias(f"m{i}") for i in range(_DIM)
    ]
    g = assigned.groupBy("cell").agg(*means)
    return g.select(
        "cell", F.array(*[F.col(f"m{i}") for i in range(_DIM)]).alias("cv")
    )


def lloyd_train(emb: DataFrame, rounds: int = _S40_ROUNDS) -> DataFrame:
    """N deterministic Lloyd rounds from the md5 seed assignment;
    returns the trained (cell, cv) centroid relation.

    Round 13 note (measured, deliberately NOT cached): persisting the
    training relation here was tried and REVERTED — same-host A/B on
    s40 at sf0.1 was a wash (2.96 s uncached vs 3.11 s cached best-of-4).
    Each round's reassignment fold must rerun either way (new
    centroids), so caching only saves a cheap columnar scan + cast while
    paying materialization; guide §5 (cache only when recompute beats
    the pressure) and §1.1 (the empirical loop decides). Callers whose
    input IS expensive to recompute persist it themselves before calling
    (retrain_vector_index's tombstone-anti-joined live relation)."""
    assigned = ivf_assign(emb)  # md5 seed cells, distance vector CSE'd
    cents: DataFrame | None = None
    for _ in range(rounds):
        cents = keep_cached(_update(assigned))
        assigned = _assign(emb, cents)
    assert cents is not None
    return cents


@register("s40_ivf_trained_topk", oracle=_s40_oracle())
def s40_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k served from TRAINED centroids: 2 exact Lloyd rounds off
    the md5 seed, then s05's probe/re-rank (nprobe nearest cells, exact
    cosine, TakeOrderedAndProject)."""
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    cents = lloyd_train(emb)
    indexed = _assign(emb, cents)
    q = (
        emb.filter(F.col("vec_id") == _QUERY_ID)
        .crossJoin(F.broadcast(_pack_centroids(cents)))
        .select(
            F.col("v").alias("qv"),
            F.expr(
                f"slice(transform({_S40_SPARK_SCORED}, s -> s.c), 1, {_NPROBE})"
            ).alias("probe"),
        )
    )
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))
    return (
        indexed.crossJoin(F.broadcast(q))
        .filter(F.array_contains(F.col("probe"), F.col("cell")) & (F.col("vec_id") != _QUERY_ID))
        .select("vec_id", "label", (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(_K)
    )


# ---------------------------------------------------------------------------
# Recall-vs-training sweep (VERDICT r10 item 8): does Lloyd training
# actually buy recall at a fixed probe budget on this corpus?
# ---------------------------------------------------------------------------

_SWEEP_QUERY_IDS = tuple(range(8))  # the fixed 8-query eval batch


def _scored_cells_expr(vec_col: str) -> str:
    """(d2, cell) structs of `vec_col` against the packed `cents` array,
    ascending — the s40 assignment expression for an arbitrary column."""
    d2 = (
        f"aggregate(zip_with({vec_col}, c.cv, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS DOUBLE), (acc, w) -> acc + w)"
    )
    return f"array_sort(transform(cents, c -> struct({d2} AS d, c.cell AS c)))"


def ivf_recall_sweep(
    spark: SparkSession,
    sf_dir: str,
    rounds_list: tuple[int, ...] = (0, 1, 2, 4),
    nprobes: tuple[int, ...] = (1, 2),
    k: int = 10,
) -> list[dict]:
    """Measure recall@k of the IVF serve path over an 8-query batch for
    each (Lloyd rounds, nprobe) config, against the exact brute-force
    top-k. rounds=0 is the untrained md5 seed assignment (probe cells
    chosen by distance to the seed cells' means — the same probe rule
    every trained config uses, so the sweep isolates TRAINING, not the
    probe heuristic). Driver-side set comparison is eval-only (the
    8xk id lists are the s12 harness's fixed-size eval batch).
    """
    from dbt_osmosis_spark.operators.caching import keep_cached
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread

    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    qrel = emb.filter(F.col("vec_id").isin(list(_SWEEP_QUERY_IDS))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.expr(_SPARK_DOT.format(a="v", b="qv"))
    n_v = F.expr(_SPARK_NORM2.format(a="v"))
    n_q = F.expr(_SPARK_NORM2.format(a="qv"))

    def topk_ids(cand: DataFrame) -> set[tuple[int, int]]:
        from pyspark.sql.window import Window as W

        ranked = (
            cand.select(
                "query_id",
                "vec_id",
                (dot / (F.sqrt(n_v) * F.sqrt(n_q))).alias("cosine"),
            )
            .withColumn(
                "rnk",
                F.row_number().over(
                    W.partitionBy("query_id").orderBy(
                        F.col("cosine").desc(), F.col("vec_id")
                    )
                ),
            )
            .filter(F.col("rnk") <= k)
        )
        return {(r.query_id, r.vec_id) for r in ranked.collect()}

    exact = topk_ids(
        emb.crossJoin(F.broadcast(qrel)).filter(F.col("vec_id") != F.col("query_id"))
    )
    out: list[dict] = []
    for rounds in rounds_list:
        if rounds == 0:
            indexed = keep_cached(ivf_assign(emb))
            cents = _update(indexed)
        else:
            cents = lloyd_train(emb, rounds)
            indexed = keep_cached(_assign(emb, cents))
        packed = _pack_centroids(cents)
        scored = _scored_cells_expr("qv")
        qcells = qrel.crossJoin(F.broadcast(packed)).select(
            "query_id", "qv", F.expr(f"transform({scored}, s -> s.c)").alias("cells")
        )
        for nprobe in nprobes:
            probe = qcells.select(
                "query_id", "qv", F.slice("cells", 1, nprobe).alias("probe")
            )
            cand = (
                indexed.crossJoin(F.broadcast(probe))
                .filter(
                    F.array_contains(F.col("probe"), F.col("cell"))
                    & (F.col("vec_id") != F.col("query_id"))
                )
            )
            got = topk_ids(cand)
            out.append(
                {
                    "rounds": rounds,
                    "nprobe": nprobe,
                    "recall_micros": int(
                        round(len(got & exact) * 1_000_000 / len(exact))
                    ),
                }
            )
    return out
