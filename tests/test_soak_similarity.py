"""Similarity soak test — the 100 TB rehearsal for the ANN paths.

Production vector search sees corpora orders of magnitude beyond what any
single bucket scan should touch. This soak builds a 16×-replicated
embedding corpus (id-salted copies with a tiny deterministic per-copy
perturbation so vectors are near- but not exact duplicates) and asserts
the properties that decide survival at scale:

- LSH bucket boundedness: s02's hyperplane bucketing must keep the probed
  candidate set a small fraction of the corpus — the whole point of the
  bucket is that the 16× corpus does NOT mean 16× more exact rerank work
  per query beyond its own bucket's growth;
- IVF cell balance: s05's md5-deterministic centroids must spread the
  16× corpus across cells such that no cell holds the majority (a
  degenerate assignment would turn nprobe search back into brute force);
- recall stability: brute-force top-1 for a query drawn from the corpus
  must also be found by the IVF probe path (the query's own near-copies
  land in its probed cells);
- bounded wall time (generous — host jitter up to 4×).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators.similarity import _SPARK_BUCKET, _SPARK_CELL
from dbt_osmosis_spark.sources.parquet import read_parquet

_COPIES = 16
_SALT = 1_000_000


def _soaked(spark, sf_dir):
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * _SALT)).alias("vec_id"),
            "label",
            # deterministic tiny perturbation: copy i shifts every component
            # by i * 1e-6 — near-duplicates, not exact, like re-embedded
            # crawl snapshots
            F.expr(f"transform(v, x -> x + {i} * 1e-6d)").alias("v"),
        )
        for i in range(_COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def test_similarity_soak_16x_corpus(spark, sf_dir):
    t0 = time.perf_counter()
    corpus = _soaked(spark, sf_dir).persist()
    try:
        n = corpus.count()
        assert n == 16 * read_parquet(spark, f"{sf_dir}/embeddings.parquet").count()

        # --- LSH buckets stay bounded -----------------------------------
        buckets = corpus.select(F.expr(_SPARK_BUCKET).alias("bucket"))
        sizes = buckets.groupBy("bucket").count().collect()
        largest = max(r["count"] for r in sizes)
        # near-duplicate copies of one vector share its bucket by design,
        # so the largest bucket is ~16x the original largest — but must
        # still be a bounded fraction of the corpus (hyperplanes split the
        # space), never a majority.
        assert largest < 0.6 * n, f"degenerate LSH bucket: {largest}/{n}"
        assert len(sizes) >= 8, "bucket collapse: hyperplanes not splitting"

        # --- IVF cells stay balanced ------------------------------------
        cells = corpus.select(F.expr(_SPARK_CELL.format(a="v")).alias("cell"))
        csizes = cells.groupBy("cell").count().collect()
        clargest = max(r["count"] for r in csizes)
        assert clargest < 0.6 * n, f"degenerate IVF cell: {clargest}/{n}"

        # --- probe-path recall for an in-corpus query -------------------
        # query = original vec 0; its 15 perturbed copies are its nearest
        # neighbors and MUST be reachable through the probed cells (they
        # sit within 16e-6 of the query, so they share its cell or a
        # probed neighbor cell).
        from dbt_osmosis_spark.operators.similarity import _SPARK_PROBE

        q = corpus.filter(F.col("vec_id") == 0).select(
            F.col("v").alias("qv"), F.expr(_SPARK_PROBE.format(a="v")).alias("probe")
        )
        probed = (
            corpus.withColumn("cell", F.expr(_SPARK_CELL.format(a="v")))
            .crossJoin(F.broadcast(q))
            .filter(F.expr("array_contains(probe, cell)"))
        )
        probed_copies = (
            probed.filter((F.col("vec_id") % _SALT) == 0)
            .filter(F.col("vec_id") != 0)
            .count()
        )
        assert probed_copies >= _COPIES - 1, (
            f"probe path lost near-duplicates: {probed_copies}/{_COPIES - 1}"
        )
    finally:
        corpus.unpersist()
    assert time.perf_counter() - t0 < 240, "similarity soak exceeded wall cap"
