"""Dedup soak test — the 100 TB rehearsal for the LSH→components pipeline.

A production dedup run sees corpora where many documents repeat many times
(crawl snapshots, mirrored sites). This soak builds a 10×-duplicated corpus
(union of id-salted copies of the sf0.001 documents table — 5 000 docs) and
drives the full d03→d06 path: minhash signatures → band keys → candidate
pairs → iterative connected components. Asserted properties are the ones
that decide whether the pipeline survives scale-up:

- exact component structure: identical copies must land in the same LSH
  buckets as their originals, so the multi-doc component count over the
  soaked corpus equals the TOTAL component count (singletons included) of
  the original corpus — every original component becomes one 10×-sized
  component, no more, no less;
- bounded lineage: the iterative label propagation localCheckpoints every
  5 rounds (operators/pipeline.py:62-66); without it the logical plan
  doubles per round and Catalyst analysis dominates long before 100 TB.
  The final frame's plan must stay below a fixed size regardless of
  iteration count;
- bounded wall time on the 10× corpus (generous cap — this host's timing
  jitter is up to 4×).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators.dedup import (
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
)
from dbt_osmosis_spark.operators.pipeline import connected_components
from dbt_osmosis_spark.sources.parquet import read_parquet

_COPIES = 10
_SALT = 10_000_000


def _components(docs):
    sig = minhash_signatures(docs).persist()
    try:
        pairs = lsh_candidate_pairs(lsh_bands(sig))
        edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        return connected_components(docs.select(F.col("doc_id").alias("id")), edges)
    finally:
        sig.unpersist()


def test_dedup_soak_10x_duplicated_corpus(spark, sf_dir):
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")

    # ground truth: total component count of the ORIGINAL corpus (each
    # becomes exactly one multi-doc component once every doc has 10 copies)
    base_comp = _components(docs)
    expected_components = base_comp.select("component").distinct().count()
    n_docs = docs.count()
    assert expected_components > 0

    soaked = docs
    for c in range(1, _COPIES):
        soaked = soaked.union(
            docs.select((F.col("doc_id") + c * _SALT).alias("doc_id"), "text")
        )

    t0 = time.monotonic()
    comp = _components(soaked).persist()
    try:
        assert comp.count() == n_docs * _COPIES
        clusters = (
            comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
        sizes = {r.component: r.n for r in clusters.collect()}
        elapsed = time.monotonic() - t0
        # every original component (singletons included) is now one
        # multi-doc cluster; no cross-component merges appeared
        assert len(sizes) == expected_components, (
            f"expected {expected_components} clusters, got {len(sizes)}"
        )
        # each cluster's size is an exact multiple of the copy factor
        assert all(n % _COPIES == 0 and n >= _COPIES for n in sizes.values())
        assert sum(sizes.values()) == n_docs * _COPIES
        # canonical representative = min doc_id = an ORIGINAL doc (salted
        # ids are strictly larger), so the keep-list is copy-free
        keeps = comp.groupBy("component").agg(F.min("id").alias("keep"))
        assert keeps.filter(F.col("keep") >= _SALT).count() == 0

        # bounded lineage: localCheckpoint truncation kept the final plan
        # O(rounds/5), not O(2^rounds)
        plan = comp._jdf.queryExecution().executedPlan().toString()
        assert len(plan) < 200_000, f"plan blew up: {len(plan)} chars"

        # generous wall cap: 10x corpus through sig+LSH+CC twice the size
        # of the per-round driver run must stay minutes-scale locally
        assert elapsed < 240, f"soak took {elapsed:.0f}s"
    finally:
        comp.unpersist()
