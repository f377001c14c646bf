"""Cache hygiene soak: a long-lived session (serve/workbench/parity
harness) runs many persisting operators back-to-back; cached sketch and
signature frames must not accumulate.

Discipline under test (operators/caching.py): every operator persist goes
through ``keep_cached``; the registry dispatch releases the previous
operator's frames on entry, and ``release_caches()`` gives callers a hard
floor.  Asserted: the Catalyst cache manager returns to empty between
operators, and persistent-RDD block count stays bounded across the run.
"""

from __future__ import annotations

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.operators.caching import release_caches

load_all()

# Every operator that persists an intermediate via keep_cached, in one
# session, back to back.
_PERSISTING_OPS = [
    "d02_ngram_jaccard_pairs",
    "d03_minhash_lsh_pairs",
    "d06_dedup_components",
    "d09_dedup_keep",
    "d07_simhash_neardup",
    "d08_containment_pairs",
    "d10_crossdoc_ngram_rate",
    "d11_incremental_neardup",
    "d12_pagerank_dupgraph",
    "d13_semantic_dedup",
    "d14_dedup_eval",
    "d15_repeated_span_coverage",
    "p04_decontaminate",
    "p18_training_corpus",
]


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_operator_caches_released_between_operators(spark, sf_dir):
    release_caches()
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    # localCheckpoint blocks from earlier tests' connected-components runs
    # are reclaimed by the ContextCleaner only after JVM GC — nudge it and
    # measure growth RELATIVE to whatever still lingers, so the invariant
    # (no cross-operator accumulation) doesn't depend on test order.
    spark.sparkContext._jvm.System.gc()
    import time as _time

    _time.sleep(2)
    baseline = _persistent_rdd_count(spark)

    high_water = 0
    for i, name in enumerate(_PERSISTING_OPS):
        # the registry dispatch releases the PREVIOUS op's frames on entry
        QUERIES[name](spark, sf_dir).collect()
        high_water = max(high_water, _persistent_rdd_count(spark))
        if i > 0:
            # after op N ran, op N-1's frames must be gone: only the
            # frames keep_cached by the current operator may be live.
            # d15 tracks 2 frames, d11 2, the rest <=1, plus bounded
            # localCheckpoint blocks from connected-components helpers.
            assert _persistent_rdd_count(spark) - baseline <= 8, (
                f"cache accumulation after {name}: "
                f"{_persistent_rdd_count(spark)} persistent RDDs "
                f"(baseline {baseline})"
            )

    # explicit floor: after release, the catalog cache list is empty
    released = release_caches()
    assert released >= 1  # the final operator's frames were still pending
    assert _cache_manager_empty(spark), "release_caches left cached plans behind"
    # high-water across 14 persisting operators stays one-operator-sized,
    # not 12-operators-sized
    assert high_water - baseline <= 10, (
        f"high-water {high_water} persistent RDDs (baseline {baseline})"
    )
