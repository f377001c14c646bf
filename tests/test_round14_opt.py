"""Round-14 (optimization round 2) contract tests.

Pins the behavior round-14 optimizations changed internals of:
- VERDICT r13 item 3: every remaining tombstone broadcast hint is
  size-gated through the on-disk bound (`_gated_tomb_bcast`), covering
  the incremental serve (query_tombstone_postings), the delete apply
  (apply_postings_deletes) and full compaction (compact_postings) —
  BHJ below the bound, shuffled join above it, results identical.
"""

from __future__ import annotations

import os
import shutil

from dbt_osmosis_spark.operators import load_all
from dbt_osmosis_spark.operators.retrieval import (
    ingest_postings_batch,
    query_postings_index,
)
from dbt_osmosis_spark.operators.retrieval_ext import (
    apply_postings_deletes,
    compact_postings,
    query_tombstone_postings,
)
from dbt_osmosis_spark.plans.audit import physical_plan

load_all()


def _scratch(name: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, ".test_scratch", f"{name}-{os.getpid()}")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _build_layout(spark, path):
    shutil.rmtree(path, ignore_errors=True)
    ingest_postings_batch(
        spark,
        _docs(spark, [(1, "alpha beta"), (2, "beta gamma"), (3, "beta beta")]),
        path,
        0,
    )
    ingest_postings_batch(spark, _docs(spark, [(4, "beta delta")]), path, 1)
    apply_postings_deletes(spark, path, _ids(spark, [2]), 0)


def test_incremental_serve_tombstone_broadcast_is_size_conditional(spark, monkeypatch):
    path = _scratch("r14-tomb-incr")
    _build_layout(spark, path)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        monkeypatch.delenv("SPARK_GRAFT_TOMB_BCAST_BYTES", raising=False)
        small = query_tombstone_postings(spark, path, (("q", "beta"),))
        small_plan = physical_plan(small)
        assert "BroadcastHashJoin" in small_plan and "LeftAnti" in small_plan
        monkeypatch.setenv("SPARK_GRAFT_TOMB_BCAST_BYTES", "0")
        big = query_tombstone_postings(spark, path, (("q", "beta"),))
        big_plan = physical_plan(big)
        assert "SortMergeJoin" in big_plan and "LeftAnti" in big_plan
        assert small.collect() == big.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_delete_apply_and_compaction_gated_results_identical(spark, monkeypatch):
    """apply_postings_deletes and compact_postings run their internal
    tombstone joins; the gate must not change what either writes. Build
    the same layout twice — broadcast-hinted vs gate forced off — and
    require byte-identical serve results from both the incremental and
    the compacted layouts."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        results = {}
        for mode in ("bcast", "shuffle"):
            if mode == "bcast":
                monkeypatch.delenv("SPARK_GRAFT_TOMB_BCAST_BYTES", raising=False)
            else:
                monkeypatch.setenv("SPARK_GRAFT_TOMB_BCAST_BYTES", "0")
            path = _scratch(f"r14-tomb-compact-{mode}")
            _build_layout(spark, path)
            out = _scratch(f"r14-tomb-out-{mode}")
            shutil.rmtree(out, ignore_errors=True)
            compact_postings(spark, path, out)
            serve = query_postings_index(spark, out, (("q", "beta"),))
            stats = spark.read.parquet(f"{out}/stats").collect()
            results[mode] = (serve.collect(), stats)
        assert results["bcast"] == results["shuffle"]
        assert len(results["bcast"][0]) == 3  # docs 1, 3, 4 survive
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_legacy_flat_postings_layout_rejected_at_ingest(spark):
    """ADVICE r13: re-ingesting into a pre-round-13 flat tbkt=<b> layout
    must fail loud at write time with the migration instruction, not at
    some later read with CONFLICTING_DIRECTORY_STRUCTURES."""
    import pytest

    path = _scratch("r14-legacy-layout")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(f"{path}/postings/tbkt=3", exist_ok=True)
    with pytest.raises(ValueError, match="rebuild required"):
        ingest_postings_batch(spark, _docs(spark, [(1, "alpha")]), path, 0)
    shutil.rmtree(path, ignore_errors=True)


def test_termset_probe_skipped_below_segment_bound(spark, monkeypatch):
    """Round 14: with fewer live segments than
    $SPARK_GRAFT_TERMSET_PROBE_MIN_SEGS (default 3) the termset probe
    job is skipped — _segments_with_terms returns the segments unchanged
    — and the serve result is identical to the probed serve (pruning is
    a pure optimization either way)."""
    from dbt_osmosis_spark.operators.retrieval_ext import (
        _live_segments,
        _segments_with_terms,
        ingest_segment,
        query_segmented_postings,
    )

    path = _scratch("r14-probe-skip")
    shutil.rmtree(path, ignore_errors=True)
    ingest_segment(spark, _docs(spark, [(1, "alpha beta"), (2, "alpha")]), path, 0,
                   upsert=False)
    ingest_segment(spark, _docs(spark, [(3, "gamma")]), path, 1, upsert=False)
    segs = _live_segments(path)
    assert segs == ["seg-0", "seg-1"]
    # default bound (3): 2 segments -> probe skipped, nothing pruned
    monkeypatch.delenv("SPARK_GRAFT_TERMSET_PROBE_MIN_SEGS", raising=False)
    assert _segments_with_terms(spark, path, segs, ["beta"]) == segs
    skipped = query_segmented_postings(spark, path, (("q", "beta"),)).collect()
    # bound lowered to 2: the probe runs and prunes the beta-free segment
    monkeypatch.setenv("SPARK_GRAFT_TERMSET_PROBE_MIN_SEGS", "2")
    assert _segments_with_terms(spark, path, segs, ["beta"]) == ["seg-0"]
    probed = query_segmented_postings(spark, path, (("q", "beta"),)).collect()
    assert skipped == probed and len(probed) == 1
    shutil.rmtree(path, ignore_errors=True)


def test_upsert_supersede_sinks_empty_without_prior_segments(spark):
    """The supersede builder degenerates to (no sinks, no-op cleanup) on
    a fresh layout — the overlapped submission adds no work to a first
    ingest."""
    from dbt_osmosis_spark.operators.retrieval_ext import _upsert_supersede_sinks

    path = _scratch("r14-supersede-empty")
    shutil.rmtree(path, ignore_errors=True)
    sinks, cleanup = _upsert_supersede_sinks(
        spark, _docs(spark, [(1, "alpha")]), path, 0
    )
    assert sinks == []
    cleanup()  # must be callable and harmless
    shutil.rmtree(path, ignore_errors=True)
