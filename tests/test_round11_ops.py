"""Round-11 operator tests: the doclen sidecar (empty-doc deletes),
the s42 two-phase rank, q84's precondition + decimal accumulators, and
the serve-path guard for delete-free layouts."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all

load_all()


def _scratch(name: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, ".test_scratch", f"{name}-{os.getpid()}")


# --------------------------------------------------------------------------
# q84 precondition: event_id is unique (the re-pairing groupBy's key).
# A duplicated id would silently merge two events' prefix-sum readings
# into garbage n/s/q — this pins the generator contract the operator
# depends on, at the SF the suite runs plus the driver's sf0.01.
# --------------------------------------------------------------------------
def test_events_event_id_unique(spark):
    for sf in ("sf0.001", "sf0.01"):
        ev = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
        total, distinct = ev.agg(
            F.count(F.lit(1)), F.countDistinct("event_id")
        ).first()
        assert total == distinct, f"{sf}: event_id not unique ({total} vs {distinct})"


# --------------------------------------------------------------------------
# q84 accumulators: the cumulative (unbounded) sums must run in
# DECIMAL(38,0), not BIGINT — at 100 TB the running sum of squares
# exceeds 2^63 and ANSI mode would raise ARITHMETIC_OVERFLOW.
# --------------------------------------------------------------------------
def test_q84_cumulative_sums_are_decimal(spark, sf_dir):
    df = QUERIES["q84_rolling_zscore_anomalies"].__wrapped__(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the window aggregation inputs w_s / w_q are decimal-cast before the
    # cumulative sum; if a refactor reverts them to BIGINT the casts vanish
    assert "decimal(38,0)" in plan


# --------------------------------------------------------------------------
# doclen sidecar: deleting a ZERO-TOKEN document must correct n_docs.
# Before the sidecar, an empty doc had no posting rows, so its delete
# could not find its dl and n_docs stayed high by one.
# --------------------------------------------------------------------------
def test_delete_empty_document_corrects_stats(spark):
    from dbt_osmosis_spark.operators.retrieval import ingest_postings_batch
    from dbt_osmosis_spark.operators.retrieval_ext import apply_postings_deletes

    path = _scratch("empty-doc-delete")
    shutil.rmtree(path, ignore_errors=True)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, ""),  # zero-token doc: no posting rows at all
            (3, "alpha alpha delta"),
            (4, "beta"),
        ],
        "doc_id bigint, text string",
    )
    ingest_postings_batch(spark, docs, path, 0)
    # sidecar must record dl=0 for the empty doc
    side = {
        r.doc_id: r.dl
        for r in spark.read.parquet(f"{path}/doclen").select("doc_id", "dl").collect()
    }
    assert side == {1: 3, 2: 0, 3: 3, 4: 1}
    # delete the empty doc AND a normal one
    apply_postings_deletes(
        spark, path, spark.createDataFrame([(2,), (4,)], "doc_id bigint"), 0
    )
    n_docs, sum_dl = (
        spark.read.parquet(f"{path}/stats")
        .agg(F.sum("n_docs"), F.sum("sum_dl"))
        .first()
    )
    # live corpus: docs 1 and 3, 3 tokens each
    assert (n_docs, sum_dl) == (2, 6)


def test_delete_twice_subtracts_once_with_sidecar(spark):
    from dbt_osmosis_spark.operators.retrieval import ingest_postings_batch
    from dbt_osmosis_spark.operators.retrieval_ext import apply_postings_deletes

    path = _scratch("double-delete")
    shutil.rmtree(path, ignore_errors=True)
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "c")], "doc_id bigint, text string"
    )
    ingest_postings_batch(spark, docs, path, 0)
    gone = spark.createDataFrame([(2,)], "doc_id bigint")
    apply_postings_deletes(spark, path, gone, 0)
    apply_postings_deletes(spark, path, gone, 1)  # same doc again
    n_docs, sum_dl = (
        spark.read.parquet(f"{path}/stats")
        .agg(F.sum("n_docs"), F.sum("sum_dl"))
        .first()
    )
    assert (n_docs, sum_dl) == (2, 3)


# --------------------------------------------------------------------------
# serve guard: a freshly-ingested layout with NO delete batch yet must
# serve (empty tombstone set), not raise PATH_NOT_FOUND.
# --------------------------------------------------------------------------
def test_tombstone_serve_without_deletes_dir(spark):
    from dbt_osmosis_spark.operators.retrieval import ingest_postings_batch
    from dbt_osmosis_spark.operators.retrieval_ext import query_tombstone_postings

    path = _scratch("no-deletes-serve")
    shutil.rmtree(path, ignore_errors=True)
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "beta beta")],
        "doc_id bigint, text string",
    )
    ingest_postings_batch(spark, docs, path, 0)
    out = query_tombstone_postings(
        spark, path, (("qx", "alpha"), ("qx", "beta")), k=3
    ).collect()
    assert {r.doc_id for r in out} == {1, 2, 3}


# --------------------------------------------------------------------------
# s42 rank is two-phase: phase 1 ranks within (phrase_id, doc-hash
# bucket); a refactor back to the single-reducer-per-phrase rank drops
# the bucketed pre-phase and this fails.
# --------------------------------------------------------------------------
def test_s42_rank_is_two_phase(spark, sf_dir):
    df = QUERIES["s42_phrase_search"].__wrapped__(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("row_number()") >= 2
    assert "bkt" in plan


# --------------------------------------------------------------------------
# s43 persisted positional postings: the serve scan must list ONLY the
# buckets the phrase terms hash into (static partition pruning), stay
# within a bounded exchange budget, and never go cartesian. The build is
# the corpus-sized job; these gates are on the SERVE plan.
# --------------------------------------------------------------------------
def test_s43_serve_plan_pruned_and_bounded(spark, sf_dir):
    from dbt_osmosis_spark.operators.retrieval_ext import (
        _S42_K,
        _S42_PHRASES,
        _s43_index_path,
        query_phrase_index,
        s43_phrase_index_serve,
    )
    from dbt_osmosis_spark.plans.audit import (
        exchange_count,
        has_cartesian,
        partition_filters,
    )

    s43_phrase_index_serve(spark, sf_dir).collect()  # build index
    serve = query_phrase_index(spark, _s43_index_path(sf_dir), _S42_PHRASES, _S42_K)
    assert not has_cartesian(serve)
    assert any("tbkt" in f and " IN " in f for f in partition_filters(serve))
    # per-phrase: |words|-1 position joins + one count agg; plus the
    # two-phase rank and final sort — all position-list-sized. No
    # tokenization window exchange: the serve never touches the corpus.
    assert exchange_count(serve) <= 16


def test_s43_serve_reads_no_corpus(spark, sf_dir):
    """The whole point of the layout: phrase serve scans the INDEX, not
    documents.parquet."""
    from dbt_osmosis_spark.operators.retrieval_ext import (
        _S42_K,
        _S42_PHRASES,
        _s43_index_path,
        query_phrase_index,
    )
    from dbt_osmosis_spark.plans.audit import physical_plan

    plan = physical_plan(
        query_phrase_index(spark, _s43_index_path(sf_dir), _S42_PHRASES, _S42_K)
    )
    assert "documents.parquet" not in plan
    assert ".postings_positional" in plan
