"""Search-index lifecycle tour: one positional layout, every query class.

    python examples/search_index_lifecycle.py [sf_dir]

The unified positional-postings layout (operators/retrieval_ext.py)
stores positions ONCE and derives everything else — the Lucene
discipline. This script walks the whole lifecycle the way a serving
deployment would:

  1. BUILD      — one corpus-sized job: tokenize, position-window,
                  term-bucket-partitioned write (+ doclen + stats)
  2. SERVE      — three query classes off the SAME artifact:
                  BM25 ranked search (s45), exact phrase (s43),
                  ordered proximity-within-slop (s46); every scan lists
                  only the probed term buckets
  3. MAINTAIN   — segment ingests (s47), tombstone deletes (layout-
                  generic, doclen-sidecar-backed), size-tiered
                  compaction that rewrites delta rows only (s44
                  machinery, layout-agnostic)
  4. RE-SERVE   — results identical to a fresh build over the live
                  corpus (the invariant every maintained layout here
                  carries; oracle-pinned in the registered queries)

Everything stays a DataFrame; the collects below are top-k-sized.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import load_all
from dbt_osmosis_spark.operators.retrieval import _QUERY_TERMS
from dbt_osmosis_spark.operators.retrieval_ext import (
    _S42_PHRASES,
    _S46_QUERIES,
    compact_segments,
    delete_segmented,
    ingest_positional_segment,
    query_bm25_from_positional,
    query_bm25_segmented,
    query_phrase_index,
    query_phrase_segmented,
    query_proximity_index,
    query_proximity_segmented,
    write_positional_index,
)
from dbt_osmosis_spark.session import get_spark
from dbt_osmosis_spark.sources.parquet import read_parquet


def show(title: str, rows) -> None:
    print(f"\n== {title}")
    for r in rows:
        print("  ", tuple(r))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    load_all()
    spark = get_spark(app_name="search_index_lifecycle")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    work = tempfile.mkdtemp(prefix="search_lifecycle_")

    # 1. BUILD the monolithic layout once; 2. SERVE all three classes.
    mono = f"{work}/mono"
    write_positional_index(spark, docs, mono)
    show("BM25 top-k (from positions)", query_bm25_from_positional(spark, mono, _QUERY_TERMS).collect()[:5])
    show("exact phrases", query_phrase_index(spark, mono, _S42_PHRASES, 3).collect())
    show("proximity within slop", query_proximity_index(spark, mono, _S46_QUERIES, 3).collect())

    # 3. MAINTAIN: the same corpus assembled as segments, then mutated.
    seg = f"{work}/segmented"
    ingest_positional_segment(spark, docs.filter(F.col("doc_id") % 10 < 8), seg, 0)
    ingest_positional_segment(spark, docs.filter(F.col("doc_id") % 10 == 8), seg, 1)
    ingest_positional_segment(spark, docs.filter(F.col("doc_id") % 10 == 9), seg, 2)
    delete_segmented(spark, seg, docs.filter(F.col("doc_id") % 7 == 2).select("doc_id"), 0)
    live = query_phrase_segmented(spark, seg, _S42_PHRASES, 3).collect()
    show("phrases after ingests + deletes", live)
    show("BM25 after ingests + deletes", query_bm25_segmented(spark, seg, _QUERY_TERMS).collect()[:5])
    show("proximity after ingests + deletes", query_proximity_segmented(spark, seg, _S46_QUERIES, 3).collect()[:5])

    stats = compact_segments(spark, seg)
    print(f"\n== compaction: merged {stats['merged']} delta segments -> seg-{stats['new_seg']} (base untouched)")

    # 4. RE-SERVE: identical before/after compaction.
    after = query_phrase_segmented(spark, seg, _S42_PHRASES, 3).collect()
    assert [tuple(r) for r in live] == [tuple(r) for r in after], "compaction changed results"
    print("   serve identical after compaction: OK")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
