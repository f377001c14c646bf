"""Per-phase wall-clock breakdown of the lifecycle operators (round 14).

Replays the registered operator bodies with timers between phases so the
optimization effort lands where the seconds are. Usage::

    python tools/profile_lifecycle.py s53 s44 s55 ...

Phases are labelled with setJobDescription for UI cross-checking.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_osmosis_spark.operators import QUERIES, load_all  # noqa: E402
from dbt_osmosis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Phases:
    def __init__(self, spark):
        self.spark = spark
        self.t = []

    def run(self, label, fn):
        self.spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        self.t.append((label, round(time.perf_counter() - t0, 3)))
        self.spark.sparkContext.setJobDescription(None)
        return out


def _release():
    """The registered dispatch releases keep_cached frames on entry to
    every operator; this profiler calls operator INTERNALS directly, so
    it must do the same between replays — a keep_cached frame from rep
    N-1 whose analyzed plan matches a rep-N read (same layout path,
    rmtree'd and rebuilt in between) would otherwise be substituted by
    the CacheManager and resolve rep N-1's deleted part files."""
    from dbt_osmosis_spark.operators.caching import release_caches

    release_caches()


def profile_s53(spark):
    from dbt_osmosis_spark.operators.retrieval import _QUERY_TERMS
    from dbt_osmosis_spark.operators.retrieval_ext import (
        _s47_layout_path,
        checkpoint_manifest,
        compact_segments,
        delete_segmented,
        ingest_positional_segment,
        query_bm25_segmented,
    )
    from dbt_osmosis_spark.operators.retrieval_ext3 import (
        _S53_DEL2_MOD,
        _S53_DEL2_REM,
        _S53_REVISED,
        _S53_SUFFIX,
    )
    from dbt_osmosis_spark.operators.sinks import run_sinks
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread

    docs = spread(read_parquet(spark, f"{SF_DIR}/documents.parquet"))
    path = _s47_layout_path(SF_DIR) + "-tt"
    shutil.rmtree(path, ignore_errors=True)
    p = Phases(spark)
    p.run(
        "s53: base ingests (2, concurrent)",
        lambda: run_sinks(
            lambda: ingest_positional_segment(
                spark, docs.filter(F.col("doc_id") % 10 < 8), path, 0, upsert=False
            ),
            lambda: ingest_positional_segment(
                spark, docs.filter(F.col("doc_id") % 10 >= 8), path, 1, upsert=False
            ),
        ),
    )
    p.run(
        "s53: delete 1",
        lambda: delete_segmented(
            spark, path, docs.filter(F.col("doc_id") % 7 == 2).select("doc_id"), 0
        ),
    )
    g1 = p.run("s53: checkpoint", lambda: checkpoint_manifest(path))
    revised = docs.filter(F.expr(_S53_REVISED)).withColumn(
        "text", F.concat(F.col("text"), F.lit(_S53_SUFFIX))
    )
    p.run(
        "s53: revision ingest (upsert)",
        lambda: ingest_positional_segment(spark, revised, path, 2),
    )
    p.run(
        "s53: delete 2",
        lambda: delete_segmented(
            spark,
            path,
            docs.filter(F.col("doc_id") % _S53_DEL2_MOD == _S53_DEL2_REM).select(
                "doc_id"
            ),
            1,
        ),
    )
    p.run("s53: compact", lambda: compact_segments(spark, path))
    p.run(
        "s53: pinned serve",
        lambda: query_bm25_segmented(spark, path, _QUERY_TERMS, mgen=g1).collect(),
    )
    return p.t


def profile_s44(spark):
    from dbt_osmosis_spark.operators.retrieval import _QUERY_TERMS
    from dbt_osmosis_spark.operators.retrieval_ext import (
        _S39_MOD,
        _S39_REM,
        _s44_layout_path,
        compact_segments,
        delete_segmented,
        ingest_segment,
        query_segmented_postings,
    )
    from dbt_osmosis_spark.operators.sinks import run_sinks
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread

    docs = spread(read_parquet(spark, f"{SF_DIR}/documents.parquet"))
    path = _s44_layout_path(SF_DIR)
    shutil.rmtree(path, ignore_errors=True)
    p = Phases(spark)
    p.run(
        "s44: base ingests (3, concurrent)",
        lambda: run_sinks(
            lambda: ingest_segment(
                spark, docs.filter(F.col("doc_id") % 10 < 8), path, 0, upsert=False
            ),
            lambda: ingest_segment(
                spark, docs.filter(F.col("doc_id") % 10 == 8), path, 1, upsert=False
            ),
            lambda: ingest_segment(
                spark, docs.filter(F.col("doc_id") % 10 == 9), path, 2, upsert=False
            ),
        ),
    )
    p.run(
        "s44: delete",
        lambda: delete_segmented(
            spark,
            path,
            docs.filter(F.col("doc_id") % _S39_MOD == _S39_REM).select("doc_id"),
            0,
        ),
    )
    p.run("s44: compact", lambda: compact_segments(spark, path))
    p.run(
        "s44: serve",
        lambda: query_segmented_postings(spark, path, _QUERY_TERMS).collect(),
    )
    return p.t


def profile_s55(spark):
    from dbt_osmosis_spark.operators.retrieval_ext import delete_segmented
    from dbt_osmosis_spark.operators.similarity_ext4 import lloyd_train
    from dbt_osmosis_spark.operators.similarity_ext5 import (
        _S54_DEL_MOD,
        _S54_DEL_REM,
        _S54_QUERY_IDS,
        _S54_REV_MOD,
        _S54_REV_REM,
        _s54_emb,
        _s54_layout_path,
        index_centroids,
        ingest_vector_segment,
        query_vectors_segmented,
        retrain_vector_index,
    )
    from dbt_osmosis_spark.operators.sinks import run_sinks

    emb = _s54_emb(spark, SF_DIR)
    path = _s54_layout_path(SF_DIR) + "-rt"
    shutil.rmtree(path, ignore_errors=True)
    p = Phases(spark)
    base = emb.filter(F.col("doc_id") % 10 < 8)
    p.run(
        "s55: lloyd train + write",
        lambda: lloyd_train(base).write.mode("overwrite").parquet(f"{path}/centroids"),
    )
    cents = spark.read.parquet(f"{path}/centroids")
    p.run(
        "s55: base ingests (2, concurrent)",
        lambda: run_sinks(
            lambda: ingest_vector_segment(spark, base, path, 0, cents, upsert=False),
            lambda: ingest_vector_segment(
                spark,
                emb.filter(F.col("doc_id") % 10 >= 8),
                path,
                1,
                cents,
                upsert=False,
            ),
        ),
    )
    p.run(
        "s55: delete",
        lambda: delete_segmented(
            spark,
            path,
            emb.filter(F.col("doc_id") % _S54_DEL_MOD == _S54_DEL_REM).select(
                "doc_id"
            ),
            0,
        ),
    )
    revised = emb.filter(F.col("doc_id") % _S54_REV_MOD == _S54_REV_REM).withColumn(
        "v", F.expr("transform(v, x -> x + CAST(1.0 AS DOUBLE))")
    )
    p.run(
        "s55: re-embed ingest (upsert)",
        lambda: ingest_vector_segment(spark, revised, path, 2, cents),
    )
    p.run("s55: retrain", lambda: retrain_vector_index(spark, path))
    queries = emb.filter(F.col("doc_id").isin(*_S54_QUERY_IDS)).select(
        F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
    )
    p.run(
        "s55: serve",
        lambda: query_vectors_segmented(
            spark, path, queries, index_centroids(spark, path)
        ).collect(),
    )
    return p.t


PROFILES = {"s53": profile_s53, "s44": profile_s44, "s55": profile_s55}


def main() -> None:
    names = sys.argv[1:] or list(PROFILES)
    load_all()
    spark = get_spark(app_name="profile-lifecycle")
    # one warm pass at the smallest SF so JIT/codegen is out of the numbers
    global SF_DIR
    real = SF_DIR
    for n in names:
        SF_DIR = "/root/testdata/sf0.001"
        PROFILES[n](spark)
        _release()
    SF_DIR = real
    out = {}

    def _rep(n):
        _release()
        return PROFILES[n](spark)

    for n in names:
        reps = [_rep(n) for _ in range(2)]
        # best-of-2 per phase
        best = [
            (reps[0][i][0], min(r[i][1] for r in reps)) for i in range(len(reps[0]))
        ]
        out[n] = best
        total = sum(v for _, v in best)
        print(f"== {n} (total {total:.2f}s) ==")
        for label, sec in best:
            print(f"  {sec:7.3f}  {label}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
