"""Index operations tour: updates, snapshots, pruning, vectors.

    python examples/index_operations_tour.py [sf_dir]

Round 12's operability surface on the maintained layouts
(operators/retrieval_ext*.py, operators/similarity_ext5.py):

  1. UPDATE / RE-ADD — delete a doc, re-ingest a revision: the
     generation-scoped tombstones serve the new version (s49)
  2. TIME TRAVEL     — checkpoint_manifest cuts a snapshot; a serve
     pinned to it ignores everything that happened after (s53)
  3. SEGMENT PRUNING — termset sidecars skip segments that provably
     lack the query terms before their files are even listed (s52)
  4. VECTOR INDEX    — the same lifecycle on embeddings: re-embed
     upserts, tombstones, cell-pruned cosine serving (s54)

Everything stays a DataFrame; the collects below are top-k-sized.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import load_all
from dbt_osmosis_spark.operators.retrieval_ext import (
    checkpoint_manifest,
    compact_segments,
    delete_segmented,
    ingest_positional_segment,
    query_bm25_segmented,
    vacuum_segments,
)
from dbt_osmosis_spark.operators.similarity_ext4 import lloyd_train
from dbt_osmosis_spark.operators.similarity_ext5 import (
    _s54_emb,
    ingest_vector_segment,
    query_vectors_segmented,
)
from dbt_osmosis_spark.session import get_spark
from dbt_osmosis_spark.sources.parquet import read_parquet


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="index_operations_tour", cpus=8)
    load_all()
    work = tempfile.mkdtemp(prefix="index_tour_")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    q = (("q", "query"),)

    # -- 1. update / re-add ------------------------------------------------
    idx = f"{work}/text"
    ingest_positional_segment(spark, docs, idx, 0)
    delete_segmented(spark, idx, docs.filter("doc_id % 5 = 0").select("doc_id"), 0)
    revised = docs.filter("doc_id % 10 = 0").withColumn(
        "text", F.concat("text", F.lit(" revised query query"))
    )
    ingest_positional_segment(spark, revised, idx, 1)  # upserts (re-adds half)
    top = query_bm25_segmented(spark, idx, q).collect()
    print(f"1. update/re-add: top-{len(top)} for 'query' over the live corpus")
    for r in top[:3]:
        tag = "revised" if r.doc_id % 10 == 0 else "original"
        print(f"   doc {r.doc_id:>6} score {r.score_micros} ({tag})")

    # -- 2. time travel ------------------------------------------------------
    g = checkpoint_manifest(idx)
    delete_segmented(spark, idx, docs.filter("doc_id % 3 = 1").select("doc_id"), 1)
    compact_segments(spark, idx)
    pinned = query_bm25_segmented(spark, idx, q, mgen=g).collect()
    now = query_bm25_segmented(spark, idx, q).collect()
    print(f"2. time travel: pinned@gen{g} == pre-delete serve: {pinned == top};"
          f" pointer view differs: {now != pinned}")
    vacuum_segments(idx)

    # -- 3. termset segment pruning ------------------------------------------
    pruned_idx = f"{work}/pruned"
    ingest_positional_segment(spark, docs, pruned_idx, 0, upsert=False)
    extra = spark.createDataFrame(
        [(10_000_000, "zzonlyhere zzonlyhere")], "doc_id bigint, text string"
    )
    ingest_positional_segment(spark, extra, pruned_idx, 1, upsert=False)
    rare = query_bm25_segmented(spark, pruned_idx, (("r", "zzonlyhere"),)).collect()
    print(f"3. pruning: 'zzonlyhere' answered from 1 of 2 segments "
          f"(termset sidecar skip): {[r.doc_id for r in rare]}")

    # -- 4. maintained vector index -------------------------------------------
    vec = f"{work}/vectors"
    emb = _s54_emb(spark, sf_dir)
    lloyd_train(emb).write.mode("overwrite").parquet(f"{vec}/centroids")
    cents = spark.read.parquet(f"{vec}/centroids")
    ingest_vector_segment(spark, emb, vec, 0, cents)
    delete_segmented(spark, vec, emb.filter("doc_id % 4 = 1").select("doc_id"), 0)
    reembed = emb.filter("doc_id % 8 = 1").withColumn(
        "v", F.expr("transform(v, x -> x + CAST(0.5 AS DOUBLE))")
    )
    ingest_vector_segment(spark, reembed, vec, 1, cents)  # re-embeds (re-adds half)
    queries = emb.filter("doc_id = 0").select(
        F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
    )
    knn = query_vectors_segmented(spark, vec, queries, cents, k=5, nprobe=4)
    print("4. vector index (4/16 cells probed):")
    for r in knn.collect():
        print(f"   #{r.rnk} vec {r.doc_id:>6} cosine {r.cosine:.4f}")

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
