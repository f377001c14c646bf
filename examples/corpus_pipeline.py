"""End-to-end training-corpus build: compose the engine's operators.

    python examples/corpus_pipeline.py [sf_dir]

Stages (each is the same code the registered queries run — this script
shows them COMPOSED, one lazy Catalyst plan per stage group):

  1. quality gate        — Gopher-style rules (t12 machinery)
  2. near-dup removal    — MinHash -> LSH -> hybrid connected components,
                           keep each component's min doc (d09 machinery)
  3. decontamination     — broadcast eval-source shingles (p04 machinery)
  4. token-budget select — greedy by quantized score bin, no global sort
                           (p27's plan, applied to the surviving docs)
  5. report              — per-source survival accounting

Everything stays a DataFrame until the final small collects; on a real
cluster the same script writes parquet instead of printing.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import load_all
from dbt_osmosis_spark.operators.pipeline import lsh_components
from dbt_osmosis_spark.operators.text_ext import gopher_features
from dbt_osmosis_spark.session import get_spark
from dbt_osmosis_spark.sources.parquet import read_parquet, spread


def main(sf_dir: str) -> None:
    load_all()
    spark = get_spark(app_name="corpus-pipeline")
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    n0 = docs.count()

    # 1. quality gate
    quality = gopher_features(docs).filter(
        (F.col("n_words") >= 10) & (F.col("frac_alpha") > 0.8)
    )

    # 2. near-dup removal: keep the canonical (min doc_id) per component
    comp = lsh_components(quality.select("doc_id", "text"))
    keep = comp.groupBy("component").agg(F.min("id").alias("doc_id"))
    survivors = quality.join(keep.select("doc_id"), "doc_id", "left_semi")

    # 3. decontamination: drop docs sharing 3-gram shingles with the
    #    held-out source (the benchmark stand-in)
    from dbt_osmosis_spark.operators.text import spark_shingles_sql, tokens

    sh = survivors.withColumn("w", tokens()).filter(F.size("w") >= 3)
    eval_sh = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"))
        .distinct()
    )
    train = sh.filter(F.col("source") != "src0")
    hits = (
        train.select("doc_id", F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"))
        .join(F.broadcast(eval_sh), "shingle")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(hits, "doc_id", "left_anti").drop("w")

    # 4. token-budget selection (p27's bin trick on the surviving docs):
    #    keep the best-scoring ~30% of tokens, no global sort
    scored = clean.select(
        "doc_id",
        "source",
        F.split(F.trim(F.col("text")), " ").alias("w"),
    ).select(
        "doc_id",
        "source",
        F.size("w").cast("bigint").alias("n_tok"),
        F.expr("cast(size(array_distinct(w)) AS BIGINT) * 10000 div size(w)").alias("bin"),
    )
    budget = scored.agg(F.expr("sum(n_tok) * 3 div 10").alias("b"))
    bins = scored.groupBy("bin").agg(F.sum("n_tok").alias("bt"))
    from pyspark.sql.window import Window as W

    above = bins.select(
        "bin",
        F.coalesce(
            F.sum("bt").over(W.orderBy(F.desc("bin")).rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("above"),
    )
    key = F.expr("substr(md5(cast(cast(doc_id AS STRING) AS BINARY)), 1, 15)")
    run = scored.join(F.broadcast(above), "bin").withColumn(
        "thru",
        F.col("above")
        + F.sum("n_tok").over(
            W.partitionBy("bin").orderBy(key.alias("k"), "doc_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    selected = run.crossJoin(F.broadcast(budget)).filter(F.col("thru") <= F.col("b"))

    # 5. report
    out = (
        selected.groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tok").alias("tokens"))
        .orderBy("source")
    )
    n_sel = selected.count()
    print(f"corpus: {n0} docs -> selected {n_sel}")
    out.show(25, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
