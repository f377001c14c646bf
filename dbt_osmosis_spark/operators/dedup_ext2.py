"""Dedup / duplicate-graph operators, part 3: community structure.

d25 is synchronous label propagation (Raghavan et al. 2007) over the
verified near-dup pair graph (d03's relation — one shared definition, so
the edge set cannot drift from what d06/d20/d23 aggregate). Where d06's
connected components answer "what is transitively linked", label
propagation answers the softer "what CLUMPS together" — on chain-shaped
near-dup graphs (A~B~C but A≁C) LPA splits the chain at its weakest
vertex instead of collapsing everything into one keep-group, which is
the behavior a dedup reviewer usually wants before approving a
cluster-collapse (d23's triangle census is the companion diagnostic).

Determinism: labels start as doc_ids; each round every node adopts the
most frequent label among its neighbors with ties broken by MIN label —
a total order, so every round is engine-exact and the unrolled 3-round
result is fully hash-checkable (the same bounded-unroll discipline as
q49's recursive-CTE oracle and d10's fixed-depth chains). Production
note: run rounds to stability with the d06 CC engine's convergence
harness (non-convergence raises there); 3 rounds is the diagnostic
sample, not a convergence claim.

Scale shape: each round is one join of the (sparse) edge list against
the label table on the neighbor key plus one groupBy — both keyed on
doc_id-sized keys, shuffle volume O(|edges|) per round, never all-pairs.
The edge list is built once and cached; signatures release on the next
operator (cache discipline in operators/caching.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.operators.dedup import (
    DUCK_VERIFIED_CTES,
    minhash_signatures,
    verified_pairs,
)
from dbt_osmosis_spark.sources.parquet import read_parquet

_D25_ROUNDS = 3


def _lpa_round_sql(prev: str, out: str) -> str:
    return f"""
c_{out} AS (
  SELECT e.u AS node, l.label AS lab, COUNT(*) AS c
  FROM ud e JOIN {prev} l ON l.node = e.v
  GROUP BY e.u, l.label
),
{out} AS (
  SELECT node, lab AS label FROM (
    SELECT node, lab,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM c_{out}
  ) WHERE rn = 1
)"""


_D25_ORACLE = f"""
WITH {DUCK_VERIFIED_CTES},
ud AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM verified
),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM ud),
{','.join(_lpa_round_sql(f'l{i}', f'l{i + 1}') for i in range(_D25_ROUNDS))}
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(node) AS min_member, MAX(node) AS max_member
FROM l{_D25_ROUNDS}
GROUP BY label
ORDER BY community
"""


@register("d25_label_propagation", oracle=_D25_ORACLE)
def d25_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    vp = verified_pairs(sig).select("doc_a", "doc_b")
    ud = (
        vp.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(vp.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .transform(keep_cached)
    )
    labels = ud.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    pick = W.partitionBy("node").orderBy(F.desc("c"), "lab")
    for _ in range(_D25_ROUNDS):
        # Both sides are corpus-shaped (edges ~ nodes here, and the label
        # table is one row per graph node): force a shuffle hash join.
        # Catalyst's size estimate for the md5-derived label relation is
        # unreliably small — left alone, AQE auto-broadcasts it and the
        # broadcast build OOMs at 10x (measured; the same class of failure
        # the d13/d05 corpus-adaptive widths guard against).
        counts = (
            ud.join(
                labels.select(F.col("node").alias("v"), F.col("label").alias("lab"))
                .hint("shuffle_hash"),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("node", F.col("lab").alias("label"))
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("min_member"),
            F.max("node").alias("max_member"),
        )
        .orderBy("community")
    )
