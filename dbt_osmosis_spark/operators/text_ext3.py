"""Text analysis, part 3: collocation mining.

t23 surfaces statistically-associated word pairs (collocations) via the
PMI lift ratio P(ab) / (P(a)·P(b)), computed on the bigram sample space:
with c_a/c_b the left/right bigram margins and N the bigram total,
lift = c_ab·N / (c_a·c_b). PMI itself is log(lift); log is monotone, so
ranking by the integer lift IS the PMI ranking — and the integer form is
engine-exact (BIGINT multiply + DIV, basis points), where a float log
could disagree in the last ulp across engines.

Scale shape: one explode→groupBy(a,b) shuffle builds the bigram counts;
both margins and the grand total derive from that (vocabulary-sized)
count table with no second pass over text. Margin joins broadcast while
|vocab| ≪ |corpus| (always, by Heaps' law — t21 measures it); the final
report is a deterministic top-200 (TakeOrderedAndProject, no global
sort). Overflow guard: c_ab·N·10⁴ stays under 2^63 through ~10⁹ bigrams
per collocation; past that, widen to DECIMAL(38,0) before the DIV.

Reference parity: the reference ships SQL to a warehouse
(src/dbt_osmosis/core/sql_operations.py); collocation mining is part of
the engine-side corpus-analysis surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_T23_MIN_N = 5
_T23_TOPK = 200

_T23_ORACLE = f"""
WITH toks AS (
  SELECT string_split(trim(text), ' ') AS w FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
big AS (
  SELECT w[i] AS a, w[i + 1] AS b
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
c2 AS (SELECT a, b, COUNT(*) AS n_ab FROM big GROUP BY a, b),
tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n2 FROM c2),
ca AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS c_a FROM c2 GROUP BY a),
cb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS c_b FROM c2 GROUP BY b)
SELECT c2.a, c2.b, n_ab,
       CAST(n_ab AS BIGINT) * n2 * 10000 // (c_a * c_b) AS lift_bp
FROM c2
CROSS JOIN tot
JOIN ca ON ca.a = c2.a
JOIN cb ON cb.b = c2.b
WHERE n_ab >= {_T23_MIN_N}
ORDER BY lift_bp DESC, c2.a, c2.b
LIMIT {_T23_TOPK}
"""


@register("t23_pmi_collocations", oracle=_T23_ORACLE)
def t23_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        F.split(F.trim(F.col("text")), " ").alias("w")
    ).filter(F.size("w") >= 2)
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> struct("
                "element_at(w, i) AS a, element_at(w, i + 1) AS b))"
            )
        ).alias("g")
    ).select("g.a", "g.b")
    c2 = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    tot = c2.agg(F.sum("n_ab").cast("bigint").alias("n2"))
    ca = c2.groupBy("a").agg(F.sum("n_ab").cast("bigint").alias("c_a"))
    cb = c2.groupBy("b").agg(F.sum("n_ab").cast("bigint").alias("c_b"))
    return (
        c2.filter(F.col("n_ab") >= _T23_MIN_N)
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .select(
            "a",
            "b",
            "n_ab",
            F.expr("n_ab * n2 * 10000 DIV (c_a * c_b)").alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "a", "b")
        .limit(_T23_TOPK)
    )
