"""Dedup / duplicate-graph operators, part 3: graph structure and audits
(d25 label propagation, d26 prefix-filtered exact join, d27 residual-dup
audit, d28 k-core hubs).


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


# --------------------------------------------------------------------------
# d26: exact Jaccard pair join via PREFIX FILTERING (AllPairs/PPJoin family)
# --------------------------------------------------------------------------
# The exact counterpart to d03's LSH: same question (all pairs with
# shingle-set Jaccard >= t), ZERO false negatives by construction instead
# of probabilistically-few. The classic inverted-index join (d02) indexes
# EVERY shingle; prefix filtering (Chaudhuri et al., ICDE 2006; Bayardo
# et al., WWW 2007) indexes only each document's p = n - ceil(t*n) + 1
# rarest shingles (global df-ascending order). Completeness: let x be
# the globally-first common token of a qualifying pair. Every a-token
# ordered before x is NOT common, so if x sat outside a's prefix then
# |a∩b| <= na - p_a = ceil(t*na) - 1 < ceil(t*na) <= |a∩b| (J >= t
# forces |a∩b| >= ceil(t*max(na,nb))) — contradiction; symmetrically
# for b. The first common token is therefore in BOTH prefixes, the
# posting-list join finds it, and the join only fans out on RARE
# tokens (the df-hot head of the Zipf curve never enters the index).
# At t = 0.5 the index is ~half of d02's; at the t = 0.8-0.9 used for
# near-verbatim dedup it is a small fraction, and the hottest posting
# lists are exactly the ones pruned. Candidates are exact-verified on the
# full sets (same n_common/sizes arithmetic as d02), so the registered
# result IS d02's result — asserted pair-for-pair in pytest, and the
# oracle below is d02's oracle verbatim.
#
# Scale shape: df table is vocabulary-sized; the per-doc rank window is
# doc-sized; the candidate join shuffles only prefix postings. The
# verify stage joins candidate PAIRS (tiny at real thresholds) against
# the per-doc sorted shingle arrays.

from dbt_osmosis_spark.operators.dedup import _JACCARD_THRESHOLD  # noqa: E402
from dbt_osmosis_spark.operators.dedup import _D02_ORACLE  # noqa: E402
from dbt_osmosis_spark.operators.text import spark_shingles_sql, tokens  # noqa: E402
from dbt_osmosis_spark.sources.parquet import spread  # noqa: E402


@register("d26_prefix_filter_pairs", oracle=_D02_ORACLE)
def d26_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sh = (
        spread(docs)
        .withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select("doc_id", F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"))
    ).transform(keep_cached)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # p = n - ceil(t*n) + 1; at t = 1/2: p = n - (n+1) DIV 2 + 1
    t_num, t_den = 1, 2  # _JACCARD_THRESHOLD as an exact rational
    assert t_num / t_den == _JACCARD_THRESHOLD
    # One groupBy builds each doc's df-ascending shingle list; the prefix
    # is a map-side slice (no per-doc rank windows — a second doc_id
    # shuffle and sort the aggregate already performs).
    prefix = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(df, shingle))),"
                " s -> s.shingle)"
            ).alias("arr")
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"slice(arr, 1, size(arr) - ((size(arr) * {t_num} + {t_den} - 1)"
                    f" DIV {t_den}) + 1)"
                )
            ).alias("shingle"),
        )
    )
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = sh.groupBy("doc_id").agg(F.sort_array(F.collect_list("shingle")).alias("ss"))
    x = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("xs"))
    y = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ys"))
    inter = F.size(F.array_intersect(F.col("xs"), F.col("ys")))
    jac = inter.cast("double") / (F.size("xs") + F.size("ys") - inter)
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# d27: residual-duplication audit — "did dedup work?", by an INDEPENDENT
# detector
# --------------------------------------------------------------------------
# After d09 removes MinHash-LSH duplicate clusters, what duplication
# REMAINS? Asking the same detector is circular (its own edges define
# the kept set); this audit re-measures with the OTHER signature family
# — exact-SimHash collision groups (d04) — on the full corpus vs the
# kept corpus. The report is two summary rows: docs, dup groups, docs
# inside dup groups. A healthy pipeline shows the kept row at or near
# zero; a nonzero kept row quantifies exactly the near-dup mass the
# LSH banding missed (threshold-boundary pairs, cross-component
# simhash twins) — the number a data lead wants before shipping the
# corpus, produced without a second dedup run. Both chains are the
# SHARED definitions (lsh_components, simhash_signatures /
# DUCK_LSH_CTES, DUCK_SIMHASH_CTES), so the audit can never measure a
# different pipeline than the one that ran.

from dbt_osmosis_spark.operators.dedup import DUCK_LSH_CTES  # noqa: E402
from dbt_osmosis_spark.operators.dedup import DUCK_SIMHASH_CTES, simhash_signatures  # noqa: E402
from dbt_osmosis_spark.operators.pipeline import lsh_components  # noqa: E402

_D27_ORACLE = f"""
WITH RECURSIVE {{LSH}},
edges2 AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges2 e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node),
kept AS (SELECT doc_id FROM comp WHERE component = doc_id),
{{SIMHASH}},
full_g AS (SELECT simhash, COUNT(*) AS n FROM sigs GROUP BY simhash),
kept_g AS (
  SELECT s.simhash, COUNT(*) AS n
  FROM sigs s JOIN kept k ON k.doc_id = s.doc_id
  GROUP BY s.simhash
),
summary AS (
  SELECT '0_full' AS corpus,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(COUNT(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS n_dup_groups,
         CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_docs_in_dups
  FROM full_g
  UNION ALL
  SELECT '1_kept', CAST(SUM(n) AS BIGINT),
         CAST(COUNT(CASE WHEN n > 1 THEN 1 END) AS BIGINT),
         CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
  FROM kept_g
)
SELECT corpus, n_docs, n_dup_groups, n_docs_in_dups FROM summary ORDER BY corpus
"""


@register(
    "d27_residual_dup_audit",
    oracle=_D27_ORACLE.format(LSH=DUCK_LSH_CTES, SIMHASH=DUCK_SIMHASH_CTES),
)
def d27_residual_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    comp = lsh_components(docs)
    kept = comp.filter(F.col("component") == F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    sigs = simhash_signatures(docs).transform(keep_cached)

    def summarize(g: DataFrame, tag: str) -> DataFrame:
        return g.agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("n") > 1, 1)).cast("bigint").alias("n_dup_groups"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_docs_in_dups"),
        ).withColumn("corpus", F.lit(tag))

    full_g = sigs.groupBy("simhash").agg(F.count(F.lit(1)).alias("n"))
    kept_g = (
        sigs.join(kept, "doc_id", "left_semi")
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        summarize(full_g, "0_full")
        .unionByName(summarize(kept_g, "1_kept"))
        .select("corpus", "n_docs", "n_dup_groups", "n_docs_in_dups")
        .orderBy("corpus")
    )


# --------------------------------------------------------------------------
# d28: k-core of the duplicate graph — boilerplate-hub detection by peeling
# --------------------------------------------------------------------------
# The 2-core (every node has >= 2 neighbors AFTER iteratively peeling
# degree-1 leaves) separates CHAIN-shaped near-dup structure (A~B~C
# paraphrase drift — peels away entirely) from DENSELY-shared content
# (boilerplate/template hubs — survives peeling). d23's triangle census
# counts closed structure; the k-core NAMES the documents inside it —
# the actual review list before a cluster-collapse. Peeling is the
# textbook iterative-refinement operator: each round filters edges to
# surviving endpoints, recomputes degrees (one groupBy on node ids),
# drops nodes under k. Rounds are UNROLLED to a fixed depth in both
# engines (the d25/q49 bounded-unroll discipline) so the result is fully
# hash-checkable; pytest separately asserts the bounded result IS the
# fixpoint on the test corpus (a fifth peel changes nothing), and the
# production entry point would loop to stability with the d06
# convergence harness. Shuffle volume per round is O(|edges|) on
# doc_id keys — the d25 scale shape.

_D28_K = 2
_D28_ROUNDS = 4


def _peel_round_sql(prev_nodes: str, out_nodes: str) -> str:
    return f"""
e_{out_nodes} AS (
  SELECT e.u, e.v FROM ud e
  JOIN {prev_nodes} a ON a.node = e.u
  JOIN {prev_nodes} b ON b.node = e.v
),
{out_nodes} AS (
  SELECT u AS node FROM e_{out_nodes} GROUP BY u HAVING COUNT(*) >= {_D28_K}
)"""


_D28_ORACLE = f"""
WITH {DUCK_VERIFIED_CTES},
ud AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM verified
),
n0 AS (SELECT DISTINCT u AS node FROM ud),
{','.join(_peel_round_sql(f'n{i}', f'n{i + 1}') for i in range(_D28_ROUNDS))}
SELECT e.u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e_n{_D28_ROUNDS} e
JOIN n{_D28_ROUNDS} a ON a.node = e.u
JOIN n{_D28_ROUNDS} b ON b.node = e.v
GROUP BY e.u
ORDER BY doc_id
"""


@register("d28_kcore_hubs", oracle=_D28_ORACLE)
def d28_kcore_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    vp = verified_pairs(sig).select("doc_a", "doc_b")
    # Lineage discipline (the connected_components lesson, pipeline.py:54):
    # each peel round references the node table TWICE (both edge
    # endpoints), so an un-truncated unroll grows the plan 2^rounds —
    # measured 372 exchanges and 22 s at sf0.1 before the fix. The edge
    # frame is localCheckpoint()ed once up front and the (tiny) node set
    # once per round, capping every round's plan at its own two joins.
    ud = (
        vp.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(vp.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    nodes = ud.select(F.col("u").alias("node")).distinct()
    edges = ud
    for _ in range(_D28_ROUNDS):
        nodes = nodes.localCheckpoint(eager=True)
        na = nodes.select(F.col("node").alias("u"))
        nb = nodes.select(F.col("node").alias("v"))
        edges = ud.join(na, "u").join(nb, "v")
        nodes = (
            edges.groupBy(F.col("u").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _D28_K)
            .select("node")
        )
    final_edges = (
        edges.join(nodes.select(F.col("node").alias("u")), "u")
        .join(nodes.select(F.col("node").alias("v")), "v")
    )
    return (
        final_edges.groupBy(F.col("u").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# d29: modularity scoreboard — which clustering fits the dup graph better?
# --------------------------------------------------------------------------
# d06's connected components and d25's label propagation partition the
# SAME verified-pair graph differently (CC merges everything reachable;
# LPA splits chains at weak vertices). Newman modularity
#   Q = Σ_c [ L_c/m − (D_c/2m)² ]
# (L_c intra-community edges, D_c degree mass, m edges) is the standard
# single number for "how much better than random does this partition
# capture the edge structure" — the quantitative basis for choosing the
# cluster-collapse policy instead of eyeballing d19/d23/d28 diagnostics.
# Exact arithmetic: Q·4m² = Σ_c [4m·L_c − D_c²] is pure BIGINT; the
# report is Q in exact basis points via one integer division. Both
# partitions are computed by the SHARED definitions (lsh_components /
# the d25 round chain), each costing O(|edges|)-keyed shuffles.

_D29_ORACLE = f"""
WITH RECURSIVE {{LSH}},
ud AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM verified
),
-- partition 1: connected components over LSH candidate pairs (d06)
edges2 AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
reach(node, label) AS (
  SELECT DISTINCT u, u FROM ud
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges2 e ON e.src = r.node
),
cc AS (SELECT node, MIN(label) AS label FROM reach GROUP BY node),
-- partition 2: 3-round LPA (d25's chain)
l0 AS (SELECT DISTINCT u AS node, u AS label FROM ud),
{{LPA}},
-- modularity pieces per partition over the VERIFIED edge set
deg AS (SELECT u AS node, COUNT(*) AS d FROM ud GROUP BY u),
m_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM verified),
intra_cc AS (
  SELECT CAST(COUNT(*) AS BIGINT) // 2 AS li, la.label
  FROM ud e JOIN cc la ON la.node = e.u JOIN cc lb ON lb.node = e.v
  WHERE la.label = lb.label GROUP BY la.label
),
dm_cc AS (
  SELECT l.label, CAST(SUM(d.d) AS BIGINT) AS dc
  FROM cc l JOIN deg d ON d.node = l.node GROUP BY l.label
),
q_cc AS (
  SELECT CAST(SUM(4 * m * COALESCE(i.li, 0) - d.dc * d.dc) AS BIGINT) AS num
  FROM dm_cc d CROSS JOIN m_ LEFT JOIN intra_cc i ON i.label = d.label
),
intra_lpa AS (
  SELECT CAST(COUNT(*) AS BIGINT) // 2 AS li, la.label
  FROM ud e JOIN l3 la ON la.node = e.u JOIN l3 lb ON lb.node = e.v
  WHERE la.label = lb.label GROUP BY la.label
),
dm_lpa AS (
  SELECT l.label, CAST(SUM(d.d) AS BIGINT) AS dc
  FROM l3 l JOIN deg d ON d.node = l.node GROUP BY l.label
),
q_lpa AS (
  SELECT CAST(SUM(4 * m * COALESCE(i.li, 0) - d.dc * d.dc) AS BIGINT) AS num
  FROM dm_lpa d CROSS JOIN m_ LEFT JOIN intra_lpa i ON i.label = d.label
),
counts AS (
  SELECT 'cc' AS method, CAST(COUNT(DISTINCT label) AS BIGINT) AS n_communities FROM cc
  UNION ALL
  SELECT 'lpa', CAST(COUNT(DISTINCT label) AS BIGINT) FROM l3
)
SELECT c.method, c.n_communities,
       CASE c.method WHEN 'cc' THEN (SELECT num FROM q_cc)
                     ELSE (SELECT num FROM q_lpa) END * 10000
         // (SELECT 4 * m * m FROM m_) AS q_bp
FROM counts c
ORDER BY c.method
"""


def _modularity(spark_edges: DataFrame, labels: DataFrame, m_df: DataFrame, deg: DataFrame, tag: str) -> DataFrame:
    la = labels.select(F.col("node").alias("u"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("v"), F.col("label").alias("lb"))
    intra = (
        spark_edges.join(la, "u")
        .join(lb, "v")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("li"))
    )
    dm = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(F.sum("d").cast("bigint").alias("dc"))
    )
    num = (
        dm.join(intra, "label", "left")
        .crossJoin(F.broadcast(m_df))
        .agg(
            F.sum(
                F.expr("4 * m * COALESCE(li, 0) - dc * dc")
            ).cast("bigint").alias("num"),
            F.countDistinct("label").alias("n_communities"),
        )
    )
    return num.crossJoin(F.broadcast(m_df)).select(
        F.lit(tag).alias("method"),
        F.col("n_communities").cast("bigint").alias("n_communities"),
        F.expr("num * 10000 DIV (4 * m * m)").alias("q_bp"),
    )


@register(
    "d29_modularity_scoreboard",
    oracle=_D29_ORACLE.format(
        LSH=DUCK_VERIFIED_CTES,
        LPA=",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_D25_ROUNDS)),
    ),
)
def d29_modularity_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.pipeline import lsh_components

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    vp = verified_pairs(sig).select("doc_a", "doc_b").transform(keep_cached)
    # lineage truncation (the d28 lesson): ud feeds both endpoint joins of
    # BOTH partitions' modularity stages — checkpointed once so the
    # megabyte signature lineage isn't re-embedded per branch
    ud = (
        vp.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(vp.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    nodes = ud.select(F.col("u").alias("node")).distinct()
    deg = ud.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    m_df = vp.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    # partition 1: CC restricted to the verified-graph nodes
    cc = (
        lsh_components(docs)
        .select(F.col("id").alias("node"), F.col("component").alias("label"))
        .join(nodes, "node", "left_semi")
    )
    # partition 2: d25's 3-round LPA (same chain, same tie-breaks)
    labels = nodes.withColumn("label", F.col("node"))
    pick = W.partitionBy("node").orderBy(F.desc("c"), "lab")
    for _ in range(_D25_ROUNDS):
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
    cc = cc.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    return (
        _modularity(ud, cc, m_df, deg, "cc")
        .unionByName(_modularity(ud, labels, m_df, deg, "lpa"))
        .orderBy("method")
    )


# ---------------------------------------------------------------------------
# d30: incremental connected-components maintenance — contracted relabel
# ---------------------------------------------------------------------------
# d11/p16 detect which NEW documents duplicate the existing corpus; this
# operator maintains the COMPONENT ASSIGNMENT itself when a batch
# arrives, without re-running CC over the whole corpus. The classic
# union-find-in-bulk move:
#
#   1. base corpus already holds labels L (component = min reachable id);
#   2. the batch contributes new edges: within-batch LSH pairs plus
#      cross batch<->base pairs (signatures are per-doc, so the split
#      pair set is EXACTLY the full-corpus pair set restricted by side —
#      nothing is missed by computing them separately);
#   3. project every new edge onto labels — base endpoint -> its
#      component, batch endpoint -> its own id — and drop self-loops:
#      the CONTRACTED graph, bounded by the new-edge count, never by
#      corpus size;
#   4. run star CC on the contracted graph (touched labels only) and
#      relabel: component'(x) = star(label(x)) where defined, else
#      label(x). Untouched base components and isolated batch docs keep
#      their labels for free.
#
# Exactness: a base component's label is its true min id, and star's
# output is the min over every label merged — which is the min over the
# union of the merged components' member sets, i.e. exactly what a full
# CC over base+batch edges assigns. The oracle IS d06's full-corpus CC,
# so the maintenance theorem is hash-checked, not argued.
#
# Scale shape: per batch the work is signatures/bands over the BATCH,
# one bands join against the base band index (persist it at 100 TB — the
# s34 layout move), star CC over a contracted graph bounded by new
# edges, and one label-keyed relabel join. The full-corpus CC never
# re-runs.

from dbt_osmosis_spark.operators.dedup import lsh_bands, lsh_candidate_pairs  # noqa: E402
from dbt_osmosis_spark.operators.pipeline import (  # noqa: E402
    connected_components_hybrid,
    connected_components_star,
)


from dbt_osmosis_spark.operators.pipeline import _D06_ORACLE  # noqa: E402


@register("d30_incremental_components", oracle=_D06_ORACLE)
def d30_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d06's duplicate-cluster report, produced INCREMENTALLY: base CC
    over 80% of the corpus (doc_id % 5 != 0), then the remaining 20%
    merged in via contracted-graph relabel — byte-identical to the
    full-corpus recompute (the oracle is d06's SQL verbatim)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    base_docs = docs.filter(F.col("doc_id") % 5 != 0)
    batch_docs = docs.filter(F.col("doc_id") % 5 == 0)

    bands_base = keep_cached(lsh_bands(minhash_signatures(base_docs)))
    bands_batch = keep_cached(lsh_bands(minhash_signatures(batch_docs)))

    base_pairs = lsh_candidate_pairs(bands_base).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    base_labels = keep_cached(
        connected_components_hybrid(
            base_docs.select(F.col("doc_id").alias("id")), base_pairs
        )
    )

    batch_pairs = lsh_candidate_pairs(bands_batch).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cross_pairs = (
        bands_batch.alias("b")
        .join(
            bands_base.alias("c"),
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.band_key") == F.col("c.band_key")),
        )
        .select(F.col("b.doc_id").alias("src"), F.col("c.doc_id").alias("dst"))
        .distinct()
    )
    new_edges = batch_pairs.unionByName(cross_pairs)

    # project endpoints onto current labels (batch endpoint = own id)
    lab = base_labels.select(F.col("id").alias("nid"), F.col("component").alias("lab"))
    contracted = (
        new_edges.join(lab.withColumnRenamed("nid", "src_nid"), new_edges.src == F.col("src_nid"), "left")
        .select(
            F.coalesce("lab", "src").alias("lsrc"),
            "dst",
        )
        .join(lab.withColumnRenamed("nid", "dst_nid"), F.col("dst") == F.col("dst_nid"), "left")
        .select(F.col("lsrc").alias("src"), F.coalesce("lab", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    touched = keep_cached(
        contracted.select(F.col("src").alias("id"))
        .unionByName(contracted.select(F.col("dst").alias("id")))
        .distinct()
    )
    star = connected_components_star(touched, contracted).select(
        F.col("id").alias("old_label"), F.col("component").alias("new_label")
    )

    base_final = (
        base_labels.join(star, base_labels.component == star.old_label, "left")
        .select("id", F.coalesce("new_label", "component").alias("component"))
    )
    batch_final = (
        batch_docs.select(F.col("doc_id").alias("id"))
        .join(star, F.col("id") == star.old_label, "left")
        .select("id", F.coalesce("new_label", "id").alias("component"))
    )
    full = base_final.unionByName(batch_final)
    return (
        full.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# d31: degree-mixing curve of the duplicate graph (knn(k))
# ---------------------------------------------------------------------------
# The average-neighbor-degree curve knn(k) (Pastor-Satorras, Vazquez &
# Vespignani, PRL 2001) is the standard degree-mixing diagnostic: on a
# near-dup graph a RISING curve means high-degree nodes attach to other
# high-degree nodes — the signature of template/boilerplate hubs fusing
# into mega-clusters (the d28 k-core finding, seen through mixing instead
# of coreness); a falling curve means hubs absorb leaves (star-shaped
# clone families). Per degree k:
#     knn(k) = SUM over nodes of degree k of (neighbor degrees) / (k * n_k)
# reported in integer micros by pure-integer half-up rounding
#     (2 * 10^6 * S + d) DIV (2 * d),  d = k * n_k
# — no float exists anywhere in this operator.
#
# Edges are THE verified near-dup pair relation (DUCK_VERIFIED_CTES /
# verified_pairs — d03's published contract, the same edges d12/d20/d23/
# d25/d28 consume). Scale shape: degrees are one rollup of the pair
# relation; the neighbor-degree sum is two edge-to-degree hash joins
# (degree relation is node-sized, AQE-broadcast when small); the curve
# rollup is degree-cardinality-sized.

_D31_ORACLE = f"""
WITH {DUCK_VERIFIED_CTES},
ends AS (
  SELECT doc_a AS id, doc_b AS nb FROM verified
  UNION ALL
  SELECT doc_b AS id, doc_a AS nb FROM verified
),
deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM ends GROUP BY id),
nsum AS (
  SELECT e.id, CAST(SUM(dn.d) AS BIGINT) AS s_nb
  FROM ends e JOIN deg dn ON dn.id = e.nb
  GROUP BY e.id
)
SELECT g.d AS k,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(n.s_nb) AS BIGINT) AS sum_neighbor_deg,
       CAST((2 * 1000000 * SUM(n.s_nb) + g.d * COUNT(*))
            // (2 * g.d * COUNT(*)) AS BIGINT) AS knn_micro
FROM deg g JOIN nsum n ON n.id = g.id
GROUP BY g.d
ORDER BY k
"""


@register("d31_degree_mixing_curve", oracle=_D31_ORACLE)
def d31_degree_mixing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn(k) over the verified near-dup graph, integer micros, zero
    floats (module comment)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    from dbt_osmosis_spark.operators.dedup import (
        minhash_signatures,
        verified_pairs,
    )

    sig = minhash_signatures(docs).transform(keep_cached)
    edges = keep_cached(verified_pairs(sig).select("doc_a", "doc_b"))
    ends = edges.selectExpr("doc_a AS id", "doc_b AS nb").unionByName(
        edges.selectExpr("doc_b AS id", "doc_a AS nb")
    )
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    nsum = (
        ends.join(deg.selectExpr("id AS nb", "d AS dn"), "nb")
        .groupBy("id")
        .agg(F.sum("dn").cast("bigint").alias("s_nb"))
    )
    return (
        deg.join(nsum, "id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("s_nb").cast("bigint").alias("sum_neighbor_deg"),
            F.expr(
                "CAST((2 * 1000000 * SUM(s_nb) + d * COUNT(*))"
                " DIV (2 * d * COUNT(*)) AS BIGINT)"
            ).alias("knn_micro"),
        )
        .select(F.col("d").alias("k"), "n_nodes", "sum_neighbor_deg", "knn_micro")
        .orderBy("k")
    )
