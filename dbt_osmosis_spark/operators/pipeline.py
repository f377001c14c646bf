"""Training-data pipeline operators: dedup clustering, reproducible
sampling, sequence packing, decontamination, redaction, vocabulary.

These extend the reference's surface (z3z1ma/dbt-osmosis delegates all data
processing to the warehouse adapter, src/dbt_osmosis/core/sql_operations.py:60-71)
with the operations a 100 TB pretraining-data pipeline actually runs. Scale
posture per operator:

- **d06 connected components**: LSH candidate pairs (one shuffle on band
  key, operators/dedup.py) -> iterative min-label propagation. Each round is
  one join + one groupBy on the edge key — the same shuffle pattern
  large-star/small-star uses; rounds ~ graph diameter (near-dup graphs are
  shallow: clusters are cliques-ish, diameter 2-3). Convergence is detected
  with a monotone label-sum, one tiny agg job per round. No driver-side
  graph: edges and labels stay DataFrames throughout.
- **p01/p02 sampling**: md5-threshold sampling is a map-side FILTER — zero
  shuffle, reproducible across runs/engines/partitionings (unlike
  df.sample, whose output depends on partition layout). Stratified variant
  pays one window shuffle on the stratum key.
- **p03 sequence packing**: the concat-and-chunk packing every LLM trainer
  uses; one window per source partition. At skewed corpora, salt the
  source key or pack per-partition with mapInPandas.
- **p04 decontamination**: the eval/benchmark shingle set is tiny by
  construction — broadcast it; the train side never shuffles.
- **p05 redaction**: pure map-side regexp; PII presets (email/phone/ssn)
  exposed for real corpora, term-list used for the synthetic oracle corpus.
- **t06 vocabulary**: explode -> groupBy(word) with map-side partial
  aggregation soaking up token skew; top-k is TakeOrderedAndProject (no
  global sort).

All oracle-checkable: md5-based keys and integer-exact ratios compute
bit-identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.operators.dedup import (
    DUCK_LSH_CTES,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
)
from dbt_osmosis_spark.operators.text import _DUCK_TOK, _duck_shingles, spark_shingles_sql, tokens
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

# ---- d06: dedup clustering (connected components over LSH pairs) -----------


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Min-label propagation: (id) + (src, dst) -> (id, component) where
    component = min node id reachable. Each iteration: propagate labels one
    hop (join + groupBy-min), take the elementwise min. Labels only ever
    decrease, so sum(label) is a monotone convergence witness — when it
    stops falling, we are at the fixpoint. Iterations ~ graph diameter.

    Lineage is truncated at TWO points, both load-bearing at scale:

    - the undirected edge frame is localCheckpoint()ed ONCE up front. Every
      round's label plan embeds the edge plan; when edges come out of an
      expensive pipeline (the LSH candidate generator's unrolled minhash
      expressions are ~1 MB of plan text), a merely persist()ed frame
      re-embeds that megabyte into EVERY round — the dedup soak test caught
      a 4 MB final plan on a diameter-2 graph this way. Checkpointing costs
      nothing extra (the frame was being materialized anyway) and caps the
      per-round plan at the join itself. On a cluster with flaky executors
      use reliable checkpoint(dir) instead — same truncation, replayable.
    - every 5 rounds the LABEL frame is localCheckpoint()ed: the label plan
      otherwise doubles per iteration (each round embeds the last), and
      past ~10 rounds Catalyst analysis time dominates on high-diameter
      graphs. Together these keep plan size O(1) per round."""
    labels, converged = _min_label_rounds(nodes, edges, max_iter)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the cap) — partial labels would be "
            "silently wrong. Raise max_iter, or use "
            "connected_components_hybrid/_star (O(log^2 n) rounds)."
        )
    return labels.select(F.col("id"), F.col("label").alias("component"))


def _min_label_rounds(
    nodes: DataFrame, edges: DataFrame, max_iter: int
) -> tuple[DataFrame, bool]:
    """The min-label loop body shared by connected_components (runs to
    convergence) and connected_components_hybrid (bounded rounds).
    Returns (labels, converged)."""
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = nodes.select("id", F.col("id").alias("label")).persist()
    converged = False
    prev_sum = None
    for i in range(max_iter):
        nbr = (
            und.join(labels, und["src"] == labels["id"])
            .groupBy(und["dst"].alias("nid"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = labels.join(nbr, labels["id"] == nbr["nid"], "left").select(
            labels["id"],
            F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("label"),
        )
        if (i + 1) % 5 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        cur_sum = new_labels.agg(F.sum("label")).first()[0]
        # DataFrame.unpersist releases persist()ed rounds immediately. For
        # localCheckpoint-ed rounds it is a no-op (the cacheManager never
        # tracked them); those blocks are reclaimed by Spark's
        # ContextCleaner once the frame is dereferenced below — so at most
        # one checkpointed label set (1 per 5 rounds) awaits cleanup at a
        # time, bounded regardless of iteration count.
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    # und was localCheckpoint()ed, not persist()ed — its blocks are
    # reclaimed by the ContextCleaner when the frame is dereferenced on
    # return; there is nothing to unpersist here.
    #
    # Truncate the RETURNED plan: each round's label plan references the
    # previous round twice (join side + neighbor side), so the final
    # lineage is ~2^rounds copies of the base — runtime dedupes through
    # the per-round persist, but downstream plans (d09's joins, plan
    # audits, exchange counts) would carry the exponential TEXT. The
    # frame is tiny (id, label) and already materialized; an eager
    # checkpoint caps it at a flat scan.
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()  # the checkpoint replaces the cache entirely
    return out, converged


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC 2014):
    same exact components as min-label propagation, but rounds are
    O(log^2 n) instead of O(diameter) — the difference that matters on
    chain-shaped dup graphs (the r5 sf1 probe measured min-label at 15+
    rounds / 75 exchanges on a 10x corpus; star converges in ~4 rounds on
    the same graph).

    Per round over the edge multiset E (kept deduplicated):
    - large-star: per node u with symmetric neighborhood G(u), let
      m = min(G(u) + {u}); rewrite every edge to a LARGER neighbor as
      (v, m) for v in G(u), v > u.
    - small-star: orient edges child>=parent as (c, p); per child c let
      m = min(parents(c) + {c}); rewrite to (v, m) for v in
      parents(c) + {c}, v != m.
    The fixed point is a forest of stars rooted at each component's
    minimum id; labels read off as the per-node min parent. Convergence
    is detected exactly (equal edge count + empty set difference). Edge
    state is localCheckpoint()ed per round — same lineage-capping
    rationale as min-label's every-5-rounds policy, needed every round
    here because both stars rewrite the whole frame."""
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev, prev_chk = None, None
    for _ in range(max_iter):
        # large-star over the symmetric neighborhood; duplicate edges are
        # idempotent rewrites, so no mid-round distinct — one dedup per
        # round (below) keeps the frame tight without an extra shuffle
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m_l = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_l, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star over child>=parent orientation
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m_s = oriented.groupBy("u").agg(F.min("v").alias("m"))  # parents <= u -> min(parents) <= u
        rewritten = oriented.join(m_s, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).union(m_s.select(F.col("u"), F.col("m").alias("v")))
        e = (
            rewritten.filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # one-job convergence probe: order-free checksum; on a hit, confirm
        # with the exact set test (equal counts already known -> exceptAll
        # empty == set equality). The checksum can only defer convergence
        # one round on a collision-miss, never terminate early wrongly.
        chk = e.agg(
            F.count(F.lit(1)).alias("n"), F.sum("u").alias("su"), F.sum("v").alias("sv")
        ).first()
        cur = (chk["n"], chk["su"], chk["sv"])
        if cur == prev_chk and e.exceptAll(prev).isEmpty():
            break
        prev, prev_chk = e, cur
    else:
        raise RuntimeError(
            f"connected_components_star did not reach its fixed point in "
            f"{max_iter} rounds — partial star edges would yield silently "
            "wrong components. Raise max_iter (rounds are O(log^2 n), so "
            "this indicates either a pathological graph or a bug)."
        )
    roots = e.select(F.greatest("u", "v").alias("id"), F.least("u", "v").alias("r"))
    comp = roots.groupBy("id").agg(F.min("r").alias("r"))
    return nodes.join(comp, "id", "left").select(
        "id", F.coalesce("r", F.col("id")).alias("component")
    )


def connected_components_hybrid(
    nodes: DataFrame, edges: DataFrame, label_rounds: int = 4, max_iter: int = 20
) -> DataFrame:
    """Best-of-both CC engine (what lsh_components actually runs):

    1. up to ``label_rounds`` rounds of min-label propagation — the cheap
       loop that fully resolves SHALLOW dup graphs (the common case for
       near-dup components: most are pairs/triangles, diameter <= 3);
    2. if not converged, CONTRACT the graph by the partial labels
       (edge (s, d) -> (label(s), label(d)), self-loops dropped) and
       finish with large-star/small-star on the quotient — O(log^2 n)
       rounds on whatever deep chains remain, over a graph that the
       contraction has already shrunk by the resolved components;
    3. compose: component(id) = star_component(label(id)). Exact: the
       quotient preserves connectivity, and a component's true minimum
       keeps itself as label in min-label, so star's minima ARE the
       original minima.

    Shallow graphs pay exactly what min-label costs today; chain-shaped
    graphs (r5 sf1 probe: 15+ min-label rounds) pay 4 cheap rounds plus a
    handful of star rounds on the contracted graph."""
    labels, converged = _min_label_rounds(nodes, edges, label_rounds)
    if converged:
        return labels.select("id", F.col("label").alias("component"))
    contracted = (
        edges.join(labels.select(F.col("id").alias("src"), F.col("label").alias("ls")), "src")
        .join(labels.select(F.col("id").alias("dst"), F.col("label").alias("ld")), "dst")
        .select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    qnodes = labels.select(F.col("label").alias("id")).distinct()
    star = connected_components_star(qnodes, contracted, max_iter=max_iter).select(
        F.col("id").alias("label"), "component"
    )
    return labels.join(star, "label").select("id", "component")


_D06_ORACLE = f"""
WITH RECURSIVE {DUCK_LSH_CTES},
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
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
)
SELECT c.component,
       COUNT(*) AS n_docs,
       MIN(c.doc_id) AS keep_doc_id
FROM comp c
GROUP BY c.component
HAVING COUNT(*) > 1
ORDER BY c.component
"""


def lsh_components(docs: DataFrame) -> DataFrame:
    """The shared MinHash→LSH→connected-components chain behind d06/d09:
    (id, component) for every doc, component = min reachable doc_id.
    Uses the hybrid CC engine: cheap min-label rounds for the shallow
    common case, then label-contraction + large-star/small-star for any
    deep chains (min-label alone needed 15+ rounds on the r5 sf1 probe's
    10x corpus); all engines compute the same exact components (tests
    assert equality, the d06/d09 oracles gate it)."""
    sig = minhash_signatures(docs).transform(keep_cached)
    pairs = lsh_candidate_pairs(lsh_bands(sig))
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return connected_components_hybrid(docs.select(F.col("doc_id").alias("id")), edges)


@register("d06_dedup_components", oracle=_D06_ORACLE)
def d06_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: transitive closure of MinHash-LSH candidate pairs;
    keep_doc_id = the canonical representative (min id). Reports only
    multi-doc components (the dedup 'drop list' is everything else in them).
    """
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    comp = lsh_components(docs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("component")
    )


# ---- d09: end-to-end near-dup removal → the kept corpus --------------------
# d03 emits candidate pairs and d06 the duplicate clusters; this is the op
# users actually run: the full MinHash→LSH→connected-components pipeline
# ending in the deduplicated corpus itself (canonical = min doc_id per
# component; singletons keep themselves, so "kept" is simply
# component == doc_id). The drop set is tiny relative to the corpus, so the
# final membership test is a LEFT SEMI join on doc_id — one shuffle of ids,
# never a second pass over text. At 100 TB you would persist `comp`
# partitioned by doc_id alongside the corpus and let the semi join
# co-locate.

_D09_ORACLE = f"""
WITH RECURSIVE {DUCK_LSH_CTES},
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
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN comp c ON c.doc_id = d.doc_id
WHERE c.component = d.doc_id
ORDER BY d.doc_id
"""


@register("d09_dedup_keep", oracle=_D09_ORACLE)
def d09_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    comp = lsh_components(docs)
    kept = comp.filter(F.col("component") == F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    return (
        docs.join(kept, "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# ---- p01: deterministic hash sampling --------------------------------------
# Reproducible ~rate sampling by md5(key) threshold. Unlike df.sample(),
# membership depends only on the key — stable across runs, partitionings,
# engines, and incremental re-ingests (a doc stays in/out forever).

_P01_THRESHOLD = "1999"  # 4 hex chars: 0x1999/0x10000 ~ 9.998%

_SPARK_SAMPLE_KEY = "substr(md5(cast(cast(doc_id AS STRING) AS BINARY)), 1, 4)"
_DUCK_SAMPLE_KEY = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"

_P01_ORACLE = f"""
SELECT doc_id, lang, source, n_chars, {_DUCK_SAMPLE_KEY} AS sample_key
FROM documents
WHERE {_DUCK_SAMPLE_KEY} < '{_P01_THRESHOLD}'
ORDER BY doc_id
"""


@register("p01_hash_sample", oracle=_P01_ORACLE)
def p01_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    key = F.expr(_SPARK_SAMPLE_KEY)
    return (
        docs.select("doc_id", "lang", "source", "n_chars", key.alias("sample_key"))
        .filter(F.col("sample_key") < _P01_THRESHOLD)
        .orderBy("doc_id")
    )


# ---- p02: stratified sampling (exact n per stratum) ------------------------
# Exactly n docs per language, chosen by md5 rank — deterministic and
# order-free. One shuffle on the stratum key; rank is row_number so ties
# are impossible (md5 of distinct ids never collides at 4-char... the
# full 32-char digest is used for ordering).

_P02_PER_STRATUM = 20

_P02_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents
),
ranked AS (
  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k) AS rk
  FROM keyed
)
SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk
FROM ranked
WHERE rk <= {_P02_PER_STRATUM}
ORDER BY lang, rk
"""


@register("p02_stratified_sample", oracle=_P02_ORACLE)
def p02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("k"),
    )
    w = Window.partitionBy("lang").orderBy("k")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _P02_PER_STRATUM)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


# ---- p03: sequence packing (concat-and-chunk into token budgets) -----------
# Assign each doc to a training sequence: within a source, docs are laid out
# in doc_id order and chunked every BUDGET tokens (the standard
# concatenate-then-split packing). seq_id = floor(tokens_before / budget).

_P03_BUDGET = 256

_P03_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, len({_DUCK_TOK}) AS n_tok FROM documents
),
laid AS (
  SELECT doc_id, source, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
  FROM tok
),
packed AS (
  SELECT source, CAST(floor(tokens_before / {_P03_BUDGET}.0) AS BIGINT) AS seq_id, n_tok
  FROM laid
)
SELECT source, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS seq_tokens
FROM packed
GROUP BY source, seq_id
ORDER BY source, seq_id
"""


@register("p03_sequence_packing", oracle=_P03_ORACLE)
def p03_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    tok = docs.select("doc_id", "source", F.size(tokens()).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = tok.withColumn("tokens_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    seq_id = F.floor(F.col("tokens_before") / float(_P03_BUDGET)).cast("bigint")
    return (
        laid.select("source", seq_id.alias("seq_id"), "n_tok")
        .groupBy("source", "seq_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("seq_tokens"))
        .orderBy("source", "seq_id")
    )


# ---- p04: benchmark decontamination (shingle overlap vs eval set) ----------
# Flag training docs sharing too many 3-gram shingles with a benchmark/eval
# corpus (here: source 'src0' stands in for the eval set). The eval shingle
# set is small by construction (benchmarks are) — broadcast it so the train
# side scans once with zero shuffle before the per-doc count.

_P04_EVAL_SOURCE = "src0"
_P04_THRESHOLD = 0.5

_P04_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {_DUCK_TOK} AS w FROM documents
),
sh AS (
  SELECT doc_id, source, unnest({_duck_shingles(3)}) AS shingle
  FROM tok WHERE len(w) >= 3
),
eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE source = '{_P04_EVAL_SOURCE}'
),
train_sh AS (
  SELECT doc_id, shingle FROM sh WHERE source <> '{_P04_EVAL_SOURCE}'
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM train_sh GROUP BY doc_id
),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hit
  FROM train_sh t JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY t.doc_id
)
SELECT h.doc_id, h.n_hit, s.n_shingles,
       CAST(h.n_hit AS DOUBLE) / s.n_shingles AS contamination
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
WHERE CAST(h.n_hit AS DOUBLE) / s.n_shingles >= {_P04_THRESHOLD}
ORDER BY h.doc_id
"""


@register("p04_decontaminate", oracle=_P04_ORACLE)
def p04_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sh = (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"),
        )
    ).transform(keep_cached)
    eval_sh = sh.filter(F.col("source") == _P04_EVAL_SOURCE).select("shingle").distinct()
    train_sh = sh.filter(F.col("source") != _P04_EVAL_SOURCE).select("doc_id", "shingle")
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contamination = F.col("n_hit").cast("double") / F.col("n_shingles")
    return (
        hits.join(sizes, "doc_id")
        .select("doc_id", "n_hit", "n_shingles", contamination.alias("contamination"))
        .filter(F.col("contamination") >= _P04_THRESHOLD)
        .orderBy("doc_id")
    )


# ---- p05: redaction (PII presets + term lists), map-side regexp ------------

# Real-corpus presets. Character-class-only syntax so Java regex (Spark) and
# RE2 (DuckDB) agree; exercised in unit tests on constructed rows because
# the synthetic corpus contains no PII.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
    "phone": r"[+]?[0-9][0-9 ()-]{6,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

_P05_TERMS = "customer|spark"  # stand-in sensitive terms for the oracle corpus
_P05_MASK = "[REDACTED]"

_P05_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_P05_TERMS}')) AS INTEGER) AS n_redacted,
       regexp_replace(text, '{_P05_TERMS}', '{_P05_MASK}', 'g') AS redacted_text
FROM documents
WHERE len(regexp_extract_all(text, '{_P05_TERMS}')) > 0
ORDER BY doc_id
"""


def redact(df: DataFrame, text_col: str, patterns: list[str], mask: str = _P05_MASK) -> DataFrame:
    """Replace every match of every pattern with the mask; add n_redacted.
    Pure per-row regexp — embarrassingly parallel, no shuffle."""
    combined = "|".join(f"({p})" for p in patterns)
    n = F.size(F.expr(f"regexp_extract_all({text_col}, '{combined}', 0)"))
    return df.withColumn("n_redacted", n).withColumn(
        "redacted_text", F.regexp_replace(F.col(text_col), combined, mask)
    )


@register("p05_redact_terms", oracle=_P05_ORACLE)
def p05_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    n = F.size(F.expr(f"regexp_extract_all(text, '{_P05_TERMS}', 0)"))
    return (
        docs.select(
            "doc_id",
            n.alias("n_redacted"),
            F.regexp_replace("text", _P05_TERMS, _P05_MASK).alias("redacted_text"),
        )
        .filter(F.col("n_redacted") > 0)
        .orderBy("doc_id")
    )


# ---- t06: corpus vocabulary (top-k terms by frequency) ---------------------

_T06_TOPK = 100

_T06_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest({_DUCK_TOK}) AS word FROM documents
)
SELECT word,
       COUNT(*) AS tf,
       COUNT(DISTINCT doc_id) AS df
FROM words
GROUP BY word
ORDER BY tf DESC, word
LIMIT {_T06_TOPK}
"""


@register("t06_vocab_topk", oracle=_T06_ORACLE)
def t06_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term + document frequency, top-k. The explode fans out to |tokens|
    rows but partial aggregation collapses them map-side before the single
    shuffle on word; the hot-word skew never concentrates on one reducer.
    Top-k plans as TakeOrderedAndProject — no global sort."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        spread(docs)
        .select("doc_id", F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), "word")
        .limit(_T06_TOPK)
    )


# ---- p06: weighted dataset mixing ------------------------------------------
# Training-mix composition: per-source keep rates applied via the same
# md5-threshold machinery as p01 — deterministic, map-side, reproducible
# across engines and incremental re-ingests. Weights > max threshold keep
# everything; at 100 TB this is a zero-shuffle filter over the corpus.

_P06_WEIGHTS = {"src0": 1.0, "src1": 1.0}  # benchmark-adjacent sources kept whole
_P06_DEFAULT_WEIGHT = 0.25


def _hex4(frac: float) -> str:
    return format(min(int(frac * 65536), 65535), "04x")


def weighted_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Keep each row with probability weights[stratum] (deterministic in the
    key): membership = md5(key) below the stratum's hex threshold."""
    key = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 4)
    thr = F.lit(_hex4(default_weight))
    for stratum, w in weights.items():
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_hex4(w))).otherwise(thr)
    return df.withColumn("sample_key", key).filter(F.col("sample_key") < thr)


def _p06_case() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN '{_hex4(w)}'" for s, w in _P06_WEIGHTS.items()
    )
    return f"CASE {whens} ELSE '{_hex4(_P06_DEFAULT_WEIGHT)}' END"


_P06_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key
  FROM documents
)
SELECT doc_id, source, lang, sample_key
FROM keyed
WHERE sample_key < {_p06_case()}
ORDER BY doc_id
"""


@register("p06_weighted_mix", oracle=_P06_ORACLE)
def p06_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        weighted_mix(
            docs.select("doc_id", "source", "lang"),
            "doc_id",
            "source",
            _P06_WEIGHTS,
            _P06_DEFAULT_WEIGHT,
        )
        .select("doc_id", "source", "lang", "sample_key")
        .orderBy("doc_id")
    )


# ---- d07: SimHash Hamming-ball near-dup pairs ------------------------------
# The block-permutation trick from web-scale simhash dedup: split the 48-bit
# signature into HB_BLOCKS equal blocks; by pigeonhole, any pair within
# Hamming distance <= HB_BLOCKS-1 shares at least one exact block. Block
# equality is the ONLY shuffle key (one group-by); the Hamming verify
# (bit_count of xor) runs on candidates only. Raising block count widens the
# recalled radius at the cost of bucket size — the same knob as LSH bands.

_HB_BITS = 48
# 3 blocks of 16 bits (radius <= 2): on a clustered corpus, 16-bit blocks
# discriminate 16x better than 12-bit ones — measured 7x faster end-to-end
# at sf0.1 (5k docs) with the same pigeonhole completeness guarantee at the
# tighter radius. Widening the radius = more, smaller blocks: the knob
# trades bucket size against recall distance exactly like LSH band count.
_HB_BLOCKS = 3
_HB_BLOCK_BITS = _HB_BITS // _HB_BLOCKS
_HB_MAX_HAMMING = _HB_BLOCKS - 1  # pigeonhole-complete radius


def _d07_oracle() -> str:
    from dbt_osmosis_spark.operators.dedup import DUCK_SIMHASH_CTES

    mask = (1 << _HB_BLOCK_BITS) - 1
    return f"""
WITH {DUCK_SIMHASH_CTES},
blocks AS (
  SELECT doc_id, simhash, b, (simhash >> (b * {_HB_BLOCK_BITS})) & {mask} AS block_val
  FROM sigs, (SELECT unnest(range(0, {_HB_BLOCKS})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM blocks a JOIN blocks b
    ON a.b = b.b AND a.block_val = b.block_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= {_HB_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


@register("d07_simhash_neardup", oracle=_d07_oracle())
def d07_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.dedup import simhash_signatures

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    mask = (1 << _HB_BLOCK_BITS) - 1
    sigs = simhash_signatures(docs).transform(keep_cached)
    blocks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(_HB_BLOCKS - 1))).alias("b"),
    ).withColumn(
        "block_val",
        F.expr(f"shiftright(simhash, b * {_HB_BLOCK_BITS}) & {mask}"),
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    hamming = F.bit_count(F.expr("a.simhash ^ b.simhash"))
    # Hamming filter BEFORE the pair-dedup: bit_count is a map-side codegen
    # op on the raw join output, so the distinct() only shuffles surviving
    # pairs (the block join can emit orders of magnitude more raw matches
    # than survivors when signatures cluster — 5M raw vs 10k kept at sf0.1).
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= _HB_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---- p07: quantile quality filter ------------------------------------------
# The filtering step after scoring (t02): keep documents above the Pth
# quality percentile WITHIN their language (per-stratum cutoffs keep one
# language's score distribution from starving another). percent_rank is one
# window shuffle on the stratum; integer-exact score inputs (t02) make the
# rank — and therefore membership — deterministic in both engines.

_P07_KEEP_FRAC = 0.5  # keep the top half per language

_P07_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, {_DUCK_TOK} AS w FROM documents
),
feat AS (
  SELECT doc_id, lang,
         len(w) AS n_tokens,
         len(list_filter(w, x -> x IN ('the', 'a'))) AS n_stop,
         len(list_filter(w, x -> len(x) >= 6)) AS n_long
  FROM tok
),
scored AS (
  SELECT doc_id, lang,
         (CAST(n_stop AS DOUBLE) / n_tokens)
           + (CAST(n_long AS DOUBLE) / n_tokens)
           + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END)
           AS quality_score
  FROM feat
),
ranked AS (
  SELECT doc_id, lang, quality_score,
         PERCENT_RANK() OVER (PARTITION BY lang ORDER BY quality_score, doc_id) AS pr
  FROM scored
)
SELECT doc_id, lang, quality_score
FROM ranked
WHERE pr >= {1 - _P07_KEEP_FRAC}
ORDER BY doc_id
"""


@register("p07_quality_filter", oracle=_P07_ORACLE)
def p07_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    feat = docs.select(
        "doc_id",
        "lang",
        F.size(tokens()).alias("n_tokens"),
        F.size(F.expr("filter(split(trim(text), ' '), x -> x IN ('the', 'a'))")).alias("n_stop"),
        F.size(F.expr("filter(split(trim(text), ' '), x -> length(x) >= 6)")).alias("n_long"),
    )
    score = (
        F.col("n_stop").cast("double") / F.col("n_tokens")
        + F.col("n_long").cast("double") / F.col("n_tokens")
        + F.when(F.col("n_tokens").between(20, 80), 1.0).otherwise(0.0)
    )
    scored = feat.select("doc_id", "lang", score.alias("quality_score"))
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 1 - _P07_KEEP_FRAC)
        .select("doc_id", "lang", "quality_score")
        .orderBy("doc_id")
    )


# ---- t07: TF-IDF keyword extraction ----------------------------------------
# Top keywords per document by tf * ln(N/df). df comes from one word-level
# group-by (the same shuffle t06 pays); the per-doc ranking is a window on
# doc_id. ROUND(…, 6) before emission pins the float so both engines hash
# identically. At corpus scale the df table is vocabulary-sized — broadcast
# it back onto the exploded words.

_T07_TOPK_PER_DOC = 3

_T07_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest({_DUCK_TOK}) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
),
df AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
),
n AS (
  SELECT COUNT(*) AS n_docs FROM documents
),
scored AS (
  SELECT t.doc_id, t.word, t.tf, d.df,
         ROUND(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf t JOIN df d ON t.word = d.word CROSS JOIN n
),
ranked AS (
  SELECT doc_id, word, tf, df, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rk
  FROM scored
)
SELECT doc_id, word, tf, df, tfidf, CAST(rk AS INTEGER) AS rk
FROM ranked
WHERE rk <= {_T07_TOPK_PER_DOC}
ORDER BY doc_id, rk
"""


@register("t07_tfidf_keywords", oracle=_T07_ORACLE)
def t07_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    words = spread(docs).select("doc_id", F.explode(tokens()).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _T07_TOPK_PER_DOC)
        .select("doc_id", "word", "tf", "df", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


# ---- p08: weighted sampling without replacement (Efraimidis-Spirakis) ------
# A-Res: each item gets key u^(1/w) (u uniform from the doc's md5, w =
# n_chars); the k largest keys are the sample. Heavier docs are
# proportionally likelier, membership is deterministic in the key (stable
# across runs/partitionings/engines), and selection is a TakeOrdered
# top-k — per-partition heaps + one small merge, never a global sort.
# Computed in log space (ln(u)/w, maximize); ROUND(...,6) pins ln() to
# identical doubles in both engines, doc_id breaks rounding ties so the
# cutoff set is engine-exact.

_P08_K = 50
# 13 hex chars = 52 bits: exact in a double for both engines
_P08_U_SPARK = (
    "(cast(conv(substr(md5(cast(cast(doc_id AS STRING) AS BINARY)), 1, 13), 16, 10) AS DOUBLE)"
    " + 1.0d) / 4503599627370496.0d"
)
_P08_U_DUCK = (
    "(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE)"
    " + 1.0) / 4503599627370496.0"
)

_P08_ORACLE = f"""
SELECT doc_id, lang, n_chars,
       ROUND(ln({_P08_U_DUCK}) / n_chars, 6) AS es_key
FROM documents
ORDER BY es_key DESC, doc_id
LIMIT {_P08_K}
"""


@register("p08_weighted_sample", oracle=_P08_ORACLE)
def p08_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(F.expr(f"ln({_P08_U_SPARK})") / F.col("n_chars"), 6).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(_P08_K)
    )


# ---- p09: token-budget truncation ------------------------------------------
# Fit documents to a max token budget (context-window prep): keep the
# first N tokens, rejoin, report kept/dropped counts. Pure JVM array ops
# (slice + array_join) — no Python crossing, truncation is map-side only
# (zero shuffle; the orderBy is presentation-only and absent in the
# pipeline form).

_P09_MAX_TOKENS = 64

_P09_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
)
SELECT doc_id,
       CAST(LEAST(len(w), {_P09_MAX_TOKENS}) AS INTEGER) AS n_kept,
       CAST(GREATEST(len(w) - {_P09_MAX_TOKENS}, 0) AS INTEGER) AS n_dropped,
       array_to_string(w[1:{_P09_MAX_TOKENS}], ' ') AS truncated
FROM tok
ORDER BY doc_id
"""


@register("p09_token_truncate", oracle=_P09_ORACLE)
def p09_token_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    w = F.split(F.trim(F.col("text")), " ")
    return (
        spread(docs)
        .select(
            "doc_id",
            F.least(F.size(w), F.lit(_P09_MAX_TOKENS)).alias("n_kept"),
            F.greatest(F.size(w) - _P09_MAX_TOKENS, F.lit(0)).alias("n_dropped"),
            F.array_join(F.slice(w, 1, _P09_MAX_TOKENS), " ").alias("truncated"),
        )
        .orderBy("doc_id")
    )


# ---- p10: cross-document passage dedup (C4-style) --------------------------
# Remove passages repeated ACROSS the corpus, keeping only the first
# occurrence (ordered by doc_id, then position) — the C4/CCNet "duplicate
# line removal" step, at passage granularity. Complements d01 (whole-doc)
# and d03 (near-dup pairs): boilerplate shared by otherwise-distinct docs
# is caught only here.
#
# Plan shape at 100 TB: one map-side chunk+hash pass, ONE shuffle on the
# passage hash (the window's partition key), and a groupBy(doc_id) to
# reassemble — the doc_id shuffle is bounded by kept chunks. No driver
# state; passage keys are md5 so the shuffle distributes uniformly.

_P10_CHUNK = 16  # words per passage


def passage_dedup(df: DataFrame, chunk_words: int = _P10_CHUNK) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_chunks, n_kept, cleaned); every
    duplicated passage survives only at its first (doc_id, idx)."""
    from pyspark.sql.window import Window as W

    w = F.split(F.trim(F.col("text")), " ")
    n_chunks_expr = F.ceil(F.size(w) / F.lit(chunk_words)).cast("int")
    chunks = df.select(
        "doc_id",
        n_chunks_expr.alias("n_chunks"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(split(trim(text), ' ')) / {chunk_words}.0) AS INT) - 1), "
                f"i -> array_join(slice(split(trim(text), ' '), i * {chunk_words} + 1, {chunk_words}), ' '))"
            )
        ).alias("idx", "chunk"),
    )
    win = W.partitionBy(F.md5(F.col("chunk"))).orderBy("doc_id", "idx")
    kept = chunks.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") == 1)
    sizes = df.select("doc_id", n_chunks_expr.alias("n_chunks"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))), lambda s: s.chunk
            ),
            " ",
        ).alias("cleaned"),
    )
    return (
        sizes.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        )
        .orderBy("doc_id")
    )


_P10_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(i AS INT) AS idx,
         array_to_string(w[(i * {_P10_CHUNK} + 1):((i + 1) * {_P10_CHUNK})], ' ') AS chunk
  FROM tok, UNNEST(range(0, CAST(ceil(len(w) / {_P10_CHUNK}.0) AS BIGINT))) AS t(i)
),
marked AS (
  SELECT doc_id, idx, chunk,
         ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn
  FROM chunks
),
sizes AS (
  SELECT doc_id, CAST(ceil(len(w) / {_P10_CHUNK}.0) AS INT) AS n_chunks FROM tok
),
rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
         array_to_string(list(chunk ORDER BY idx), ' ') AS cleaned
  FROM marked WHERE rn = 1 GROUP BY doc_id
)
SELECT s.doc_id, s.n_chunks,
       COALESCE(r.n_kept, 0) AS n_kept,
       COALESCE(r.cleaned, '') AS cleaned
FROM sizes s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
ORDER BY s.doc_id
"""


@register("p10_passage_dedup", oracle=_P10_ORACLE)
def p10_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return passage_dedup(docs.select("doc_id", "text"))


# ---- p11: per-source domain capping ----------------------------------------
# Cap any one source's contribution to the corpus (anti-domain-dominance:
# without it one crawl domain can be half the tokens). Deterministic
# md5-rank within each source keeps the same docs across runs and engines.
# One shuffle on the source key (window); at heavy skew the hot source's
# partition is the bottleneck — salt the rank into two phases (rank within
# salted sub-key, then offset by sub-key counts) exactly like
# functions/skew.py does for aggregation.

_P11_CAP = 15  # max docs per source (binds at every SF: sources are uniform)


_P11_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_P11_CAP}
ORDER BY doc_id
"""


def cap_per_source(df: DataFrame, cap: int, source_col: str = "source") -> DataFrame:
    """Keep at most `cap` docs per source, chosen by deterministic md5 rank
    (stable across runs, partitionings, engines, and incremental loads)."""
    from pyspark.sql.window import Window as W

    win = W.partitionBy(source_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        df.withColumn("rk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rk") <= cap)
    )


@register("p11_domain_cap", oracle=_P11_ORACLE)
def p11_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        cap_per_source(docs.select("doc_id", "source", "n_chars"), _P11_CAP)
        .select("doc_id", "source", "n_chars", "rk")
        .orderBy("doc_id")
    )


# ---- d10: cross-document duplicate n-gram rate -----------------------------
# The Lee-et-al. ("Deduplicating Training Data Makes Language Models
# Better") exact-substring SIGNAL as a per-doc score: what fraction of a
# document's distinct 5-gram spans also occur in at least one other
# document. p10 removes duplicated passages; this measures them — the
# ranking input for "drop the N% most-boilerplate docs" policies. Scale
# shape: distinct shingles per doc are map-side; one shuffle groups each
# shingle's distinct-doc count (partial agg on the shingle key); one
# broadcast-or-shuffle join back and one per-doc agg. The shingle string
# itself never leaves the first shuffle — the join key could be its md5
# at 100 TB to cut shuffle bytes (same pattern as d08's shingle index).

_D10_K = 5

_D10_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
sh AS (
  SELECT doc_id, unnest({_duck_shingles(_D10_K)}) AS shingle
  FROM tok WHERE len(w) >= {_D10_K}
),
freq AS (
  SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate
FROM sh s JOIN freq f ON s.shingle = f.shingle
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@register("d10_crossdoc_ngram_rate", oracle=_D10_ORACLE)
def d10_crossdoc_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    sh = (
        docs.withColumn("w", tokens())
        .filter(F.size("w") >= _D10_K)
        .select(
            "doc_id",
            F.explode(F.expr(spark_shingles_sql("w", _D10_K))).alias("shingle"),
        )
        .transform(keep_cached)
    )
    freq = sh.groupBy("shingle").agg(F.countDistinct("doc_id").alias("n_docs"))
    shared = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("bigint")
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            shared.alias("n_shared"),
            (shared.cast("double") / F.count(F.lit(1))).alias("dup_rate"),
        )
        .orderBy("doc_id")
    )


# ---- d12: PageRank over the near-dup candidate graph -----------------------
# Iterative numeric graph analytics beyond connected components: PageRank
# on the LSH candidate graph surfaces the most-connected duplicate hubs
# (the docs whose removal shrinks the dup graph fastest). Fixed 4 damped
# iterations. Every per-node neighbor sum is an ASSOCIATIVE integer sum:
# contributions are quantized to 1e-9 ints before summing and each new
# rank is re-quantized (the s03/t13 move applied per iteration), so the
# result is independent of partitioning AND bit-identical in DuckDB's
# unrolled-CTE mirror — an honest full-value oracle for an iterative
# float algorithm. Spark side: one join+groupBy per iteration on a
# localCheckpoint()ed edge frame (the d06 lineage lesson); per-round plan
# size is O(1).

_D12_ITERS = 4
# e0 suffix forces DOUBLE literals in BOTH engines: a bare 0.85 parses as
# DECIMAL in Spark SQL, and decimal division truncates the teleport term
# at decimal scale (0.003333 vs 0.00333333...) while DuckDB promotes the
# same literal to double — a 3e-7 cross-engine drift per iteration
_D12_DAMP = "0.85e0"
_D12_TELEPORT = "0.15e0"


def _duck_pr_iter(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         floor(({_D12_TELEPORT} / (SELECT nn FROM ncount)
                + {_D12_DAMP} * (COALESCE(recv.s, 0) / 1e9)) * 1e9 + 0.5) / 1e9 AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(floor(p.rank / d.deg * 1e9 + 0.5) AS DECIMAL(28,0))) AS s
    FROM und e
    JOIN {prev} p ON p.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst
  ) recv ON recv.node = n.node
)"""


_D12_ORACLE = (
    f"WITH RECURSIVE {DUCK_LSH_CTES},\n"
    + """und AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
nodes AS (SELECT DISTINCT src AS node FROM und),
ncount AS (SELECT COUNT(*) AS nn FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src),
it0 AS (
  SELECT node, floor(1e9 / (SELECT nn FROM ncount) + 0.5) / 1e9 AS rank FROM nodes
),
"""
    + ",\n".join(_duck_pr_iter(f"it{i}", f"it{i + 1}") for i in range(_D12_ITERS))
    + f"""
SELECT node AS doc_id, rank
FROM it{_D12_ITERS}
ORDER BY rank DESC, doc_id
"""
)


@register("d12_pagerank_dupgraph", oracle=_D12_ORACLE)
def d12_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    pairs = lsh_candidate_pairs(lsh_bands(sig))
    und = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    nn = nodes.count()  # scalar graph size: drives the teleport constant
    # deg derives from und — rename its key so the per-iteration join never
    # degenerates into the Spark derived-frame self-join ambiguity (shared
    # attribute ids make und.src == deg.src resolve to a tautology)
    deg = und.groupBy(F.col("src").alias("dnode")).agg(F.count(F.lit(1)).alias("deg"))
    rank = nodes.select(
        "node", F.expr(f"floor(1e9 / {nn} + 0.5) / 1e9").alias("rank")
    )
    for _ in range(_D12_ITERS):
        # per-node outgoing weight first (node-keyed), then one edge join
        w = (
            rank.join(deg, rank["node"] == deg["dnode"])
            .select(
                rank["node"].alias("wnode"),
                F.expr("CAST(floor(rank / deg * 1e9 + 0.5) AS DECIMAL(28,0))").alias("c"),
            )
        )
        recv = (
            und.join(w, und["src"] == w["wnode"])
            .groupBy(und["dst"].alias("rnode"))
            .agg(F.sum("c").alias("s"))
        )
        rank = nodes.join(recv, nodes["node"] == recv["rnode"], "left").select(
            "node",
            F.expr(
                f"floor(({_D12_TELEPORT} / {nn}"
                f" + {_D12_DAMP} * (COALESCE(CAST(s AS DOUBLE), 0) / 1e9)) * 1e9 + 0.5) / 1e9"
            ).alias("rank"),
        )
    return rank.select(F.col("node").alias("doc_id"), "rank").orderBy(
        F.desc("rank"), "doc_id"
    )


# ---- d19: dedup audit — cluster-size histogram over the shared CC chain ----
# The report a data lead reads before approving a dedup run: how much of
# the corpus sits in duplicate clusters, and in what shape (many pairs vs
# a few giant boilerplate clusters — the latter usually means the
# similarity threshold, not the data, is wrong). One row per cluster
# size: n_clusters, n_docs, corpus share. Composes the d03/d06 chain
# (signatures → band buckets → candidate pairs → hybrid CC), then two
# DIMENSION-sized aggregates (per-component count, per-size count); the
# share normalizer is a window over the |distinct sizes| histogram rows.
# Singleton clusters are included — the "not duplicated" mass is the
# number the report exists to show.

_D19_ORACLE = f"""
WITH RECURSIVE {DUCK_LSH_CTES},
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
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
sizes AS (
  SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
),
hist AS (
  SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
         CAST(SUM(sz) AS BIGINT) AS n_docs
  FROM sizes GROUP BY sz
)
SELECT cluster_size, n_clusters, n_docs,
       round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS corpus_share
FROM hist
ORDER BY cluster_size
"""


@register("d19_dedup_audit", oracle=_D19_ORACLE)
def d19_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    comp = lsh_components(docs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )
    # |distinct sizes| rows — the unpartitioned share window is histogram-
    # sized, never corpus-sized.
    from pyspark.sql.window import Window as _W

    return (
        hist.withColumn(
            "corpus_share",
            F.round(
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(_W.partitionBy()),
                6,
            ),
        )
        .orderBy("cluster_size")
    )
