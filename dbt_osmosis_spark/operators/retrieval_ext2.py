"""Lexical retrieval, part 3: relevance-ranked phrase queries (round 12).

- s50  n-term sloppy-phrase search — Lucene PhraseQuery~N semantics
       (ordered n-term phrases with a TOTAL slop budget) over the
       persisted positional layout, generalizing s46's pair-only plan
       (VERDICT r11 item 4)
- s51  BM25-weighted phrase ranking — phrase results ranked by
       relevance (phrase tf = exact match count, phrase df = docs with
       >= 1 match) instead of raw counts, served from the SAME
       positional artifact (VERDICT r11 item 5; ES match_phrase parity)

Semantics of s50 (the SQL-expressible core of Lucene's sloppy phrase):
an ordered chain of positions p_1 < p_2 < ... < p_n, one per phrase
term, whose TOTAL gap  sum_i (p_i - p_{i-1} - 1)  =  p_n - p_1 - (n-1)
is at most the slop budget. slop = 0 degenerates to the exact adjacent
phrase (p_i = p_1 + i - 1), tested against s43's answer. A document
scores the count of DISTINCT ANCHORS p_1 admitting a completion —
bounded by the anchor term's position list, so a generous slop cannot
blow up the count combinatorially.

Scale shape (both ops): the scan reads only the probed term buckets of
the persisted layout with term equality pushed to the reader (the
s43/s46 discipline); each phrase resolves as |phrase|-1 per-doc
equi-joins with the slop window as a join filter (never a nested
loop); prefix-gap bounds prune chains as early as possible. Ranking is
the two-phase bucketed top-k everywhere.

Reference parity: the reference ships SQL to a warehouse
(src/dbt_osmosis/core/sql_operations.py:69); phrase retrieval is
engine-side functionality this repo adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.retrieval import (
    _BUCKETS,
    _s34_tbkt_py,
)
from dbt_osmosis_spark.operators.retrieval_ext import (
    _phrase_match_counts,
    _rank_phrase_matches,
    _s43_index_path,
    write_positional_index,
)
from dbt_osmosis_spark.sources.parquet import read_layout, read_parquet, spread

# ---------------------------------------------------------------------------
# s50: n-term sloppy phrase
# ---------------------------------------------------------------------------

_S50_QUERIES: tuple[tuple[str, tuple[str, ...], int], ...] = (
    ("spA", ("sort", "table", "scan"), 3),
    ("spB", ("stream", "batch", "vector"), 0),  # slop 0 == exact phrase pC
    ("spC", ("hash", "join"), 3),
    ("spD", ("group", "query", "row"), 5),
)
_S50_K = 5


def _s50_oracle() -> str:
    terms = ", ".join(
        f"'{t}'" for t in sorted({w for _, ws, _ in _S50_QUERIES for w in ws})
    )
    branches = []
    for qid, words, slop in _S50_QUERIES:
        joins = "\n    ".join(
            f"JOIN pos w{i} ON w{i}.doc_id = w0.doc_id AND w{i}.tok = '{w}'"
            f" AND w{i}.pos > w{i - 1}.pos AND w{i}.pos - w0.pos - {i} <= {slop}"
            for i, w in enumerate(words)
            if i > 0
        )
        branches.append(
            f"""SELECT '{qid}' AS sp_id, w0.doc_id,
       CAST(COUNT(DISTINCT w0.pos) AS BIGINT) AS n_matches
    FROM pos w0
    {joins}
    WHERE w0.tok = '{words[0]}'
    GROUP BY w0.doc_id"""
        )
    union = "\n  UNION ALL\n  ".join(branches)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS rawpos
  FROM documents
),
pos_all AS (
  SELECT doc_id, tok,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY rawpos)
              AS BIGINT) AS pos
  FROM raw WHERE tok <> ''
),
pos AS (SELECT * FROM pos_all WHERE tok IN ({terms})),
matches AS (
  {union}
),
ranked AS (
  SELECT sp_id, doc_id, n_matches,
         ROW_NUMBER() OVER (PARTITION BY sp_id
                            ORDER BY n_matches DESC, doc_id) AS rnk
  FROM matches
)
SELECT sp_id, CAST(rnk AS BIGINT) AS rnk, doc_id, n_matches
FROM ranked WHERE rnk <= {_S50_K}
ORDER BY sp_id, rnk
"""


def _sloppy_match_counts(
    pos: DataFrame, queries: tuple[tuple[str, tuple[str, ...], int], ...]
) -> DataFrame:
    """Per-(query, doc) distinct-anchor counts for ordered n-term
    phrases under a total slop budget: a chain of |phrase|-1 per-doc
    equi-joins, each carrying the ordering bound (p_i > p_{i-1}) and the
    cumulative-gap bound (p_i - p_1 - i <= slop; the prefix bound is
    implied by the final one but prunes chains early)."""
    per_query = []
    for qid, words, slop in queries:
        cur = pos.filter(F.col("term") == words[0]).select(
            "doc_id", F.col("pos").alias("p1"), F.col("pos").alias("plast")
        )
        for i, w in enumerate(words[1:], start=1):
            nxt = pos.filter(F.col("term") == w).select(
                F.col("doc_id").alias("d_"), F.col("pos").alias("p_")
            )
            cur = cur.join(
                nxt,
                (F.col("doc_id") == F.col("d_"))
                & (F.col("p_") > F.col("plast"))
                & (F.col("p_") - F.col("p1") - i <= slop),
            ).select("doc_id", "p1", F.col("p_").alias("plast"))
        per_query.append(
            cur.groupBy("doc_id")
            .agg(F.countDistinct("p1").cast("bigint").alias("n_matches"))
            .select(F.lit(qid).alias("phrase_id"), "doc_id", "n_matches")
        )
    matches = per_query[0]
    for m in per_query[1:]:
        matches = matches.unionByName(m)
    return matches


def query_sloppy_phrase_index(
    spark: SparkSession,
    path: str,
    queries: tuple[tuple[str, tuple[str, ...], int], ...],
    k: int,
) -> DataFrame:
    """Serve n-term sloppy-phrase queries from the persisted positional
    layout: bucket-pruned term-pushed scan, the _sloppy_match_counts
    join chain, two-phase rank."""
    terms = sorted({w for _, ws, _ in queries for w in ws})
    probes = sorted({_s34_tbkt_py(t) for t in terms})
    pos = (
        read_layout(spark, path, "postings")
        .filter(F.col("tbkt").isin(probes))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term", "pos")
    )
    return _rank_phrase_matches(_sloppy_match_counts(pos, queries), k).withColumnRenamed(
        "phrase_id", "sp_id"
    )


def query_sloppy_phrase_segmented(
    spark: SparkSession,
    path: str,
    queries: tuple[tuple[str, tuple[str, ...], int], ...],
    k: int,
    mgen: int | None = None,
) -> DataFrame:
    """n-term sloppy-phrase serve over the MAINTAINED positional layout
    (round 12b): the s50 join chain on the s47 segment union — termset-
    pruned, generation-scoped tombstone anti-join, optional manifest
    pin. Unregistered (machinery = s50 + s47, both oracle-pinned);
    equivalence with the monolithic serve over the live corpus is
    tested in tests/test_round12b_ops.py. Completes the layout x
    query-class matrix for sloppy phrases (s46's segmented twin was
    pairs-only)."""
    from dbt_osmosis_spark.operators.retrieval_ext import (
        _apply_scoped_tombstones,
        _live_segments,
        _read_segments_tagged,
        _scoped_tombstones,
        _segments_with_terms,
    )

    segs = _live_segments(path, mgen)
    terms = sorted({w for _, ws, _ in queries for w in ws})
    segs = _segments_with_terms(spark, path, segs, terms)
    if not segs:
        return spark.createDataFrame(
            [], "sp_id string, rnk bigint, doc_id bigint, n_matches bigint"
        )
    probes = sorted({_s34_tbkt_py(t) for t in terms})
    pos = (
        _read_segments_tagged(spark, path, segs, "postings")
        .filter(F.col("tbkt").isin(probes))
        .filter(F.col("term").isin(terms))
    )
    pos = _apply_scoped_tombstones(
        pos, _scoped_tombstones(spark, path, mgen=mgen)
    ).select("doc_id", "term", "pos")
    return _rank_phrase_matches(_sloppy_match_counts(pos, queries), k).withColumnRenamed(
        "phrase_id", "sp_id"
    )


@register("s50_sloppy_nterm_phrase", oracle=_s50_oracle())
def s50_sloppy_nterm_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index build (idempotent, shared with s43/s45/s46) +
    one n-term sloppy-phrase batch serve (module comment)."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    path = _s43_index_path(sf_dir)
    write_positional_index(spark, docs, path)
    return query_sloppy_phrase_index(spark, path, _S50_QUERIES, _S50_K)


# ---------------------------------------------------------------------------
# s51: BM25-weighted phrase ranking
# ---------------------------------------------------------------------------
# _rank_phrase_matches orders by raw n_matches — fine for "how many
# times", wrong for "how relevant": a long boilerplate doc repeating a
# phrase outranks a short on-topic one, and phrase rarity is ignored.
# s51 scores a phrase the way ES match_phrase does: treat the phrase as
# one synthetic term with tf = exact match count (from positions) and
# df = number of docs with >= 1 match, then apply the repo's integer-
# micros BM25 (same k1/b and quantization as s31 — scores comparable
# with term queries, e.g. for mixed-bag ranking). dl and corpus stats
# come from the SAME positional artifact (doclen sidecar + stats row).

_S51_PHRASES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("bpA", ("spark", "window")),
    ("bpB", ("hash", "join")),
    ("bpC", ("stream", "batch", "vector")),
)
_S51_K = 5

# the s31 contribution expression with phrase-tf spelled n_matches
_S51_CONTRIB = (
    "CAST(floor("
    "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    " * (n_matches * 2.2) / (n_matches + 1.2 * (0.25 + 0.75 * (dl / avgdl)))"
    " * 1e6 + 0.5) AS BIGINT)"
)


def _s51_oracle() -> str:
    terms = ", ".join(
        f"'{t}'" for t in sorted({w for _, ws in _S51_PHRASES for w in ws})
    )
    branches = []
    for pid, words in _S51_PHRASES:
        joins = "\n    ".join(
            f"JOIN pos w{i} ON w{i}.doc_id = w0.doc_id"
            f" AND w{i}.pos = w0.pos + {i} AND w{i}.tok = '{w}'"
            for i, w in enumerate(words)
            if i > 0
        )
        branches.append(
            f"""SELECT '{pid}' AS phrase_id, w0.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM pos w0
    {joins}
    WHERE w0.tok = '{words[0]}'
    GROUP BY w0.doc_id"""
        )
    union = "\n  UNION ALL\n  ".join(branches)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS rawpos
  FROM documents
),
pos_all AS (
  SELECT doc_id, tok,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY rawpos)
              AS BIGINT) AS pos
  FROM raw WHERE tok <> ''
),
pos AS (SELECT * FROM pos_all WHERE tok IN ({terms})),
dl_all AS (SELECT doc_id, COUNT(*) AS dl FROM pos_all GROUP BY doc_id),
dl AS (
  SELECT d.doc_id, COALESCE(t.dl, 0) AS dl
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN dl_all t USING (doc_id)
),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
           / (SELECT COUNT(*) FROM documents) AS avgdl
),
matches AS (
  {union}
),
dfrel AS (SELECT phrase_id, CAST(COUNT(*) AS BIGINT) AS df
          FROM matches GROUP BY phrase_id),
scored AS (
  SELECT m.phrase_id, m.doc_id,
         {_S51_CONTRIB} AS score_micros
  FROM matches m
  JOIN dfrel USING (phrase_id)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
),
ranked AS (
  SELECT phrase_id, doc_id, score_micros,
         ROW_NUMBER() OVER (PARTITION BY phrase_id
                            ORDER BY score_micros DESC, doc_id) AS rnk
  FROM scored
)
SELECT phrase_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_micros
FROM ranked WHERE rnk <= {_S51_K}
ORDER BY phrase_id, rnk
"""


def query_bm25_phrases(
    spark: SparkSession,
    path: str,
    phrases: tuple[tuple[str, tuple[str, ...]], ...],
    k: int,
) -> DataFrame:
    """BM25-weighted phrase serve from the positional layout (module
    comment): exact match counts from the bucket-pruned position scan,
    phrase df from the match relation, dl from the doclen sidecar,
    stats from the persisted one-row relation, two-phase rank on the
    integer-micros score."""
    from pyspark.sql.window import Window as W

    terms = sorted({w for _, ws in phrases for w in ws})
    probes = sorted({_s34_tbkt_py(t) for t in terms})
    pos = (
        read_layout(spark, path, "postings")
        .filter(F.col("tbkt").isin(probes))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term", "pos")
    )
    matches = _phrase_match_counts(pos, phrases)
    df_rel = matches.groupBy("phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    dl_rel = read_layout(spark, path, "doclen").select("doc_id", "dl")
    stats = read_layout(spark, path, "stats").select("n_docs", "avgdl")
    scored = (
        matches.join(F.broadcast(df_rel), "phrase_id")
        .join(dl_rel, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("phrase_id", "doc_id", F.expr(_S51_CONTRIB).alias("score_micros"))
    )
    final_w = W.partitionBy("phrase_id").orderBy(
        F.col("score_micros").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("bkt", F.expr(f"pmod(hash(doc_id), {_BUCKETS})"))
        .withColumn(
            "lr",
            F.row_number().over(
                W.partitionBy("phrase_id", "bkt").orderBy(
                    F.col("score_micros").desc(), F.col("doc_id")
                )
            ),
        )
        .filter(F.col("lr") <= k)
        .withColumn("rnk", F.row_number().over(final_w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("phrase_id", "rnk", "doc_id", "score_micros")
        .orderBy("phrase_id", "rnk")
    )


def query_bm25_phrases_segmented(
    spark: SparkSession,
    path: str,
    phrases: tuple[tuple[str, tuple[str, ...]], ...],
    k: int,
    mgen: int | None = None,
) -> DataFrame:
    """BM25-weighted phrase serve over the MAINTAINED positional layout
    (round 12b): the s51 scoring on the s47 segment union — termset-
    pruned scan, generation-scoped tombstone anti-join on positions AND
    doclen (phrase tf and dl both come from live versions only),
    delta-merged stats, optional manifest pin. Unregistered (machinery
    = s51 + s48, both oracle-pinned); equivalence with the monolithic
    serve over the live corpus is tested in tests/test_round12b_ops.py."""
    from pyspark.sql.window import Window as W

    from dbt_osmosis_spark.operators.retrieval_ext import (
        _apply_scoped_tombstones,
        _live_segments,
        _read_segments_tagged,
        _scoped_tombstones,
        _segments_with_terms,
        _stats_agg,
    )

    segs = _live_segments(path, mgen)
    terms = sorted({w for _, ws in phrases for w in ws})
    segs = _segments_with_terms(spark, path, segs, terms)
    if not segs:
        return spark.createDataFrame(
            [], "phrase_id string, rnk bigint, doc_id bigint, score_micros bigint"
        )
    probes = sorted({_s34_tbkt_py(t) for t in terms})
    tombs = _scoped_tombstones(spark, path, mgen=mgen)
    pos = (
        _read_segments_tagged(spark, path, segs, "postings")
        .filter(F.col("tbkt").isin(probes))
        .filter(F.col("term").isin(terms))
    )
    pos = _apply_scoped_tombstones(pos, tombs).select("doc_id", "term", "pos")
    matches = _phrase_match_counts(pos, phrases)
    df_rel = matches.groupBy("phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    dl_rel = _apply_scoped_tombstones(
        _read_segments_tagged(spark, path, segs, "doclen"), tombs
    ).select("doc_id", "dl")
    stats = _stats_agg(spark, path, mgen)
    scored = (
        matches.join(F.broadcast(df_rel), "phrase_id")
        .join(dl_rel, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("phrase_id", "doc_id", F.expr(_S51_CONTRIB).alias("score_micros"))
    )
    final_w = W.partitionBy("phrase_id").orderBy(
        F.col("score_micros").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("bkt", F.expr(f"pmod(hash(doc_id), {_BUCKETS})"))
        .withColumn(
            "lr",
            F.row_number().over(
                W.partitionBy("phrase_id", "bkt").orderBy(
                    F.col("score_micros").desc(), F.col("doc_id")
                )
            ),
        )
        .filter(F.col("lr") <= k)
        .withColumn("rnk", F.row_number().over(final_w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("phrase_id", "rnk", "doc_id", "score_micros")
        .orderBy("phrase_id", "rnk")
    )


@register("s51_bm25_phrase_rank", oracle=_s51_oracle())
def s51_bm25_phrase_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index build (idempotent, shared with s43/s45/s46/s50)
    + one BM25-weighted phrase serve (module comment)."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    path = _s43_index_path(sf_dir)
    write_positional_index(spark, docs, path)
    return query_bm25_phrases(spark, path, _S51_PHRASES, _S51_K)
