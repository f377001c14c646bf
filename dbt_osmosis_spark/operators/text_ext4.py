"""Text analysis, part 4: distributed BPE merge-table training (t29).

t29 trains a byte-pair-encoding merge table on the corpus (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — the standard subword-tokenizer training loop): start
from characters (plus the '</w>' end-of-word marker), count every
adjacent symbol pair weighted by word frequency, merge the globally most
frequent pair everywhere (greedy leftmost, non-overlapping), repeat.
The output is the learned merge table — (rank, left, right, frequency) —
which IS the tokenizer: applying the merges in rank order tokenizes any
text. This is the one genuinely iterative text-pipeline primitive the
family lacked next to t05's fixed BPE-ish regex counter.

Distributed shape (the 100 TB lens):
- ONE corpus-sized stage: the token explode feeding the word-frequency
  aggregation (map-side partial, |vocab| keys). Every BPE round after
  that runs on the VOCAB-sized (symbols, count) relation — millions of
  rows for a real web corpus, so it stays a DataFrame (never driver
  state), but it is corpus-INDEPENDENT: training cost does not grow
  with document count once the word counts exist.
- Per round: explode adjacent pairs weighted by word count → map-side
  partial sum into a |pairs|-keyed shuffle → 1-row argmax via
  TakeOrderedAndProject (no global sort) → broadcast that single row
  back and fold each symbol array once. The fold
  (``aggregate(syms, …)``) applies the merge greedy-leftmost exactly
  like the reference algorithm, including runs of a repeated symbol
  ('aaaa' + merge (a,a) → [aa, aa]).
- Rounds are a bounded unroll (the d25/d28 graph discipline) with each
  round's vocab state persisted (`keep_cached`) so round r+1 reads a
  materialized vocab instead of recomputing r folds of lineage.

Determinism: pair counts are integer sums of BIGINT word counts
(order-free); the argmax tie-breaks by (freq DESC, left, right) — a
total order — in both engines, so the learned table is fully
hash-checkable. The oracle unrolls the identical rounds in DuckDB; its
merge application uses window functions (cand-run parity = greedy
leftmost non-overlap; DuckDB's list_reduce has no initial-accumulator
form) and is pinned against a direct Python BPE in
tests/test_round10_ops.py.

Reference parity: the reference ships SQL to a warehouse
(src/dbt_osmosis/core/sql_operations.py:69) and has no tokenizer
surface; t29 extends the engine's training-data text family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

_T29_ROUNDS = 8
_T29_EOW = "</w>"

# Greedy-leftmost merge of pair (pa, pb) over a symbol array, as a single
# fold: append each symbol unless it completes the pair with the
# accumulator's last element. A just-merged tail equals pa||pb, never pa
# (pb is non-empty), so a merged element can never be merged again within
# the same round — exactly the reference algorithm's non-overlap rule.
_T29_FOLD = """
aggregate(syms, CAST(array() AS array<string>),
  (acc, x) -> CASE
    WHEN size(acc) > 0 AND element_at(acc, -1) = pa AND x = pb
    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(pa, pb)))
    ELSE concat(acc, array(x)) END)
"""

# Adjacent symbol pairs of one array, as (a, b) structs: transform's
# lambda index i is 0-based and `syms[i + 1]` is 0-based element access,
# so element i pairs with its right neighbor.
_T29_PAIRS = (
    "transform(slice(syms, 1, size(syms) - 1),"
    " (s, i) -> struct(s AS a, syms[i + 1] AS b))"
)

# ---------------------------------------------------------------------------
# DuckDB oracle: identical rounds, window-function merge application.
# cand marks pair occurrences; consecutive cand positions (only possible
# when left = right) form runs whose EVEN offsets are the greedy leftmost
# non-overlapping merge starts; the following position is consumed.
# ---------------------------------------------------------------------------
_T29_DUCK_ROUND = """
pairs_{r} AS (
  SELECT sym AS a, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b, cnt
  FROM s{r}
),
best_{r} AS (
  SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS freq
  FROM pairs_{r} WHERE b IS NOT NULL
  GROUP BY a, b ORDER BY freq DESC, a, b LIMIT 1
),
m_{r} AS (
  SELECT s.word, s.cnt, s.pos, s.sym, b.a AS pa, b.b AS pb,
         (s.sym = b.a
          AND lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.b)
           AS cand
  FROM s{r} s CROSS JOIN best_{r} b
),
g_{r} AS (
  SELECT *, CASE WHEN cand THEN pos - ROW_NUMBER() OVER
                  (PARTITION BY word, cand ORDER BY pos) END AS grp
  FROM m_{r}
),
st_{r} AS (
  SELECT *, CASE WHEN cand THEN (ROW_NUMBER() OVER
                  (PARTITION BY word, grp ORDER BY pos) - 1) % 2 = 0
            ELSE FALSE END AS mstart
  FROM g_{r}
),
s{r1} AS (
  SELECT word, cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS BIGINT)
           AS pos,
         CASE WHEN mstart THEN pa || pb ELSE sym END AS sym
  FROM (SELECT *, lag(mstart, 1, FALSE) OVER
          (PARTITION BY word ORDER BY pos) AS consumed FROM st_{r}) z
  WHERE NOT consumed
)
"""


def _t29_oracle(rounds: int) -> str:
    head = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
s0 AS (
  SELECT word, cnt,
         CAST(generate_subscripts(string_split(word, '') || ['{_T29_EOW}'], 1)
              AS BIGINT) AS pos,
         unnest(string_split(word, '') || ['{_T29_EOW}']) AS sym
  FROM wc
)"""
    body = "".join(
        "," + _T29_DUCK_ROUND.format(r=r, r1=r + 1) for r in range(rounds)
    )
    sel = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS merge_rank, a AS left_sym,"
        f" b AS right_sym, freq AS pair_freq FROM best_{r}"
        for r in range(rounds)
    )
    return head + body + f" SELECT * FROM ({sel}) q ORDER BY merge_rank"


_T29_TABLE_SCHEMA = (
    "merge_rank bigint, left_sym string, right_sym string, pair_freq bigint"
)


def _bpe_vocab0(docs: DataFrame) -> DataFrame:
    """Corpus word counts exploded to the round-0 BPE state — the ONE
    corpus-sized stage of training. Cached (keep_cached): every argmax
    round and every downstream vocab-sized consumer (t30's re-tokenize,
    t31's OOV flag, t32's checkpoints) re-reads this relation instead of
    re-scanning the corpus."""
    return keep_cached(
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            "word",
            F.concat(F.split("word", ""), F.array(F.lit(_T29_EOW))).alias("syms"),
            "cnt",
        )
    )


def _bpe_fold(vocab: DataFrame, pa: str, pb: str) -> DataFrame:
    """Apply one learned merge to the vocab state as LITERAL columns —
    the identical _T29_FOLD expression the broadcast form evaluated, so
    the folded state is byte-identical; only the plan shape changes."""
    return (
        vocab.withColumn("pa", F.lit(pa))
        .withColumn("pb", F.lit(pb))
        .select("word", F.expr(_T29_FOLD).alias("syms"), "cnt")
    )


def _bpe_argmax(vocab: DataFrame) -> list:
    """The round's most frequent adjacent pair: distributed map-side
    partial sum over the (cached) vocab state, 1-row TakeOrdered — the
    single row crosses to the driver (metadata-sized, the s40/s54
    centroid-collect discipline)."""
    return (
        vocab.select(F.explode(F.expr(_T29_PAIRS)).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "a", "b")
        .limit(1)
        .collect()
    )


def _bpe_train_core(
    docs: DataFrame, rounds: int = _T29_ROUNDS
) -> tuple[list[tuple], DataFrame, DataFrame]:
    """Run the BPE loop; return (collected merge rows, cached round-0
    vocab state, final vocab state with all merges applied).

    Round 13 plan-shape fix (optimization round; guide §7.3): the r11
    form fed each round's 1-row argmax back as a broadcast crossJoin, so
    round r's logical plan embedded round r-1's plan TWICE (main input +
    argmax subtree) — 2^r plan nodes, and with a 31-word bench vocab the
    whole family's wall was driver-side Catalyst analysis (t29 at sf0.1:
    12 s, 510 Exchange nodes in the final plan). Collecting the single
    argmax row per round (metadata-sized — the pattern the ≤16-row
    centroid collects already use) and re-applying it as literals makes
    round r's plan = round r-1's plus one projection: linear growth, one
    tiny job per round. The vocab itself NEVER leaves the cluster —
    at a real corpus' million-word vocabulary the per-round work is the
    same distributed partial-agg; only the 1-row argmax crosses.
    """
    vocab0 = _bpe_vocab0(docs)
    cur = vocab0
    merges: list[tuple] = []
    for r in range(rounds):
        rows = _bpe_argmax(cur)
        if not rows:
            break  # vocabulary exhausted (all words single-symbol)
        row = rows[0]
        merges.append((r + 1, row.a, row.b, row.freq))
        cur = _bpe_fold(cur, row.a, row.b)
    return merges, vocab0, cur


def bpe_train_state(
    docs: DataFrame, rounds: int = _T29_ROUNDS
) -> tuple[list[DataFrame], DataFrame]:
    """Run the BPE loop; return (per-round 1-row best relations, final
    vocab state (word, syms, cnt) with ALL `rounds` merges applied).

    The final state IS the tokenized vocabulary (lazy — a linear chain
    of `rounds` fold projections over the cached round-0 state; t30
    re-derives it equivalently with one broadcast merge-table fold, see
    ``_T30_APPLY``).
    """
    spark = docs.sparkSession
    merges, _, vocab = _bpe_train_core(docs, rounds)
    bests = [
        spark.createDataFrame([m], _T29_TABLE_SCHEMA) for m in merges
    ]
    return bests, vocab


def bpe_train(docs: DataFrame, rounds: int = _T29_ROUNDS) -> DataFrame:
    """Learn a `rounds`-entry BPE merge table from a documents relation.

    Returns (merge_rank, left_sym, right_sym, pair_freq), rank-ordered.
    """
    merges, _, _ = _bpe_train_core(docs, rounds)
    return docs.sparkSession.createDataFrame(merges, _T29_TABLE_SCHEMA).orderBy(
        "merge_rank"
    )


@register("t29_bpe_train", oracle=_t29_oracle(_T29_ROUNDS))
def t29_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the 8-merge BPE table on the documents corpus (module
    comment); one corpus-sized word-count stage, then vocab-sized rounds."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return bpe_train(docs)


# ---------------------------------------------------------------------------
# t30: BPE encode — per-source subword statistics from the trained state
# ---------------------------------------------------------------------------
# The apply side of t29, and the train->encode dividend made concrete:
# after training, the loop's FINAL vocab state (word -> merged symbol
# sequence) IS the tokenizer's output for every corpus word, so encoding
# the training corpus costs ZERO extra merge passes — one vocab-sized
# join of per-(source, word) counts against per-word subword lengths.
# This is the number a training-data pipeline actually budgets with:
# subword tokens per source (and tokens-per-word, the BPE compression
# ratio) BEFORE paying for a full tokenizer run. Out-of-corpus text
# re-applies the merge table (the t29 fold, once per rank) — by
# construction that yields exactly these sequences on corpus words;
# t31 below IS that held-out/OOV encode path.
#
# Scale shape: t29's (one corpus shuffle + vocab-sized rounds) plus one
# corpus-sized (source, word) count and one vocab-sized join, left to
# AQE (broadcast while the vocabulary is small, shuffle when an open
# vocabulary outgrows it — the t23 margin-join discipline). All stats
# are exact BIGINTs; tokens-per-word quantizes by integer DIV to micros.

_T30_DUCK_ROUNDS = "".join(
    "," + _T29_DUCK_ROUND.format(r=r, r1=r + 1) for r in range(_T29_ROUNDS)
)

_T30_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
s0 AS (
  SELECT word, cnt,
         CAST(generate_subscripts(string_split(word, '') || ['{_T29_EOW}'], 1)
              AS BIGINT) AS pos,
         unnest(string_split(word, '') || ['{_T29_EOW}']) AS sym
  FROM wc
){_T30_DUCK_ROUNDS},
tlen AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM s{_T29_ROUNDS} GROUP BY word
),
stoks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
swc AS (
  SELECT source, tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM stoks WHERE tok <> '' GROUP BY source, tok
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(SUM(cnt * n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt * n_tok) * 1000000 // SUM(cnt) AS BIGINT)
         AS tokens_per_word_micros
FROM swc JOIN tlen USING (word)
GROUP BY source
ORDER BY source
"""


# apply the whole rank-ordered merge table to one symbol array in a
# single nested fold (outer fold over merges, inner fold = _T29_FOLD
# with the outer lambda's pair). By the BPE invariant this reproduces
# the training loop's final state exactly — round r applied merge r and
# nothing else — so encode needs ONE broadcast of the 8-row table plus
# one map-side pass, instead of pulling the 8-layer cached fold cascade
# through a 9th evaluation (measured 42 s vs 14 s cold at sf0.1).
_T30_APPLY = """
aggregate(merges, syms, (acc, m) ->
  aggregate(acc, CAST(array() AS array<string>),
    (a2, x) -> CASE
      WHEN size(a2) > 0 AND element_at(a2, -1) = m.pa AND x = m.pb
      THEN concat(slice(a2, 1, size(a2) - 1), array(concat(m.pa, m.pb)))
      ELSE concat(a2, array(x)) END))
"""


def _bpe_packed_merges(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    """The collected merge table packed as ONE row holding the
    rank-ordered (merge_rank, pa, pb) struct array — the broadcast
    operand of the _T30_APPLY nested fold. A local relation: the rows
    were already collected by the training loop, so no job runs here."""
    table = spark.createDataFrame(merges, _T29_TABLE_SCHEMA)
    return table.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "merge_rank",
                    F.col("left_sym").alias("pa"),
                    F.col("right_sym").alias("pb"),
                )
            )
        ).alias("merges")
    )


@register("t30_bpe_encode", oracle=_T30_ORACLE)
def t30_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword token statistics under the t29 tokenizer
    (module comment): train once, re-tokenize the vocabulary with one
    broadcast merge-table fold, join per-(source, word) counts."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    # Train once; reuse the loop's CACHED round-0 vocab for the
    # re-tokenize instead of re-scanning the corpus for a second word
    # count (round-13: one corpus-sized word-count stage, not two).
    merges, vocab0, _ = _bpe_train_core(docs)
    packed = _bpe_packed_merges(spark, merges)
    tlen = vocab0.select("word", "syms").crossJoin(F.broadcast(packed)).select(
        "word", F.size(F.expr(_T30_APPLY)).cast("bigint").alias("n_tok")
    )
    swc = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("source", F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        swc.join(tlen, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tok")).cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "tokens_per_word_micros",
            F.expr("CAST(n_tokens * 1000000 DIV n_words AS BIGINT)"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t31: BPE out-of-vocabulary encode — tokenize HELD-OUT text with a
# trained merge table
# ---------------------------------------------------------------------------
# t30 encodes the training corpus (whose words the final vocab state
# already covers); a tokenizer you can't run on held-out text is half a
# tokenizer. t31 completes it: train the merge table on the TRAIN split
# (doc_id % 4 != 0), then encode the HELD-OUT split (doc_id % 4 == 0) —
# including words the training corpus never saw — by broadcasting the
# rank-ordered merge table and re-applying it per held-out word with the
# same one-pass nested fold t30 uses (_T30_APPLY). OOV words simply fall
# through merges that don't fire, decomposing toward characters — the
# defining BPE property (Sennrich et al. 2016 §3: "open-vocabulary"),
# surfaced here as the per-source n_oov_words occurrence count.
#
# Scale shape: t29's training cost (one corpus shuffle + vocab-sized
# rounds) + one held-out (source, word) count + one held-out-vocab-sized
# broadcast fold + one vocab-vs-vocab join for the OOV flag (left to
# AQE, the t23 margin-join discipline). Nothing corpus-sized beyond the
# two token scans.
#
# Oracle: the train chain is t29's unrolled rounds verbatim; a PARALLEL
# held-out chain h0..hN applies each round's best_{r} with the same
# window-function merge machinery, so both engines tokenize held-out
# words through identical greedy-leftmost rounds.

_T31_TRAIN_PRED = "doc_id % 4 <> 0"
_T31_HELD_PRED = "doc_id % 4 = 0"

# apply best_{r} to the held-out state h{r} -> h{r1} (the m_/g_/st_
# machinery of _T29_DUCK_ROUND, renamed and re-sourced)
_T31_DUCK_HAPPLY = """
hm_{r} AS (
  SELECT s.word, s.cnt, s.pos, s.sym, b.a AS pa, b.b AS pb,
         (s.sym = b.a
          AND lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.b)
           AS cand
  FROM h{r} s CROSS JOIN best_{r} b
),
hg_{r} AS (
  SELECT *, CASE WHEN cand THEN pos - ROW_NUMBER() OVER
                  (PARTITION BY word, cand ORDER BY pos) END AS grp
  FROM hm_{r}
),
hst_{r} AS (
  SELECT *, CASE WHEN cand THEN (ROW_NUMBER() OVER
                  (PARTITION BY word, grp ORDER BY pos) - 1) % 2 = 0
            ELSE FALSE END AS mstart
  FROM hg_{r}
),
h{r1} AS (
  SELECT word, cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS BIGINT)
           AS pos,
         CASE WHEN mstart THEN pa || pb ELSE sym END AS sym
  FROM (SELECT *, lag(mstart, 1, FALSE) OVER
          (PARTITION BY word ORDER BY pos) AS consumed FROM hst_{r}) z
  WHERE NOT consumed
)
"""

_T31_DUCK_ROUNDS = "".join(
    "," + _T29_DUCK_ROUND.format(r=r, r1=r + 1)
    + "," + _T31_DUCK_HAPPLY.format(r=r, r1=r + 1)
    for r in range(_T29_ROUNDS)
)

_T31_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
  WHERE {_T31_TRAIN_PRED}
),
wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
s0 AS (
  SELECT word, cnt,
         CAST(generate_subscripts(string_split(word, '') || ['{_T29_EOW}'], 1)
              AS BIGINT) AS pos,
         unnest(string_split(word, '') || ['{_T29_EOW}']) AS sym
  FROM wc
),
hstoks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok FROM documents
  WHERE {_T31_HELD_PRED}
),
hswc AS (
  SELECT source, tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hstoks WHERE tok <> '' GROUP BY source, tok
),
h0 AS (
  SELECT word, CAST(1 AS BIGINT) AS cnt,
         CAST(generate_subscripts(string_split(word, '') || ['{_T29_EOW}'], 1)
              AS BIGINT) AS pos,
         unnest(string_split(word, '') || ['{_T29_EOW}']) AS sym
  FROM (SELECT DISTINCT word FROM hswc) hw
){_T31_DUCK_ROUNDS},
tlen AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM h{_T29_ROUNDS} GROUP BY word
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(SUM(cnt * n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt * n_tok) * 1000000 // SUM(cnt) AS BIGINT)
         AS tokens_per_word_micros,
       CAST(SUM(CASE WHEN tw.word IS NULL THEN cnt ELSE 0 END) AS BIGINT)
         AS n_oov_words
FROM hswc
JOIN tlen USING (word)
LEFT JOIN (SELECT word FROM wc) tw USING (word)
GROUP BY source
ORDER BY source
"""


def bpe_encode_words(
    spark: SparkSession, merge_table: DataFrame, words: DataFrame
) -> DataFrame:
    """Tokenize a (word) relation under a trained (merge_rank, left_sym,
    right_sym) table: broadcast the packed rank-ordered table and apply
    every merge with one nested fold per word (_T30_APPLY). Works for
    ANY words — in-vocabulary ones reproduce the training loop's final
    state exactly (the BPE invariant), OOV ones decompose toward
    characters. Returns (word, subwords array<string>, n_tok)."""
    packed = merge_table.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "merge_rank",
                    F.col("left_sym").alias("pa"),
                    F.col("right_sym").alias("pb"),
                )
            )
        ).alias("merges")
    )
    return (
        words.select(
            "word",
            F.concat(F.split("word", ""), F.array(F.lit(_T29_EOW))).alias("syms"),
        )
        .crossJoin(F.broadcast(packed))
        .select("word", F.expr(_T30_APPLY).alias("subwords"))
        .withColumn("n_tok", F.size("subwords").cast("bigint"))
    )


@register("t31_bpe_oov_encode", oracle=_T31_ORACLE)
def t31_bpe_oov_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword stats for the HELD-OUT split under a merge
    table trained on the TRAIN split only (module comment), plus the
    OOV occurrence count — the open-vocabulary property, measured."""
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    train = docs.filter(F.expr(_T31_TRAIN_PRED))
    held = docs.filter(F.expr(_T31_HELD_PRED))
    # Train once; the loop's cached round-0 vocab IS the train split's
    # distinct-word set, so the OOV flag join reuses it instead of
    # re-tokenizing the train corpus a second time (round-13).
    merges, train_vocab0, _ = _bpe_train_core(train)
    table = spark.createDataFrame(merges, _T29_TABLE_SCHEMA)
    hswc = (
        held.select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tlen = bpe_encode_words(
        spark, table, hswc.select("word").distinct()
    ).select("word", "n_tok")
    train_words = train_vocab0.select("word").withColumn("in_train", F.lit(1))
    return (
        hswc.join(tlen, "word")
        .join(train_words, "word", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tok")).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_train").isNull(), F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_oov_words"),
        )
        .withColumn(
            "tokens_per_word_micros",
            F.expr("CAST(n_tokens * 1000000 DIV n_words AS BIGINT)"),
        )
        .select(
            "source", "n_words", "n_tokens", "tokens_per_word_micros", "n_oov_words"
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# p41: BPE context-window packing — the tokenizer threaded into the
# pipeline family
# ---------------------------------------------------------------------------
# The question a pretraining run actually budgets with: under THIS
# tokenizer, how many fixed-size context windows does each source fill,
# and what does the layout cost? GPT-style pretraining concatenates the
# token stream and chunks it at the context length, so the exact
# answers are integer arithmetic over per-doc BPE token counts:
#   n_windows     = ceil(n_tokens / C)  (concatenate-then-chunk)
#   tail_waste    = n_windows * C - n_tokens (only the last window pads)
#   docs_crossing = docs whose token span straddles a window boundary
#                   (the attention-masking / doc-boundary cost)
# docs_crossing needs the per-source RUNNING token offset in doc_id
# order — one linear cumulative window per source, the q84 discipline.
#
# Scale shape: t29's training (one corpus shuffle + vocab-sized rounds)
# + one corpus-sized (doc, word) count joined to the vocab-sized subword
# lengths (AQE margin-join) + ONE linear cumulative window on (source)
# + a per-source rollup. Everything integer-exact.

_P41_CAPACITY = 256  # context-window tokens (docs here are ~20-40 tokens)

_P41_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
s0 AS (
  SELECT word, cnt,
         CAST(generate_subscripts(string_split(word, '') || ['{_T29_EOW}'], 1)
              AS BIGINT) AS pos,
         unnest(string_split(word, '') || ['{_T29_EOW}']) AS sym
  FROM wc
){_T30_DUCK_ROUNDS},
tlen AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM s{_T29_ROUNDS} GROUP BY word
),
dwc AS (
  SELECT doc_id, source, tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
  ) z WHERE tok <> '' GROUP BY doc_id, source, tok
),
dtok AS (
  SELECT doc_id, source, CAST(SUM(cnt * n_tok) AS BIGINT) AS dl_tok
  FROM dwc JOIN tlen USING (word) GROUP BY doc_id, source
),
run AS (
  SELECT source, doc_id, dl_tok,
         SUM(dl_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM dtok
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dl_tok) AS BIGINT) AS n_tokens,
       CAST((SUM(dl_tok) + {_P41_CAPACITY} - 1) // {_P41_CAPACITY} AS BIGINT)
         AS n_windows,
       CAST((SUM(dl_tok) + {_P41_CAPACITY} - 1) // {_P41_CAPACITY}
            * {_P41_CAPACITY} - SUM(dl_tok) AS BIGINT) AS tail_waste,
       CAST(SUM(CASE WHEN (cum - dl_tok) // {_P41_CAPACITY}
                       <> (cum - 1) // {_P41_CAPACITY}
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_crossing
FROM run
GROUP BY source
ORDER BY source
"""


@register("p41_bpe_window_packing", oracle=_P41_ORACLE)
def p41_bpe_window_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source context-window packing report under the t29 tokenizer
    (module comment): exact window counts, tail padding waste, and
    boundary-crossing docs for concatenate-then-chunk packing at
    C = 256."""
    from pyspark.sql.window import Window as W

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    # Train once; reuse the loop's cached round-0 vocab for the subword
    # lengths instead of a second corpus word count (round-13).
    merges, vocab0, _ = _bpe_train_core(docs)
    packed = _bpe_packed_merges(spark, merges)
    tlen = vocab0.select("word", "syms").crossJoin(F.broadcast(packed)).select(
        "word", F.size(F.expr(_T30_APPLY)).cast("bigint").alias("n_tok")
    )
    dwc = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "source", F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    dtok = (
        dwc.join(tlen, "word")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("cnt") * F.col("n_tok")).cast("bigint").alias("dl_tok"))
    )
    run = dtok.withColumn(
        "cum",
        F.sum("dl_tok").over(
            W.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    c = _P41_CAPACITY
    return (
        run.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl_tok").cast("bigint").alias("n_tokens"),
            F.sum(
                F.expr(f"CASE WHEN (cum - dl_tok) DIV {c} <> (cum - 1) DIV {c}"
                       " THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("docs_crossing"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_tokens",
            f"CAST((n_tokens + {c} - 1) DIV {c} AS BIGINT) AS n_windows",
            f"CAST((n_tokens + {c} - 1) DIV {c} * {c} - n_tokens AS BIGINT)"
            " AS tail_waste",
            "docs_crossing",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t32: BPE compression curve — corpus tokens-per-word vs merge rounds
# ---------------------------------------------------------------------------
# The training-curve diagnostic behind "how many merges do we buy?":
# corpus subword-token totals under the FIRST r merges, for r in
# {0, 2, 4, 8}. Round 0 is characters+EOW (the BPE floor); each
# checkpoint reuses the SAME training loop's cached vocab states — no
# re-training, just a vocab-sized length rollup per checkpoint — and
# the oracle reads the same checkpoints off prefixes of its one
# unrolled round chain. Diminishing compression per round is the
# expected (and measured) shape; a pipeline uses this curve to pick
# vocab size before paying for a full tokenizer run.

_T32_CHECKPOINTS = (0, 2, 4, 8)


def _t32_oracle() -> str:
    sels = []
    for r in _T32_CHECKPOINTS:
        sels.append(
            f"""SELECT CAST({r} AS BIGINT) AS merge_rounds,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens
    FROM s{r}"""
        )
    union = " UNION ALL ".join(sels)
    return f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
words AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_words FROM wc),
s0 AS (
  SELECT word, cnt,
         CAST(generate_subscripts(string_split(word, '') || ['{_T29_EOW}'], 1)
              AS BIGINT) AS pos,
         unnest(string_split(word, '') || ['{_T29_EOW}']) AS sym
  FROM wc
){_T30_DUCK_ROUNDS},
curve AS ({union})
SELECT merge_rounds, n_tokens,
       CAST(n_tokens * 1000000 // (SELECT n_words FROM words) AS BIGINT)
         AS tokens_per_word_micros
FROM curve
ORDER BY merge_rounds
"""


@register("t32_bpe_compression_curve", oracle=_t32_oracle())
def t32_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token totals at merge-round checkpoints {0, 2, 4, 8}
    (module comment): one training loop, per-checkpoint vocab-sized
    length rollups weighted by word count; tokens-per-word quantized by
    integer DIV to micros.

    Each checkpoint's symbol count is SUM over vocab of cnt * |syms| —
    per-checkpoint states come from the loop's cached fold cascade (the
    r-th state is exact, pinned by t29's Python-BPE equivalence test).
    """
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    # Round-13 plan-shape fix (see _bpe_train_core): literal-fold rounds
    # over ONE cached round-0 vocab; n_words also rolls up from that
    # cache instead of re-scanning the corpus.
    vocab = _bpe_vocab0(docs)
    n_words = vocab.agg(F.sum("cnt").cast("bigint").alias("n_words"))
    checkpoints: list[DataFrame] = []

    def checkpoint(state: DataFrame, r: int) -> DataFrame:
        return state.agg(
            F.lit(r).cast("bigint").alias("merge_rounds"),
            F.sum(F.size("syms") * F.col("cnt")).cast("bigint").alias("n_tokens"),
        )

    if 0 in _T32_CHECKPOINTS:
        checkpoints.append(checkpoint(vocab, 0))
    for r in range(1, max(_T32_CHECKPOINTS) + 1):
        rows = _bpe_argmax(vocab)
        if not rows:
            break
        vocab = _bpe_fold(vocab, rows[0].a, rows[0].b)
        if r in _T32_CHECKPOINTS:
            checkpoints.append(checkpoint(vocab, r))
    curve = checkpoints[0]
    for c in checkpoints[1:]:
        curve = curve.unionByName(c)
    return (
        curve.crossJoin(F.broadcast(n_words))
        .selectExpr(
            "merge_rounds",
            "n_tokens",
            "CAST(n_tokens * 1000000 DIV n_words AS BIGINT)"
            " AS tokens_per_word_micros",
        )
        .orderBy("merge_rounds")
    )
