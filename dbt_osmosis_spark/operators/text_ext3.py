"""Text analysis, part 3: collocation mining (t23) and the vocabulary
coverage curve (t24).


t23 surfaces statistically-associated word pairs (collocations) via the
PMI lift ratio P(ab) / (P(a)·P(b)), computed on the bigram sample space:
with c_a/c_b the left/right bigram margins and N the bigram total,
lift = c_ab·N / (c_a·c_b). PMI itself is log(lift); log is monotone, so
ranking by the integer lift IS the PMI ranking — and the integer form is
engine-exact (BIGINT multiply + DIV, basis points), where a float log
could disagree in the last ulp across engines.

Scale shape: one explode→groupBy(a,b) shuffle builds the bigram counts;
both margins and the grand total derive from that (vocabulary-sized)
count table with no second pass over text. Margin joins are left to AQE
(runtime post-shuffle sizes): broadcast while |vocab| is small, shuffle
when an open vocabulary outgrows it — never forced either way. The
final report is a deterministic top-200 (TakeOrderedAndProject, no
global sort). Overflow guard: c_ab·N·10⁴ stays under 2^63 through ~10⁹ bigrams
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
        # margins are VOCABULARY-sized: small at every tested SF, but not
        # provably tiny at open-vocabulary scale. No forced broadcast —
        # AQE decides from accurate post-shuffle runtime sizes (the d25
        # lesson inverted: forcing is as wrong as a bad estimate).
        .join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            "n_ab",
            F.expr("n_ab * n2 * 10000 DIV (c_a * c_b)").alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "a", "b")
        .limit(_T23_TOPK)
    )


# --------------------------------------------------------------------------
# t24: vocabulary coverage curve — what share of token occurrences does a
# top-V vocabulary cover, per source?
# --------------------------------------------------------------------------
# The tokenizer-sizing diagnostic: before committing to a vocab size you
# measure the occurrence mass the top-V types capture (and which sources
# fall off the curve — code vs prose corpora diverge hard here). Global
# type ranks are computed WITHOUT a corpus-global sort: the vocabulary
# count table is decomposed by count value — per-distinct-count offsets
# from a tiny window over the count histogram, plus a local row_number
# within each count partition (p19's bucket-offset pattern applied to
# ranking, the same move as q55's sweep line and s27's two-phase top-k).
# Everything after the one word-count shuffle is vocabulary-dimension.
# Coverage is exact basis points (integer DIV); the V sweep folds into
# one conditional aggregate per source and explodes to curve rows.

_T24_VS = (5, 10, 20)

_T24_ORACLE = f"""
WITH words AS (
  SELECT source, unnest(string_split(trim(text), ' ')) AS word FROM documents
),
wc AS (SELECT word, COUNT(*) AS n FROM words GROUP BY word),
ranked AS (
  SELECT word, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk FROM wc
),
sc AS (SELECT source, word, COUNT(*) AS cnt FROM words GROUP BY source, word),
j AS (SELECT s.source, s.cnt, r.rnk FROM sc s JOIN ranked r ON r.word = s.word),
agg AS (
  SELECT source,
         CAST(SUM(cnt) AS BIGINT) AS total,
         {', '.join(f"CAST(SUM(CASE WHEN rnk <= {v} THEN cnt ELSE 0 END) AS BIGINT) AS cov{v}" for v in _T24_VS)}
  FROM j GROUP BY source
)
{' UNION ALL '.join(
    f"SELECT source, CAST({v} AS INT) AS v_size, cov{v} AS covered,"
    f" cov{v} * 10000 // total AS covered_bp FROM agg"
    for v in _T24_VS
)}
ORDER BY source, v_size
"""


@register("t24_vocab_coverage_curve", oracle=_T24_ORACLE)
def t24_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    words = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("word")
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # Distributed global rank: offsets from the count-value histogram
    # (|distinct counts| rows — tiny), local row_number within one count.
    hist = wc.groupBy("n").agg(F.count(F.lit(1)).alias("k"))
    off = F.coalesce(
        F.sum("k").over(W.orderBy(F.desc("n")).rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("bigint")
    offsets = hist.select("n", off.alias("off"))
    local = F.row_number().over(W.partitionBy("n").orderBy("word"))
    ranked = (
        wc.withColumn("lrn", local)
        .join(F.broadcast(offsets), "n")
        .select("word", (F.col("off") + F.col("lrn")).alias("rnk"))
    )
    sc = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
    # ranked is vocabulary-sized — let AQE pick broadcast vs shuffle from
    # its real post-shuffle size (open vocabularies outgrow any forced
    # broadcast; the histogram `offsets` above stays forced, it is
    # |distinct counts| rows by construction)
    j = sc.join(ranked, "word")
    covs = [
        F.sum(F.when(F.col("rnk") <= v, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias(f"cov{v}")
        for v in _T24_VS
    ]
    agg = j.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total"), *covs
    )
    curve = ", ".join(
        f"struct(CAST({v} AS INT) AS v_size, cov{v} AS covered)" for v in _T24_VS
    )
    return (
        agg.select(
            "source", "total", F.explode(F.expr(f"array({curve})")).alias("x")
        )
        .select(
            "source",
            "x.v_size",
            "x.covered",
            F.expr("covered * 10000 DIV total").alias("covered_bp"),
        )
        .orderBy("source", "v_size")
    )


# --------------------------------------------------------------------------
# t26: cross-document n-gram repetition share — memorization risk, per source
# --------------------------------------------------------------------------
# What fraction of a source's 5-gram postings also appear in ANOTHER
# document? High cross-doc n-gram mass is the memorization-risk signal
# (boilerplate, templates, licensed text recurring verbatim) that
# motivates d15/d18's span dedup — this is the one-row-per-source
# DASHBOARD over the same phenomenon: cheap enough to run on every drop,
# pointing at which source needs the expensive pass. Mechanics: distinct
# 5-grams per doc (one explode), gram document-frequency (one shuffle on
# the gram key), postings flagged df>1, per-source exact-bp share.
# Cross-doc means ACROSS docs: a gram repeated only inside one document
# does not count (that is t08's intra-doc signal).

_T26_K = 5

_T26_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct([{' || '.join("w[i + %d]" % j + (" || ' '" if j < _T26_K - 1 else "") for j in range(_T26_K))} for i in range(1, len(w) - {_T26_K - 2})])) AS g
  FROM tok WHERE len(w) >= {_T26_K}
),
hashed AS (
  SELECT source, CAST('0x' || substr(md5('t26#' || g), 1, 15) AS BIGINT) AS gh
  FROM grams
),
gs AS (SELECT gh, source, COUNT(*) AS c FROM hashed GROUP BY gh, source),
dfreq AS (SELECT gh, SUM(c) AS df FROM gs GROUP BY gh)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_postings,
       CAST(SUM(CASE WHEN df > 1 THEN c ELSE 0 END) AS BIGINT) AS n_repeated,
       CAST(SUM(CASE WHEN df > 1 THEN c ELSE 0 END) AS BIGINT) * 10000
         // CAST(SUM(c) AS BIGINT) AS repeated_bp
FROM gs JOIN dfreq USING (gh)
GROUP BY source
ORDER BY source
"""


@register("t26_crossdoc_ngram_share", oracle=_T26_ORACLE)
def t26_crossdoc_ngram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.text import spark_shingles_sql, tokens

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    grams = (
        docs.withColumn("w", tokens())
        .filter(F.size("w") >= _T26_K)
        .select(
            "source",
            F.explode(F.expr(spark_shingles_sql("w", _T26_K))).alias("g"),
        )
        .select(
            "source",
            # 60-bit md5 gram key (the d15 discipline): the shuffle moves
            # 8-byte integers, not ~50-byte 5-gram strings — same shared
            # derivation on both engines, so exactness is untouched
            F.expr(
                "CAST(conv(substr(md5(CAST(concat('t26#', g) AS BINARY)), 1, 15),"
                " 16, 10) AS BIGINT)"
            ).alias("gh"),
        )
    )
    # Aggregate BEFORE joining: the naive postings⋈dfreq join shuffles
    # the full posting stream twice and measured 16.8x/30x. Collapsing to
    # (gram, source) counts first makes the df join gram-vocabulary-sized
    # — the postings never shuffle again after their one groupBy.
    gs = grams.groupBy("gh", "source").agg(F.count(F.lit(1)).alias("c"))
    dfreq = gs.groupBy("gh").agg(F.sum("c").alias("df"))
    return (
        gs.join(dfreq, "gh")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_postings"),
            F.sum(F.when(F.col("df") > 1, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_repeated"),
            F.expr(
                "CAST(SUM(CASE WHEN df > 1 THEN c ELSE 0 END) AS BIGINT) * 10000"
                " DIV CAST(SUM(c) AS BIGINT)"
            ).alias("repeated_bp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t27: RAKE keyphrase extraction
# ---------------------------------------------------------------------------
# RAKE (Rapid Automatic Keyword Extraction; Rose, Engel, Cramer & Cowley
# 2010) is the classic unsupervised keyphrase miner: split each document
# into candidate phrases at stopwords, score each word by degree/frequency
# over the candidate set, score a phrase as the sum of its member-word
# scores. The corpus here is synthetic with no natural-language stoplist,
# so the stoplist is data-driven: the top-12 most frequent tokens
# (ties broken lexically) — the same frequency-rank heuristic RAKE's
# authors suggest for stoplist construction (Rose et al. 2010 §1.2.1).
#
# Exactness: freq(w) and deg(w) are BIGINTs; the only float op is one
# IEEE double division deg/freq (exactly specified for exact-integer
# inputs), scaled and half-up-quantized to 1e-9 BIGINT micros per word
# BEFORE summation — so the phrase score is an order-free BIGINT sum and
# hashes identically across engines (the t13/t25 move).
#
# Scale shape: one tokenize pass; the stoplist is a vocabulary-sized
# rollup taken top-12 (TakeOrderedAndProject, broadcast back as a
# left-anti join); candidate segmentation is a per-document window
# (partitioned by doc_id — balanced, no skew since docs are bounded);
# word stats are a vocabulary-sized rollup broadcast back; the final
# report is a deterministic top-25 (no global sort). The corpus text is
# scanned exactly once.
#
# Reference parity: corpus-analysis surface on top of the reference's
# SQL-to-warehouse plane (src/dbt_osmosis/core/sql_operations.py).

_T27_NSTOP = 12
_T27_TOPK = 25

_T27_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS word
  FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)
),
stop AS (
  SELECT word FROM pos GROUP BY word
  ORDER BY COUNT(*) DESC, word LIMIT {_T27_NSTOP}
),
cand AS (
  SELECT doc_id, pos, word,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM pos WHERE word NOT IN (SELECT word FROM stop)
),
runs AS (
  SELECT doc_id, pos, word, grp,
         COUNT(*) OVER (PARTITION BY doc_id, grp) AS plen
  FROM cand
),
wstats AS (
  SELECT word, COUNT(*) AS freq, CAST(SUM(plen) AS BIGINT) AS deg
  FROM runs GROUP BY word
),
wscore AS (
  SELECT word,
         CAST(floor(CAST(deg AS DOUBLE) / freq * 1e9 + 0.5) AS BIGINT) AS q
  FROM wstats
),
inst AS (
  SELECT r.doc_id, r.grp,
         string_agg(r.word, ' ' ORDER BY r.pos) AS phrase,
         CAST(SUM(s.q) AS BIGINT) AS score_nano
  FROM runs r JOIN wscore s ON r.word = s.word
  GROUP BY r.doc_id, r.grp
)
SELECT phrase,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs,
       MAX(score_nano) AS score_nano
FROM inst
GROUP BY phrase
ORDER BY score_nano DESC, phrase
LIMIT {_T27_TOPK}
"""


@register("t27_rake_keyphrases", oracle=_T27_ORACLE)
def t27_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-25 RAKE keyphrases (Rose et al. 2010) with a
    frequency-rank stoplist; integer-exact scoring (module comment)."""
    from pyspark.sql.window import Window

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), " ")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "word")
    stop = (
        pos.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(_T27_NSTOP)
        .select("word")
    )
    cand = pos.join(F.broadcast(stop), "word", "left_anti").withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    runs = cand.withColumn(
        "plen", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "grp"))
    )
    wscore = (
        runs.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg"))
        .select(
            "word",
            F.floor(
                F.col("deg").cast("double") / F.col("freq") * F.lit(1e9) + F.lit(0.5)
            )
            .cast("bigint")
            .alias("q"),
        )
    )
    inst = (
        runs.join(F.broadcast(wscore), "word")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(pos, word))), x -> x.word)"),
                " ",
            ).alias("phrase"),
            F.sum("q").cast("bigint").alias("score_nano"),
        )
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("score_nano").alias("score_nano"),
        )
        .orderBy(F.desc("score_nano"), "phrase")
        .limit(_T27_TOPK)
    )


# ---------------------------------------------------------------------------
# t28: Burrows' Delta — stylometric distance between sources
# ---------------------------------------------------------------------------
# The standard authorship-attribution / style-drift measure (Burrows,
# "'Delta': a Measure of Stylistic Difference", LLC 2002): profile each
# source by the relative frequencies of the corpus's most frequent words,
# standardize each word across sources, and compare profiles by mean
# |z_a - z_b|. Training-data pipelines use exactly this to detect when
# one ingestion source drifts stylistically from the fleet.
#
# This implementation standardizes by MAD (mean absolute deviation), a
# documented Delta variant, because MAD integerizes where stddev's sqrt
# cannot: with fq = Q9(cnt/T_s) the 1e-9-quantized relative frequency,
#   c_{s,w}      = S*fq_{s,w} - SUM_s fq        (integer, = S^2*(f - mean))
#   MADs_w       = SUM_s |c_{s,w}|              (integer, = S^2 * S*MAD)
#   |z_a - z_b|  = S^2 * |fq_a - fq_b| / MADs_w (one double div, Q6)
# Each pair term quantizes to integer micros BEFORE the sum over words,
# so Delta is an order-free BIGINT sum; words with MADs = 0 (identical
# frequency in every source) carry no signal and are excluded by both
# engines. Absent (source, word) pairs count fq = 0 via the grid join.
#
# Magnitude bounds: fq <= 1e9, c <= S*1e9, MADs <= S^2*1e9, the z term
# numerator S^2*|dfq| <= S^2*1e9 — BIGINT-safe to S ~ 2000 sources.
#
# Scale shape: one tokenize; top-W word list is a vocabulary rollup
# top-40 (broadcast); per-(source, word) counts are semi-joined to the
# word list BEFORE their shuffle; per-source totals are one rollup; all
# downstream frames are (S x W)-sized. The pair expansion is
# (S^2/2) x W rows of integers — driver-tiny here, still executor-local
# arithmetic at thousands of sources.

_T28_TOPW = 40

_T28_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
toks_ne AS (SELECT source, tok FROM toks WHERE tok <> ''),
topw AS (
  SELECT tok AS word FROM toks_ne GROUP BY tok
  ORDER BY COUNT(*) DESC, tok LIMIT {_T28_TOPW}
),
tsrc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t_s FROM toks_ne GROUP BY source),
cnts AS (
  SELECT source, tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks_ne WHERE tok IN (SELECT word FROM topw)
  GROUP BY source, tok
),
grid AS (
  SELECT t.source, w.word, t.t_s, COALESCE(c.cnt, 0) AS cnt
  FROM tsrc t CROSS JOIN topw w
  LEFT JOIN cnts c ON c.source = t.source AND c.word = w.word
),
fq AS (
  SELECT source, word,
         CAST(floor(CAST(cnt AS DOUBLE) / t_s * 1e9 + 0.5) AS BIGINT) AS fq
  FROM grid
),
nsrc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_n FROM tsrc),
cen AS (
  SELECT f.source, f.word,
         n.s_n * f.fq - SUM(f.fq) OVER (PARTITION BY f.word) AS c,
         f.fq, n.s_n
  FROM fq f CROSS JOIN nsrc n
),
mad AS (
  SELECT word, CAST(SUM(abs(c)) AS BIGINT) AS mads FROM cen GROUP BY word
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.word,
         CAST(floor(CAST(a.s_n * a.s_n * abs(a.fq - b.fq) AS DOUBLE) / m.mads
                    * 1e6 + 0.5) AS BIGINT) AS z_micro
  FROM cen a
  JOIN cen b ON a.word = b.word AND a.source < b.source
  JOIN mad m ON m.word = a.word
  WHERE m.mads > 0
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(z_micro) // COUNT(*) AS BIGINT) AS delta_micro
FROM pairs
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@register("t28_burrows_delta", oracle=_T28_ORACLE)
def t28_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Burrows' Delta (MAD-standardized, integer-exact interior)
    between ingestion sources over the top-40 corpus words."""
    from pyspark.sql.window import Window as W

    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    topw = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(_T28_TOPW)
        .select(F.col("tok").alias("word"))
    )
    tsrc = toks.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("t_s"))
    cnts = (
        toks.join(F.broadcast(topw), toks.tok == topw.word)
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    grid = (
        tsrc.crossJoin(F.broadcast(topw))
        .join(cnts, ["source", "word"], "left")
        .select(
            "source",
            "word",
            "t_s",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    fq = grid.select(
        "source",
        "word",
        F.expr("CAST(floor(CAST(cnt AS DOUBLE) / t_s * 1e9 + 0.5) AS BIGINT)").alias(
            "fq"
        ),
    )
    nsrc = tsrc.agg(F.count(F.lit(1)).cast("bigint").alias("s_n"))
    cen = fq.crossJoin(F.broadcast(nsrc)).select(
        "source",
        "word",
        "fq",
        "s_n",
        (F.col("s_n") * F.col("fq") - F.sum("fq").over(W.partitionBy("word"))).alias(
            "c"
        ),
    )
    mad = cen.groupBy("word").agg(F.sum(F.abs("c")).cast("bigint").alias("mads"))
    a = cen.select(
        F.col("source").alias("source_a"),
        "word",
        F.col("fq").alias("fq_a"),
        "s_n",
    )
    b = cen.select(F.col("source").alias("source_b"), "word", F.col("fq").alias("fq_b"))
    pairs = (
        a.join(b, "word")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(mad.filter(F.col("mads") > 0)), "word")
        .select(
            "source_a",
            "source_b",
            F.expr(
                "CAST(floor(CAST(s_n * s_n * abs(fq_a - fq_b) AS DOUBLE) / mads"
                " * 1e6 + 0.5) AS BIGINT)"
            ).alias("z_micro"),
        )
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.expr("CAST(SUM(z_micro) DIV COUNT(*) AS BIGINT)").alias("delta_micro"),
        )
        .orderBy("source_a", "source_b")
    )
