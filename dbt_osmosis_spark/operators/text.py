"""Text-analysis operators for large-scale training-data pipelines.

Everything is built from JVM-side ``pyspark.sql.functions`` (no Python UDFs
in the hot path): tokenization with ``split``, higher-order array functions
(``transform``/``filter``/``aggregate``) for per-token work, md5-derived
integer hashing for fingerprints. Each operator is embarrassingly parallel —
per-row map work with one final aggregation — so it scales linearly with
executors; the only shuffles are the final small groupBys.

Hash convention (shared with dedup.py): ``h(s) = int(md5(s)[:15], 16)`` — a
60-bit positive integer computable identically in Spark
(``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``), making every hash-based
operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.functions.numeric import dec_sum
from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

# ---- shared building blocks ------------------------------------------------


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.trim(F.col(col)), " ")


def md5_int(c: Column) -> Column:
    """60-bit positive int from md5 — the cross-engine hash."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")


# Spark-SQL expression fragments over a named token-array column.
SPARK_MD5INT = "CAST(conv(substr(md5(cast({x} AS BINARY)), 1, 15), 16, 10) AS BIGINT)"


def spark_bloom_bit_sql(j: str, s: str, m: int) -> str:
    """The canonical Bloom bit derivation: 60-bit md5 of ('b', j, '#', s)
    mod m. Shared by p12's decontamination filter and the streaming-ingest
    index sketch so the two Bloom constructions cannot drift apart."""
    return SPARK_MD5INT.format(x=f"concat('b', CAST({j} AS STRING), '#', {s})") + f" % {m}"


def spark_shingles_sql(tok_col: str, k: int = 3) -> str:
    """Distinct k-gram word shingles of token array `tok_col` — built-ins
    only (sequence/transform/concat_ws): pure map-side, no explode."""
    grams = ", ".join(f"element_at({tok_col}, i + {j + 1})" for j in range(k))
    return (
        f"array_distinct(transform(sequence(0, greatest(size({tok_col}) - {k}, -1)),"
        f" i -> concat_ws(' ', {grams})))"
    )


_STOPWORDS = ("the", "a")

_DUCK_TOK = "string_split(trim(text), ' ')"


def _duck_shingles(k: int = 3) -> str:
    grams = " || ' ' || ".join(f"w[i + {j}]" for j in range(k))
    return f"list_distinct([{grams} for i in range(1, len(w) - {k - 2})])"


# ---- t01: token statistics per source --------------------------------------


@register(
    "t01_token_stats",
    oracle=f"""
WITH tok AS (
  SELECT source, {_DUCK_TOK} AS w, n_chars FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(w) AS DECIMAL(18,0))) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(len(w) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(MAX(len(w)) AS INTEGER) AS max_tokens,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars
FROM tok
GROUP BY source
ORDER BY source
""",
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    n_tok = F.size(tokens())
    return (
        docs.select("source", n_tok.alias("n_tok"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("decimal(18,0)")).cast("bigint").alias("total_tokens"),
            (
                F.sum(F.col("n_tok").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))
            ).alias("avg_tokens"),
            F.max("n_tok").alias("max_tokens"),
            F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---- t02: per-document quality score ---------------------------------------
# Deterministic heuristic: stopword ratio + token-length shape + length band.
# All-integer inputs → double ratios are bit-exact in both engines.

_QUALITY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {_DUCK_TOK} AS w, n_chars FROM documents
),
feat AS (
  SELECT doc_id, source, n_chars,
         len(w) AS n_tokens,
         len(list_filter(w, x -> x IN ('the', 'a'))) AS n_stop,
         len(list_filter(w, x -> len(x) >= 6)) AS n_long
  FROM tok
)
SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_long AS DOUBLE) / n_tokens AS long_token_ratio,
       CAST(CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS length_ok,
       (CAST(n_stop AS DOUBLE) / n_tokens)
         + (CAST(n_long AS DOUBLE) / n_tokens)
         + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END)
         AS quality_score
FROM feat
ORDER BY doc_id
"""


@register("t02_quality_score", oracle=_QUALITY_ORACLE)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    tok = tokens()
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    feat = docs.select(
        "doc_id",
        "source",
        F.size(tok).alias("n_tokens"),
        F.size(F.expr(f"filter(split(trim(text), ' '), x -> x IN ({stop_list}))")).alias("n_stop"),
        F.size(F.expr("filter(split(trim(text), ' '), x -> length(x) >= 6)")).alias("n_long"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    long_ratio = F.col("n_long").cast("double") / F.col("n_tokens")
    length_ok = F.when(F.col("n_tokens").between(20, 80), 1.0).otherwise(0.0)
    return feat.select(
        "doc_id",
        "source",
        "n_tokens",
        stop_ratio.alias("stopword_ratio"),
        long_ratio.alias("long_token_ratio"),
        length_ok.alias("length_ok"),
        (stop_ratio + long_ratio + length_ok).alias("quality_score"),
    ).orderBy("doc_id")


# ---- t03: language identification (marker-token heuristic) -----------------
# Votes of language-specific marker tokens; argmax with deterministic
# tie-break (alphabetical language order, 'und' when zero evidence).

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "nicht", "das"),
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "que", "de"),
    "fr": ("le", "la", "et", "les"),
}


def _score_sql(markers: tuple[str, ...], list_fn: str) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len({list_fn}(w, x -> x IN ({inlist})))"


# tok -> marker scores -> argmax decision, exposed as CTEs ending in
# `decided` (doc_id, labeled_lang, lang_pred). Shared by t03 (confusion
# matrix) and t20 (per-language eval metrics, text_ext2.py) so the decision
# rule can never drift between the two oracles.
DUCK_LANGID_CTES = (
    f"""tok AS (
  SELECT doc_id, lang AS labeled_lang, {_DUCK_TOK} AS w FROM documents
),
scored AS (
  SELECT doc_id, labeled_lang,
"""
    + ",\n".join(
        f"         {_score_sql(m, 'list_filter')} AS score_{lang}"
        for lang, m in _LANG_MARKERS.items()
    )
    + """
  FROM tok
),
decided AS (
  SELECT doc_id, labeled_lang,
         CASE
           WHEN score_de = 0 AND score_en = 0 AND score_es = 0 AND score_fr = 0 THEN 'und'
           WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
           WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
           WHEN score_es >= score_fr THEN 'es'
           ELSE 'fr'
         END AS lang_pred
  FROM scored
)"""
)

_LANG_ORACLE = f"""
WITH {DUCK_LANGID_CTES}
SELECT lang_pred, labeled_lang, COUNT(*) AS n_docs
FROM decided
GROUP BY lang_pred, labeled_lang
ORDER BY lang_pred, labeled_lang
"""


def langid_decided(docs: DataFrame) -> DataFrame:
    """(doc_id, labeled_lang, lang_pred): the Spark twin of
    DUCK_LANGID_CTES' `decided`. Map-side only — marker counting and the
    argmax CASE are per-row expressions; callers aggregate as they like."""
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(
                F.expr(
                    "filter(split(trim(text), ' '), x -> x IN (%s))"
                    % ", ".join(f"'{m}'" for m in markers)
                )
            ).alias(f"score_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    s = {lang: F.col(f"score_{lang}") for lang in _LANG_MARKERS}
    decided = scored.select(
        "doc_id",
        "labeled_lang",
        F.when(
            (s["de"] == 0) & (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0), "und"
        )
        .when((s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
        .alias("lang_pred"),
    )
    return decided


@register("t03_lang_id", oracle=_LANG_ORACLE)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        langid_decided(docs)
        .groupBy("lang_pred", "labeled_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred", "labeled_lang")
    )


# ---- t04: document fingerprint (min-hash-1 over shingles) ------------------
# fingerprint = min over 3-gram shingles of h(shingle): a single-permutation
# MinHash — documents sharing it are near-duplicate candidates.

_FP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
sh AS (
  SELECT doc_id, {_duck_shingles(3)} AS s FROM tok WHERE len(w) >= 3
)
SELECT doc_id,
       list_aggregate(
         list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)),
         'min'
       ) AS fingerprint,
       CAST(len(s) AS INTEGER) AS n_shingles
FROM sh
ORDER BY doc_id
"""


@register("t04_doc_fingerprint", oracle=_FP_ORACLE)
def t04_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    h = SPARK_MD5INT.format(x="x")
    return (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .withColumn("s", F.expr(spark_shingles_sql("w", 3)))
        .select(
            "doc_id",
            F.array_min(F.expr(f"transform(s, x -> {h})")).alias("fingerprint"),
            F.size("s").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


# ---- t05: BPE-ish regex token counting -------------------------------------
# Subword-style tokenization: letter runs, digit runs, punctuation runs —
# the pre-merge segmentation every BPE tokenizer starts from. The pattern
# uses only character classes so Java regex (Spark) and RE2 (DuckDB)
# segment identically; corpus is ASCII so byte==char. Map-side
# regexp_extract_all per row, no shuffle until the final per-source agg.

_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

_T05_ORACLE = f"""
WITH seg AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(trim(text), '{_BPE_PATTERN}')) AS INTEGER) AS n_bpe,
         CAST(len({_DUCK_TOK}) AS INTEGER) AS n_ws
  FROM documents
)
SELECT doc_id, source, n_bpe, n_ws,
       CAST(n_bpe AS DOUBLE) / n_ws AS subword_ratio
FROM seg
ORDER BY doc_id
"""


@register("t05_bpe_tokens", oracle=_T05_ORACLE)
def t05_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    n_bpe = F.size(F.expr(f"regexp_extract_all(trim(text), '{_BPE_PATTERN}', 0)"))
    n_ws = F.size(tokens())
    return (
        docs.select(
            "doc_id",
            "source",
            n_bpe.alias("n_bpe"),
            n_ws.alias("n_ws"),
        )
        .withColumn("subword_ratio", F.col("n_bpe").cast("double") / F.col("n_ws"))
        .orderBy("doc_id")
    )


# ---- t08: repetition signals (Gopher-style quality rules) ------------------
# Intra-document repetition: (1) duplicate 3-gram fraction = 1 -
# distinct/total shingles; (2) top-token dominance = max single-token count
# / token count. High values flag boilerplate/spam for the filtering stage
# (p07 consumes scores the same way). Pure map-side array math per row —
# integer counts, exact double ratios, no shuffle before the final sort.

_T08_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
feat AS (
  SELECT doc_id,
         len(w) AS n_tokens,
         len(w) - 2 AS total_shingles,
         len({_duck_shingles(3)}) AS distinct_shingles,
         list_aggregate(
           list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x))),
           'max') AS top_token_count
  FROM tok WHERE len(w) >= 3
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       1.0 - CAST(distinct_shingles AS DOUBLE) / total_shingles AS dup_shingle_frac,
       CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_frac
FROM feat
ORDER BY doc_id
"""


@register("t08_repetition_signals", oracle=_T08_ORACLE)
def t08_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    feat = (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            (F.size("w") - 2).alias("total_shingles"),
            F.size(F.expr(spark_shingles_sql("w", 3))).alias("distinct_shingles"),
            F.expr(
                "array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x))))"
            ).alias("top_token_count"),
        )
    )
    return feat.select(
        "doc_id",
        "n_tokens",
        (F.lit(1.0) - F.col("distinct_shingles").cast("double") / F.col("total_shingles")).alias(
            "dup_shingle_frac"
        ),
        (F.col("top_token_count").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
    ).orderBy("doc_id")


# ---- t09: text normalization ----------------------------------------------
# The canonicalization pass that precedes hashing/dedup in every pretraining
# pipeline: lowercase, collapse whitespace runs, strip edge punctuation per
# token. Pure map-side expressions (regexp + lower — whole-stage codegen,
# no UDF); character-class-only regex so Java (Spark) and RE2 (DuckDB)
# agree byte-for-byte.

_T09_ORACLE = """
SELECT doc_id,
       regexp_replace(trim(lower(regexp_replace(text, '[ ]+', ' ', 'g'))),
                      '(^[.,;:!?]+)|([.,;:!?]+$)', '', 'g') AS norm_text,
       CAST(len(string_split(trim(lower(regexp_replace(text, '[ ]+', ' ', 'g'))), ' ')) AS INTEGER) AS n_tokens
FROM documents
ORDER BY doc_id
"""


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    collapsed = F.lower(F.regexp_replace(F.col(text_col), "[ ]+", " "))
    trimmed = F.trim(collapsed)
    return df.withColumn(
        "norm_text",
        F.regexp_replace(trimmed, r"(^[.,;:!?]+)|([.,;:!?]+$)", ""),
    ).withColumn("n_tokens", F.size(F.split(trimmed, " ")))


@register("t09_normalize", oracle=_T09_ORACLE)
def t09_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return normalize_text(docs).select("doc_id", "norm_text", "n_tokens").orderBy("doc_id")


# ---- t10: readability scoring (Flesch reading ease, heuristic syllables) ---
# Syllables = vowel-group count per token (the standard cheap heuristic),
# sentences = terminal-punctuation count (min 1). All counts are exact
# integers computed by JVM regexes inside higher-order functions — zero
# Python, map-side only; the Flesch formula is then deterministic IEEE
# double arithmetic, identical in both engines.

_T10_ORACLE = """
WITH feat AS (
  SELECT doc_id, source,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(string_split(trim(text), ' '),
              x -> len(regexp_extract_all(x, '[aeiouy]+')))) AS BIGINT) AS n_syllables,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS BIGINT) AS n_sentences
  FROM documents
)
SELECT doc_id, source, n_words, n_syllables, n_sentences,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch
FROM feat
WHERE n_words > 0
ORDER BY doc_id
"""


@register("t10_readability", oracle=_T10_ORACLE)
def t10_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    tok = tokens()
    feat = docs.select(
        "doc_id",
        "source",
        F.size(tok).cast("bigint").alias("n_words"),
        F.expr(
            "CAST(aggregate(split(trim(text), ' '), 0, "
            "(acc, x) -> acc + size(regexp_extract_all(x, '[aeiouy]+', 0))) AS BIGINT)"
        ).alias("n_syllables"),
        F.greatest(
            F.expr("size(regexp_extract_all(text, '[.!?]', 0))"), F.lit(1)
        )
        .cast("bigint")
        .alias("n_sentences"),
    )
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words")),
        6,
    )
    return (
        feat.filter(F.col("n_words") > 0)
        .select("doc_id", "source", "n_words", "n_syllables", "n_sentences", flesch.alias("flesch"))
        .orderBy("doc_id")
    )
