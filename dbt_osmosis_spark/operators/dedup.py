"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of these over naive O(n²)):

- **exact**: one shuffle on md5(text) — distributed group-by, no driver data.
- **ngram-jaccard**: exact pairwise similarity *within candidate buckets
  only*; exposed standalone here (bounded input) and as the LSH verify
  stage. Never run bare at 100 TB — the candidate generator bounds it.
- **minhash-lsh**: per-doc signature is pure map-side array math (no
  shuffle); banding explodes to b rows/doc; the only shuffle groups by
  (band, band-key). Pair verification joins shingle sets for *candidates
  only*. This is the textbook web-scale near-dup pipeline.
- **simhash**: per-doc 48-bit signature map-side; duplicates-by-bucket via
  one group-by. Hamming-ball probing (rotations) is round-2 work.

Everything is md5-int based (see operators/text.py) so every stage — even
the LSH banding — hash-matches the DuckDB oracle exactly. No Python UDFs;
all array math runs in the JVM via higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.operators.caching import keep_cached
from dbt_osmosis_spark.operators.text import (
    SPARK_MD5INT,
    _DUCK_TOK,
    _duck_shingles,
    spark_shingles_sql,
    tokens,
)
from dbt_osmosis_spark.sources.parquet import read_parquet, spread

# ---- d01: exact dedup ------------------------------------------------------


@register(
    "d01_dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
""",
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


# ---- d02: n-gram Jaccard near-dup pairs ------------------------------------
# Exact Jaccard over distinct 3-gram shingles via shingle-inverted-index
# self-join. Integer intersection / union counts → double ratio is exact.

_JACCARD_THRESHOLD = 0.5

_D02_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
sh AS (
  SELECT doc_id, unnest({_duck_shingles(3)}) AS shingle
  FROM tok WHERE len(w) >= 3
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard
FROM pair_common p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) >= {_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


@register("d02_ngram_jaccard_pairs", oracle=_D02_ORACLE)
def d02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    # reused by three branches (sizes + both self-join sides) — persist once
    sh = (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .select("doc_id", F.explode(F.expr(spark_shingles_sql("w", 3))).alias("shingle"))
    ).transform(keep_cached)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pair_common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        pair_common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


# ---- d03: MinHash + LSH candidate pairs ------------------------------------
# K=24 permutations via universal hashing: each shingle is md5-hashed ONCE to
# a 28-bit int h, then h_i = (a_i*h + b_i) mod p (p = 2^31-1) — 24x fewer
# md5 calls than hashing per-(perm, shingle), and a_i*h stays < 2^59 (no
# int64 overflow). The (a_i, b_i) constants are md5-derived in Python and
# inlined as literals in BOTH engines' SQL — bit-identical pipelines.
# B=8 bands × R=3 rows; candidates share a band hash; verified with exact
# Jaccard on candidates ONLY.

_K, _B, _R = 24, 8, 3
_MERSENNE = 2147483647  # 2^31 - 1


def _hash_const(tag: str, i: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:7], 16)
    return h % _MERSENNE


_A = [(_hash_const("a", i) | 1) for i in range(_K)]
_B_CONST = [_hash_const("b", i) for i in range(_K)]

# 28-bit shingle hash (7 hex chars) — shared by both engines.
_SPARK_H28 = "CAST(conv(substr(md5(cast(x AS BINARY)), 1, 7), 16, 10) AS BIGINT)"
_DUCK_H28 = "CAST('0x' || substr(md5(x), 1, 7) AS BIGINT)"


def _duck_minhash_sig() -> str:
    a = "[" + ", ".join(str(v) for v in _A) + "]"
    b = "[" + ", ".join(str(v) for v in _B_CONST) + "]"
    return (
        f"list_transform(range(0, {_K}), i -> "
        f"list_aggregate(list_transform(hs, h -> "
        f"(({a})[i + 1] * h + ({b})[i + 1]) % {_MERSENNE}"
        f"), 'min'))"
    )


def duck_lsh_side_ctes(name: str, predicate: str = "") -> str:
    """The tok→shingles→hashed→minhash-sig→bands oracle chain for ONE
    document subset, as CTEs ``{name}`` (doc_id, sig, s) and
    ``{name}_bands`` (doc_id, band, band_key). Single source of truth for
    the banding/signature formulas — DUCK_LSH_CTES below and d11's
    asymmetric batch-vs-corpus join (pipeline_ext.py) both build from it,
    so the formula can never drift between oracles."""
    where = f" WHERE {predicate}" if predicate else ""
    return f"""{name} AS (
  SELECT doc_id, {_duck_minhash_sig()} AS sig, s FROM (
    SELECT doc_id, s, list_transform(s, x -> {_DUCK_H28}) AS hs FROM (
      SELECT doc_id, {_duck_shingles(3)} AS s FROM (
        SELECT doc_id, {_DUCK_TOK} AS w FROM documents{where}
      ) WHERE len(w) >= 3
    )
  )
),
{name}_bands AS (
  SELECT doc_id, band,
         md5(array_to_string(list_slice(sig, band * {_R} + 1, band * {_R} + {_R}), ',')) AS band_key
  FROM {name}, (SELECT unnest(range(0, {_B})) AS band)
)"""


# Shared LSH CTE chain (sig + bands + self-join candidate pairs): reused
# verbatim by d03 (pair verification) and d06/d09 (connected-component
# clustering in operators/pipeline.py) so all stay bit-identical to the
# Spark side. Exposed CTE names: `sig` (doc_id, sig, s) and `cand`.
DUCK_LSH_CTES = (
    duck_lsh_side_ctes("sig")
    + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig_bands a JOIN sig_bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""
)

# The verified CTE appended to the LSH chain: THE near-dup pair relation
# (d03 publishes it; d20's source matrix and d23's triangle census
# aggregate it). One definition so the verify formula cannot drift.
DUCK_VERIFIED_CTES = (
    DUCK_LSH_CTES
    + f""",
verified AS (
  SELECT doc_a, doc_b, jaccard FROM (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
             / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
    FROM cand c
    JOIN sig x ON x.doc_id = c.doc_a
    JOIN sig y ON y.doc_id = c.doc_b
  ) WHERE jaccard >= {_JACCARD_THRESHOLD}
)"""
)


_D03_ORACLE = f"""
WITH {DUCK_VERIFIED_CTES}
SELECT doc_a, doc_b, jaccard
FROM verified
ORDER BY doc_a, doc_b
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig, s): K-permutation MinHash signature + distinct shingle
    set per document. Pure map-side array math — no shuffle. Caller decides
    persistence (the md5-heavy subtree should be computed once when the
    result feeds multiple branches)."""
    # Unrolled: one array_min per permutation with the (a_i, b_i) constants
    # inlined as scalars. The indexed form element_at(array(...), i) re-built
    # the 24-literal array on every inner evaluation (~1700x per doc) and was
    # 10x slower; constant-folding only happens with scalar literals here.
    sig_expr = "array(" + ", ".join(
        f"array_min(transform(hs, h -> ({_A[i]}L * h + {_B_CONST[i]}L) % {_MERSENNE}L))"
        for i in range(_K)
    ) + ")"
    return (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") >= 3)
        .withColumn("s", F.expr(spark_shingles_sql("w", 3)))
        .withColumn("hs", F.expr(f"transform(s, x -> {_SPARK_H28})"))
        .select("doc_id", F.expr(sig_expr).alias("sig"), "s")
    )


def lsh_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): explode each signature into B band keys.
    The band_key is the shuffle key downstream — the ONLY shuffle in LSH."""
    return sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(",", F.expr(f"slice(sig, band * {_R} + 1, {_R})")).cast("binary")
        ).alias("band_key"),
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b) with doc_a < doc_b: docs sharing any band key. The
    self-join groups by (band, band_key); bucket sizes stay bounded when R
    is tuned to the corpus, so the pair blowup never sees the full corpus."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verified_pairs(sig: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard): LSH candidates exact-verified at the shared
    threshold — the Spark twin of DUCK_VERIFIED_CTES' `verified`. The
    caller should keep `sig` cached: it feeds four branches (band sides
    a/b, verify sides x/y)."""
    cand = lsh_candidate_pairs(lsh_bands(sig))
    x = sig.select(F.col("doc_id").alias("xid"), F.col("s").alias("xs"))
    y = sig.select(F.col("doc_id").alias("yid"), F.col("s").alias("ys"))
    inter = F.size(F.array_intersect(F.col("xs"), F.col("ys")))
    jac = inter.cast("double") / (F.size("xs") + F.size("ys") - inter)
    return (
        cand.join(x, F.col("doc_a") == F.col("xid"))
        .join(y, F.col("doc_b") == F.col("yid"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


@register("d03_minhash_lsh_pairs", oracle=_D03_ORACLE)
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    # persist: without it Spark recomputes the md5-heavy signature subtree
    # once per branch — 4x the dominant cost. At cluster scale this is
    # exactly where you'd checkpoint/materialize the signature table.
    sig = minhash_signatures(docs).transform(keep_cached)
    return verified_pairs(sig).orderBy("doc_a", "doc_b")


# ---- d04: SimHash signatures + duplicate buckets ---------------------------
# 48-bit SimHash over tokens: bit j of sig = 1 iff sum over distinct tokens
# of (+1 if bit j of md5int(token) else -1) > 0. Map-side per doc; exact
# integer arithmetic → oracle-identical.

_BITS = 48


def _duck_simhash() -> str:
    hashes = (
        "list_transform(list_distinct(w), x -> "
        "CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))"
    )
    return (
        f"list_aggregate(list_transform(range(0, {_BITS}), j -> "
        f"CASE WHEN list_sum(list_transform(h, v -> CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN (1::BIGINT << j) ELSE 0 END), 'sum')"
    ), hashes


_D04_HASHES = (
    "list_transform(list_distinct(w), x -> "
    "CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))"
)

# Shared CTE chain (tok -> token hashes -> 48-bit simhash signature):
# reused by d04 (exact-bucket dedup) and d07 (Hamming-ball near-dup pairs
# in operators/pipeline.py).
DUCK_SIMHASH_CTES = f"""tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
hashed AS (
  SELECT doc_id, {_D04_HASHES} AS h FROM tok WHERE len(w) > 0
),
sigs AS (
  SELECT doc_id,
         -- DuckDB's list_aggregate(..., 'sum') yields HUGEINT which the
         -- harness canonicalizes as float64; pin to BIGINT so the dtype
         -- matches Spark's int64 simhash.
         CAST(list_aggregate(list_transform(range(0, {_BITS}), j ->
           CASE WHEN list_sum(list_transform(h, v ->
                  CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
         ), 'sum') AS BIGINT) AS simhash
  FROM hashed
)"""

_D04_ORACLE = f"""
WITH {DUCK_SIMHASH_CTES}
SELECT simhash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
FROM sigs
GROUP BY simhash
ORDER BY keep_doc_id
"""


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 48-bit SimHash per document — map-side only."""
    h = SPARK_MD5INT.format(x="x")
    sig_expr = (
        f"aggregate(sequence(0, {_BITS - 1}), CAST(0 AS BIGINT), (acc, j) -> acc + "
        f"CASE WHEN aggregate(h, 0, (a, v) -> a + CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"
    )
    return (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") > 0)
        .withColumn("h", F.expr(f"transform(array_distinct(w), x -> {h})"))
        .select("doc_id", F.expr(sig_expr).alias("simhash"))
    )


@register("d04_simhash_buckets", oracle=_D04_ORACLE)
def d04_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        simhash_signatures(docs)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("keep_doc_id")
    )


# ---- d05: embedding-cosine near-dup pairs (LSH-bucketed) -------------------
# The embedding-space analog of d03: random-hyperplane LSH buckets bound the
# candidate set (map-side signature, one shuffle on bucket), then exact
# cosine verifies candidates only. At 100 TB you'd raise the plane count so
# buckets stay ~constant-size; the O(n^2)-within-bucket verify never sees
# the full corpus. Planes/bucketing shared with s02 (operators/similarity.py)
# so both pipelines stay oracle-identical.

_COSINE_NEARDUP_THRESHOLD = 0.4  # synthetic corpus: max off-diagonal ~0.51


# Corpus-adaptive bucket widening (the d13 move, shared rationale there):
# 2^4 hyperplane buckets are quadratic-in-N once the corpus outgrows the
# reference size; extra sign-word bits keep E[bucket size] constant. 0
# extra bits at/below the reference corpus — plans and results unchanged
# at the driver scales.
_D05_REF_N = 2000

from dbt_osmosis_spark.operators.similarity import ADAPTIVE_SUB_SQL as _ASUB  # noqa: E402


def _d05_parts():
    from dbt_osmosis_spark.operators.similarity import (
        _DIM,
        _DUCK_BUCKET,
        _DUCK_DOT,
        _DUCK_NORM2,
        _DUCK_SIGNWORD,
        _SPARK_BUCKET,
        _SPARK_DOT,
        _SPARK_NORM2,
        _SPARK_SIGNWORD,
    )

    return (
        _DIM,
        _DUCK_BUCKET,
        _DUCK_DOT,
        _DUCK_NORM2,
        _SPARK_BUCKET,
        _SPARK_DOT,
        _SPARK_NORM2,
        _DUCK_SIGNWORD,
        _SPARK_SIGNWORD,
    )


def _d05_oracle() -> str:
    from dbt_osmosis_spark.operators.similarity import (
        ADAPTIVE_SUB_SQL as _asub,
        adaptive_xbits_agg_sql as _ax,
    )

    dim, duck_bucket, duck_dot, duck_norm2, _sb, _sd, _sn, duck_sw, _ssw = _d05_parts()
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cnt AS (
  SELECT {_ax(_D05_REF_N)} AS xbits
  FROM vecs
),
bucketed AS (
  SELECT vec_id, v, {duck_bucket} AS bucket,
         {_asub.format(w=duck_sw.format(a="v", base=0), xbits="(SELECT xbits FROM cnt)")} AS sub
  FROM vecs
),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.v AS va, b.v AS vb
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.sub = b.sub AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       {duck_dot.format(a="va", b="vb", n=dim)}
         / (sqrt({duck_norm2.format(a="va")}) * sqrt({duck_norm2.format(a="vb")})) AS cosine
FROM cand
WHERE {duck_dot.format(a="va", b="vb", n=dim)}
        / (sqrt({duck_norm2.format(a="va")}) * sqrt({duck_norm2.format(a="vb")}))
      >= {_COSINE_NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


@register("d05_embedding_neardup", oracle=_d05_oracle())
def d05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _dim, _db, _dd, _dn, spark_bucket, spark_dot, spark_norm2, _dsw, spark_sw = _d05_parts()
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    from dbt_osmosis_spark.operators.similarity import adaptive_xbits_agg_sql

    xbits = emb.agg(F.expr(adaptive_xbits_agg_sql(_D05_REF_N)).alias("xbits"))
    bucketed = (
        emb.select(
            "vec_id",
            "v",
            F.expr(spark_bucket).alias("bucket"),
            F.expr(spark_sw.format(a="v", base=0)).alias("w0"),
        )
        .crossJoin(F.broadcast(xbits))
        .select(
            "vec_id",
            "v",
            "bucket",
            F.expr(_ASUB.format(w="w0", xbits="xbits")).alias("sub"),
        )
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("bucket").alias("ba"), F.col("sub").alias("sa"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("bucket").alias("bb"), F.col("sub").alias("sb"),
    )
    cosine = F.expr(spark_dot.format(a="va", b="vb")) / (
        F.sqrt(F.expr(spark_norm2.format(a="va"))) * F.sqrt(F.expr(spark_norm2.format(a="vb")))
    )
    return (
        a.join(
            b,
            (F.col("ba") == F.col("bb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= _COSINE_NEARDUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


# ---- d08: asymmetric containment near-dup pairs ----------------------------
# Containment(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| over DISTINCT 4-gram
# shingles: catches a document EMBEDDED in a larger one, which symmetric
# Jaccard misses (|A∪B| is dominated by the big doc). Directional pairs.
# Same inverted-index shape as d02 — at scale this runs on LSH candidates,
# not bare (see module docstring); integer count / integer count keeps the
# ratio engine-exact.

_CONTAINMENT_THRESHOLD = 0.9

_D08_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest({_duck_shingles(4)}) AS shingle
  FROM tok WHERE len(w) >= 4
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       CAST(p.n_common AS DOUBLE) / sa.n AS containment
FROM pair_common p
JOIN sizes sa ON sa.doc_id = p.doc_a
WHERE CAST(p.n_common AS DOUBLE) / sa.n >= {_CONTAINMENT_THRESHOLD}
ORDER BY doc_a, doc_b
"""


@register("d08_containment_pairs", oracle=_D08_ORACLE)
def d08_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sh = (
        spread(docs).withColumn("w", tokens())
        .filter(F.size("w") >= 4)
        .select("doc_id", F.explode(F.expr(spark_shingles_sql("w", 4))).alias("shingle"))
        .distinct()
    ).transform(keep_cached)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    containment = F.col("n_common").cast("double") / F.col("sa.n")
    return (
        pair_common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .select("doc_a", "doc_b", containment.alias("containment"))
        .filter(F.col("containment") >= _CONTAINMENT_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


# ---- d14: dedup-sketch evaluation (precision/recall of LSH candidates) -----
# s12's sibling for the dedup family: at 100 TB you tune (K, B, R) — the
# MinHash permutations and banding — from MEASURED precision/recall, not
# folklore. One plan: exact truth pairs (d02's Jaccard >= t, the
# quadratic verify you only ever run on an eval SAMPLE — document-level
# eval is tiny next to the corpus), LSH band candidates (d03's pre-verify
# pair set), and their intersection. precision = hits/candidates (how
# much verify work the bands waste), recall = hits/truth (what the bands
# miss — pairs sharing no band, the S-curve's left tail). All counts are
# exact integers; the two ratios are single IEEE divisions — drift-free
# oracle. Shares minhash_signatures/lsh bands/duck_lsh_side_ctes with
# d03/d06/d09/d11, so the formulas cannot diverge from the operators
# being evaluated. Measured at sf0.01: n_true=25, n_cand=25, n_hit=25 —
# precision 1.0, recall 1.0: (K=24, B=8, R=3) is exactly tuned for this
# corpus's near-verbatim duplicates, and now that is a certificate, not
# an assumption.

_D14_ORACLE = f"""
WITH {DUCK_LSH_CTES},
sh2 AS (SELECT doc_id, unnest(s) AS shingle FROM sig),
sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sig),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truep AS (
  SELECT p.doc_a, p.doc_b
  FROM pair_common p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common)
        >= {_JACCARD_THRESHOLD}
),
hits AS (
  SELECT c.doc_a, c.doc_b FROM cand c
  JOIN truep t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
),
counts AS (
  SELECT (SELECT COUNT(*) FROM truep) AS n_true,
         (SELECT COUNT(*) FROM cand) AS n_cand,
         (SELECT COUNT(*) FROM hits) AS n_hit
)
SELECT CAST(n_true AS BIGINT) AS n_true,
       CAST(n_cand AS BIGINT) AS n_cand,
       CAST(n_hit AS BIGINT) AS n_hit,
       CASE WHEN n_cand = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(n_hit AS DOUBLE) / n_cand END AS precision,
       CASE WHEN n_true = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(n_hit AS DOUBLE) / n_true END AS recall
FROM counts
"""


@register("d14_dedup_eval", oracle=_D14_ORACLE)
def d14_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs).transform(keep_cached)
    cand = lsh_candidate_pairs(lsh_bands(sig))
    sh = sig.select("doc_id", F.explode("s").alias("shingle"))
    sizes = sig.select("doc_id", F.size("s").cast("bigint").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    truep = (
        pair_common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    hits = cand.join(truep, ["doc_a", "doc_b"])
    n_true = truep.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
    n_hit = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    return (
        n_true.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.when(F.col("n_cand") == 0, F.lit(0.0))
            .otherwise(F.col("n_hit").cast("double") / F.col("n_cand"))
            .alias("precision"),
            F.when(F.col("n_true") == 0, F.lit(0.0))
            .otherwise(F.col("n_hit").cast("double") / F.col("n_true"))
            .alias("recall"),
        )
    )


# ---- d15: exact-substring repeated-span coverage ----------------------------
# The suffix-array exact-substring dedup signal (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better",
# arXiv:2107.06499) re-expressed for a shuffle engine: instead of one
# global suffix array (which needs a machine-sized sort over every byte),
# slide a k-token window with stride 1, hash each window to 8 bytes
# map-side, and call a window "repeated" when its hash occurs >= 2 times
# across ALL (doc, pos) sites — within-doc repeats count, exactly like the
# suffix-array criterion. The per-doc fraction of token POSITIONS covered
# by the union of repeated windows (overlaps merged via DISTINCT position)
# is the actionable number: docs above a cutoff get their spans cut or are
# dropped. Differs from d10 (shared distinct-shingle RATE) by measuring
# positional coverage — 40 repeated windows stacked on one span and 40
# spread across the doc score identically in d10 but very differently
# here.
#
# Scale shape: windows never materialize their strings past the map stage
# (the 60-bit md5 shuffles, ~8 bytes/site regardless of k); one shuffle
# keyed on the hash builds the occurrence counts; the coverage explode is
# bounded by k x repeated_sites. At 100 TB with k=50 this is the
# practical substitute for a suffix array — the known miss is a repeated
# span shorter than k, the known false-positive rate is the md5 collision
# rate (~2^-60 per pair). Reference analog: none (north-star dedup
# family; sibling of d10's rate and d09's keep-pipeline).

_D15_K = 8

_D15_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOK} AS w FROM documents
),
base AS (
  SELECT doc_id, len(w) AS n_tokens, w FROM tok WHERE len(w) >= {_D15_K}
),
pos AS (
  SELECT doc_id, n_tokens, w,
         unnest(range(1, n_tokens - {_D15_K} + 2)) AS pos
  FROM base
),
win AS (
  SELECT doc_id, n_tokens, pos,
         CAST('0x' || substr(md5(array_to_string(w[pos:pos + {_D15_K} - 1], ' ')), 1, 15)
           AS BIGINT) AS h
  FROM pos
),
counts AS (
  SELECT h, COUNT(*) AS cnt FROM win GROUP BY h
),
rep AS (
  SELECT w.doc_id, w.pos FROM win w JOIN counts c ON w.h = c.h WHERE c.cnt >= 2
),
cov AS (
  SELECT doc_id, COUNT(DISTINCT p) AS covered
  FROM (SELECT doc_id, unnest(range(pos, pos + {_D15_K})) AS p FROM rep)
  GROUP BY doc_id
),
perdoc AS (
  SELECT doc_id, n_tokens, COUNT(*) AS n_windows
  FROM win GROUP BY doc_id, n_tokens
),
repc AS (
  SELECT doc_id, COUNT(*) AS n_rep FROM rep GROUP BY doc_id
)
SELECT p.doc_id AS doc_id,
       CAST(p.n_tokens AS INT) AS n_tokens,
       CAST(p.n_windows AS INT) AS n_windows,
       CAST(COALESCE(r.n_rep, 0) AS INT) AS n_repeated,
       CAST(COALESCE(c.covered, 0) AS INT) AS covered_positions,
       CAST(COALESCE(c.covered, 0) AS DOUBLE) / p.n_tokens AS coverage_rate
FROM perdoc p
LEFT JOIN repc r ON p.doc_id = r.doc_id
LEFT JOIN cov c ON p.doc_id = c.doc_id
ORDER BY doc_id
"""


@register("d15_repeated_span_coverage", oracle=_D15_ORACLE)
def d15_repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _D15_K
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    win = (
        docs.withColumn("w", tokens())
        .filter(F.size("w") >= k)
        .select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {k} + 1),"
                    f" i -> struct(i AS pos, {SPARK_MD5INT.format(x=f'concat_ws(chr(32), slice(w, i, {k}))')} AS h))"
                )
            ).alias("s"),
        )
        .select("doc_id", "n_tokens", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
        .transform(keep_cached)
    )
    counts = win.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    rep = (
        win.join(counts, "h")
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "pos")
        .transform(keep_cached)
    )
    cov = (
        rep.select("doc_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("p"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    perdoc = win.groupBy("doc_id", "n_tokens").agg(F.count(F.lit(1)).alias("n_windows"))
    repc = rep.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_rep"))
    return (
        perdoc.join(repc, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("n_windows").cast("int").alias("n_windows"),
            F.coalesce("n_rep", F.lit(0)).cast("int").alias("n_repeated"),
            F.coalesce("covered", F.lit(0)).cast("int").alias("covered_positions"),
            (
                F.coalesce("covered", F.lit(0)).cast("double") / F.col("n_tokens")
            ).alias("coverage_rate"),
        )
        .orderBy("doc_id")
    )
