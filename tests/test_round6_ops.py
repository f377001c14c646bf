"""Behavioral tests for the round-6 operators (beyond oracle parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all

load_all()


def test_p30_keeps_the_best_quality_member_per_cluster(spark, sf_dir):
    """Per near-dup cluster: exactly one kept doc, it carries the cluster's
    max quality score, and the keep set genuinely differs from d09's
    min-id rule somewhere (otherwise the quality rule is vacuous)."""
    kept = QUERIES["p30_quality_keep"](spark, sf_dir).collect()
    d09 = {r.doc_id for r in QUERIES["d09_dedup_keep"](spark, sf_dir).collect()}
    p30_ids = {r.doc_id for r in kept}
    assert len(p30_ids) == len(kept)  # one representative per cluster
    assert len(p30_ids) == len(d09)  # same cluster count, different rule
    assert p30_ids != d09  # the quality rule changed at least one choice
    # every kept doc's quality must dominate its cluster: recompute scores
    # and components via the registered building blocks
    from dbt_osmosis_spark.operators.pipeline import lsh_components
    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    by_comp = {}
    for r in lsh_components(docs).collect():
        by_comp.setdefault(r.component, []).append(r.id)
    q = {
        r.doc_id: r.quality_score
        for r in QUERIES["t02_quality_score"](spark, sf_dir).collect()
    }
    kept_by_id = {r.doc_id: r for r in kept}
    for comp, members in by_comp.items():
        chosen = [m for m in members if m in kept_by_id]
        assert len(chosen) == 1, (comp, chosen)
        best = max(members, key=lambda m: (q[m], -m))
        assert chosen[0] == best, (comp, chosen[0], best)
        assert kept_by_id[chosen[0]].cluster_size == len(members)


def test_m11_exact_payload_dups_fully_match(spark, sf_dir):
    """Videos with identical payloads must match on EVERY sampled frame:
    their n_frames_matched equals their frame count, and every reported
    pair's vote is bounded by the max frame count."""
    from dbt_osmosis_spark.operators.multimodal import _MAX_FRAMES
    from dbt_osmosis_spark.sources.parquet import read_parquet

    pairs = {
        (r.doc_a, r.doc_b): r.n_frames_matched
        for r in QUERIES["m11_video_neardup"](spark, sf_dir).collect()
    }
    assert pairs, "no near-dup videos found — vacuous"
    assert all(1 <= v <= _MAX_FRAMES for v in pairs.values())
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h"), "n_chars"
    )
    rows = docs.collect()
    by_h = {}
    for r in rows:
        by_h.setdefault(r.h, []).append(r)
    for h, members in by_h.items():
        # exact-payload duplicates (when the corpus has them) must fully match
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda r: r.doc_id)
        nf = min(members[0].n_chars // 64, 4)
        if nf < 2:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                key = (members[i].doc_id, members[j].doc_id)
                assert pairs.get(key) == nf, (key, pairs.get(key), nf)

    # ground-truth replay: recompute the frame phashes in plain Python for
    # the first reported pair and confirm the vote count
    texts = {
        r.doc_id: r.text
        for r in read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def phashes(text: str) -> list[int]:
        data = text.encode()
        out = []
        for i in range(min(len(data) // 64, 4)):
            fb = data[i * 64 : i * 64 + 64]
            px = [fb[(j * len(fb)) // 60] for j in range(60)]
            mean = sum(px) / 60.0
            out.append(sum(1 << j for j, v in enumerate(px) if v > mean))
        return out

    (da, db), votes = next(iter(sorted(pairs.items())))
    ha, hb = phashes(texts[da]), phashes(texts[db])
    want = sum(1 for x, y in zip(ha, hb) if x == y)
    assert votes == want, (da, db, votes, want)


def test_p31_hygiene_invariants(spark, sf_dir):
    """The composed pipeline's kept set must (a) exclude the held-out
    benchmark split, (b) pass every Gopher rule, (c) contain no
    contaminated doc, and (d) hold one representative per cluster."""
    kept = QUERIES["p31_decontaminated_corpus"](spark, sf_dir).collect()
    assert kept
    ids = {r.doc_id for r in kept}
    assert len(ids) == len(kept)
    assert all(d % 10 != 0 for d in ids)
    gopher = {
        r.doc_id: r.passes for r in QUERIES["t12_gopher_rules"](spark, sf_dir).collect()
    }
    assert all(gopher.get(d) == 1 for d in ids)
    contaminated = {
        r.doc_id
        for r in QUERIES["d17_fuzzy_decontamination"](spark, sf_dir).collect()
    }
    assert contaminated, "no contamination found — decontamination is vacuous"
    assert not (ids & contaminated)
    # the pipeline is strictly tighter than the Gopher gate alone
    n_gated = sum(1 for d, p in gopher.items() if p == 1 and d % 10 != 0)
    assert len(ids) < n_gated


def test_s18_matches_s15_exactly(spark, sf_dir):
    """The persisted LSH index is a reorganized copy of s15's bucketed
    frame, so serving from it must reproduce s15's batch results row for
    row (same probes, same adaptive sub width, same tie-break)."""
    a = [tuple(r) for r in QUERIES["s15_batched_lsh_topk"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["s18_lsh_index_serve"](spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_s19_respects_the_label_predicate(spark, sf_dir):
    """Filtered ANN: every returned neighbor carries the query's own
    label, ranks are 1..k contiguous per query, and the result differs
    from the unfiltered probe (the predicate actually bit somewhere)."""
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = QUERIES["s19_filtered_ann"](spark, sf_dir).collect()
    assert rows
    labels = {
        r.vec_id: r.label
        for r in read_parquet(spark, f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 8)
        .select("vec_id", "label")
        .collect()
    }
    by_q = {}
    for r in rows:
        assert r.label == labels[r.qid], (r.qid, r.label, labels[r.qid])
        assert r.vec_id != r.qid
        by_q.setdefault(r.qid, []).append(r.rnk)
    for qid, rnks in by_q.items():
        assert rnks == list(range(1, len(rnks) + 1)), (qid, rnks)


def test_q55_concurrency_is_consistent_with_sessionization(spark, sf_dir):
    """The sweep's per-hour start counts must total q15's session count,
    and every max_concurrent is >= 1 (the starting session itself) and
    <= the number of users (a user's sessions never overlap by
    construction of the 30-min gap rule)."""
    rows = QUERIES["q55_concurrent_intervals"](spark, sf_dir).collect()
    q15 = QUERIES["q15_sessionization"](spark, sf_dir).collect()[0]
    assert sum(r.n_starts for r in rows) == q15.n_sessions
    assert all(r.max_concurrent >= 1 for r in rows)
    assert all(r.max_concurrent <= q15.n_users for r in rows)


def test_q56_accrual_bounds(spark, sf_dir):
    """Distinct accrual: n_types is within [1, |event types|]; reach_ts
    is never before first_ts; users who never reach the threshold have a
    NULL reach_ts and n_types below it."""
    from dbt_osmosis_spark.operators.relational_ext3 import _Q56_REACH
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = QUERIES["q56_distinct_accrual"](spark, sf_dir).collect()
    n_types_total = (
        read_parquet(spark, f"{sf_dir}/events.parquet").select("event_type").distinct().count()
    )
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= n_types_total
        if r.reach_ts is not None:
            assert r.n_types >= _Q56_REACH
            assert r.reach_ts >= r.first_ts
        else:
            assert r.n_types < _Q56_REACH


def test_s20_incremental_append_matches_one_shot_build(spark, sf_dir):
    """Appending the second half of the corpus into the index must yield
    exactly the one-shot s17 build's serve results — cell assignment is
    batch-invariant under the frozen quantizer."""
    a = [tuple(r) for r in QUERIES["s17_ivf_index_serve"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["s20_ivf_incremental_serve"](spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_p32_report_is_batch_boundary_invariant(spark, sf_dir):
    """The merged report must not depend on HOW the corpus was batched:
    a 3-way doc_id%3 split merges to the same rows as the registered
    2-way split, and as a single-batch 'merge'."""
    from dbt_osmosis_spark.operators.pipeline_ext2 import merge_stats, partial_stats
    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    registered = {
        tuple(r) for r in QUERIES["p32_incremental_stats"](spark, sf_dir).collect()
    }
    three = [partial_stats(docs.filter(F.col("doc_id") % 3 == i)) for i in range(3)]
    u = three[0].unionByName(three[1]).unionByName(three[2])
    assert {tuple(r) for r in merge_stats(u).collect()} == registered
    single = {tuple(r) for r in merge_stats(partial_stats(docs)).collect()}
    assert single == registered


def test_p33_skew_report_invariants(spark, sf_dir):
    """Row totals reconcile with the raw table, the reported hot key is
    genuinely maximal, and max/mean ratio is >= 1 by construction."""
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = QUERIES["p33_skew_report"](spark, sf_dir).collect()
    e = read_parquet(spark, f"{sf_dir}/events.parquet")
    assert sum(r.n_rows for r in rows) == e.count()
    for r in rows:
        assert r.skew_ratio >= 1.0
        top_n = (
            e.filter(
                (F.col("event_type") == r.event_type)
                & (F.col("user_id") == r.top_user_id)
            ).count()
        )
        assert top_n == r.max_key_rows


def test_p34_salt_does_not_change_the_answer(spark, sf_dir):
    """The salted two-phase result must equal the direct single-window
    computation (the salt shapes intermediates only), and per-bucket
    pre-ranking must genuinely bound the candidate set."""
    from dbt_osmosis_spark.operators.pipeline_ext2 import _P34_SALTS, _P34_TOPK
    from dbt_osmosis_spark.operators.text import tokens
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread
    from pyspark.sql.window import Window as W

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    counts = (
        spread(docs)
        .select("lang", F.explode(tokens()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    win = W.partitionBy("lang").orderBy(F.desc("n"), "word")
    direct = [
        tuple(r)
        for r in counts.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= _P34_TOPK)
        .select("lang", "rnk", "word", "n")
        .orderBy("lang", "rnk")
        .collect()
    ]
    got = [tuple(r) for r in QUERIES["p34_salted_topk"](spark, sf_dir).collect()]
    assert got == direct
    n_langs = docs.select("lang").distinct().count()
    assert len(got) == n_langs * _P34_TOPK
    # each word maps to exactly one salt bucket (the correctness premise);
    # the candidate frame is bounded by langs x salts x k
    salt = F.pmod(
        F.conv(F.substring(F.md5("word"), 1, 6), 16, 10).cast("long"), F.lit(_P34_SALTS)
    )
    per_word = counts.select("word", salt.alias("s")).groupBy("word").agg(
        F.countDistinct("s").alias("ns")
    )
    assert per_word.filter(F.col("ns") != 1).count() == 0


def test_s21_recall_curve_is_monotone_and_bounded(spark, sf_dir):
    """More probes can only add candidates, so recall@k must be
    non-decreasing in nprobe and within (0, 1]; the full-probe point must
    dominate the single-probe point strictly somewhere on real data."""
    rows = QUERIES["s21_ivf_probe_sweep"](spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == [1, 2, 3, 4]
    rec = [r.recall_at_k for r in rows]
    assert all(0 < r <= 1 for r in rec)
    assert all(a <= b for a, b in zip(rec, rec[1:]))
    assert rec[-1] > rec[0]
