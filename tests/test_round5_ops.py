"""Round-5 operators: winnowing (d16), token-budget selection (p27),
Zipf slope (t16), phash Hamming pairs (m09) — semantic properties beyond
the oracle-parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all

load_all()


def test_winnowing_guarantee_shared_run_detected(spark):
    """MOSS guarantee: two docs sharing a run of >= w + k - 1 tokens must
    share at least one fingerprint (and unrelated docs share none)."""
    from dbt_osmosis_spark.operators.dedup_ext import (
        _K,
        _SPARK_FINGERPRINTS,
        _SPARK_GRAM_HASHES,
        _W,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= w+k-1
    assert len(shared.split()) >= _W + _K - 1
    rows = [
        (1, f"one two three {shared} four five"),
        (2, f"{shared} six seven eight nine ten"),
        (3, "cat dog bird fish lion tiger bear wolf fox deer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = (
        df.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("w"))
        .select("doc_id", F.expr(_SPARK_GRAM_HASHES).alias("h"))
        .select("doc_id", F.explode(F.expr(_SPARK_FINGERPRINTS)).alias("fp"))
    )
    sets = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
    }
    assert sets[1] & sets[2], "shared run produced no shared fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # winnowing keeps ~2/(w+1) of positions — fingerprints must be sparse
    n_pos = len(rows[2][1].split()) - _K + 1
    assert len(sets[3]) < n_pos


def test_token_budget_selection_properties(spark, sf_dir):
    """Budget respected; selection is greedy by score bin (every kept doc's
    bin >= every dropped doc's bin, except inside the boundary bin); the
    boundary cut is tight (next doc in order would break the budget)."""
    rows = QUERIES["p27_token_budget_select"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_tok for r in rows)
    budget = total * 3 // 10
    kept = [r for r in rows if r.kept == 1]
    dropped = [r for r in rows if r.kept == 0]
    kept_tok = sum(r.n_tok for r in kept)
    assert kept_tok <= budget
    if dropped:
        boundary = min(r.score_bin for r in kept) if kept else -1
        assert all(r.score_bin <= boundary for r in dropped)
        # tight IN CUMULATIVE ORDER: the FIRST boundary-bin reject (by the
        # md5-key order the greedy fills in) must overflow the budget —
        # NOT min(rejects): a small doc late in key order is legitimately
        # rejected once the cumulative total has passed the cut
        import hashlib

        def key(doc_id):
            return hashlib.md5(str(doc_id).encode()).hexdigest()[:15]

        b_rejects = sorted(
            (r for r in dropped if r.score_bin == boundary),
            key=lambda r: (key(r.doc_id), r.doc_id),
        )
        if b_rejects:
            first = b_rejects[0]
            kept_before = sum(
                r.n_tok
                for r in kept
                if r.score_bin > boundary
                or (key(r.doc_id), r.doc_id) < (key(first.doc_id), first.doc_id)
            )
            assert kept_before + first.n_tok > budget


def test_zipf_slope_negative_and_complete(spark, sf_dir):
    rows = QUERIES["t16_zipf_slope"](spark, sf_dir).collect()
    assert rows
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert r.zipf_slope < 0, f"{r.source}: rank-frequency slope must fall"
        assert r.n_words >= 2


def test_phash_pairs_complete_vs_bruteforce(spark, sf_dir):
    """Pigeonhole completeness: with 10 bands and tau=8, the banded join
    must find EVERY pair within Hamming distance 8 — verified against the
    brute-force all-pairs join on the same hashes."""
    from dbt_osmosis_spark.operators.multimodal import (
        _M09_TAU,
        attach_fake_payloads,
        phash_payloads,
    )
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["m09_phash_neardup_pairs"](spark, sf_dir).collect()
    }
    hashed = phash_payloads(
        attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    )
    a = hashed.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa"))
    b = hashed.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb"))
    brute = {
        (r.doc_a, r.doc_b): r.hamming
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(pa ^ pb)").cast("int"))
        .filter(F.col("hamming") <= _M09_TAU)
        .collect()
    }
    assert got == brute


def test_mmr_diversity_binds(spark, sf_dir):
    """MMR must not equal plain relevance top-k (the diversity term has to
    reorder at least one pick on this corpus) and every selection after the
    seed must have score <= the seed's (greedy marginal gains shrink)."""
    rows = QUERIES["s14_mmr_rerank"](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    by_rank = [r.vec_id for r in rows]
    topk_by_rel = [
        r.vec_id
        for r in sorted(rows, key=lambda r: (-r.qrel, r.vec_id))
    ]
    assert by_rank != topk_by_rel, "diversity term never changed the order"
    assert rows[0].score == max(r.score for r in rows)


def test_split_leakage_consistent_with_d03_pairs(spark, sf_dir):
    """p28's report must equal the leakage computed independently from
    d03's verified near-dup pairs plus p21's split assignment."""
    from collections import defaultdict

    pairs = [(r.doc_a, r.doc_b) for r in QUERIES["d03_minhash_lsh_pairs"](spark, sf_dir).collect()]
    split = {r.doc_id: r.split for r in QUERIES["p21_train_val_split"](spark, sf_dir).collect()}
    want_pairs = defaultdict(int)
    want_docs = defaultdict(set)
    for a, b in pairs:
        sa, sb = split[a], split[b]
        if sa == sb:
            continue
        key = (min(sa, sb), max(sa, sb))
        want_pairs[key] += 1
        want_docs[key].add(a if sa != "train" else b)
    got = {
        (r.split_lo, r.split_hi): (r.n_pairs, r.n_eval_docs_leaked)
        for r in QUERIES["p28_split_leakage"](spark, sf_dir).collect()
    }
    assert got == {k: (v, len(want_docs[k])) for k, v in want_pairs.items()}


def test_cluster_balanced_sample_properties(spark, sf_dir):
    """p26: singletons always survive (threshold 2^60 keeps every u);
    multi-doc clusters keep at most their size and flatten density —
    kept count per cluster is <= size, and expected ~1."""
    load_all()
    kept = QUERIES["p26_cluster_balanced_sample"](spark, sf_dir).collect()
    comp = QUERIES["d06_dedup_components"](spark, sf_dir).collect()
    multi = {r.component: r.n_docs for r in comp}
    kept_by_comp = {}
    for r in kept:
        kept_by_comp[r.component] = kept_by_comp.get(r.component, 0) + 1
        assert r.cluster_size >= 1
        if r.cluster_size == 1:
            assert r.component not in multi
    # every singleton is kept: kept singletons == total docs - multi members
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_multi_members = sum(multi.values())
    n_singletons_kept = sum(1 for r in kept if r.cluster_size == 1)
    assert n_singletons_kept == total - n_multi_members
    # multi clusters never keep more than their size; at least one cluster
    # actually dropped something (non-vacuous)
    for c, n in multi.items():
        assert kept_by_comp.get(c, 0) <= n
    assert sum(kept_by_comp.get(c, 0) for c in multi) < n_multi_members


def test_ivf_index_roundtrip_matches_s05_and_prunes_partitions(spark, sf_dir, tmp_path):
    """write_ivf_index + query_ivf_index must (a) return exactly what the
    in-plan s05 computes for the same query and (b) prune the scan to the
    probed cell partitions — the serve-side cost model the IVF docstrings
    promise."""
    from dbt_osmosis_spark.operators.similarity_ext import (
        probe_cells,
        query_ivf_index,
        write_ivf_index,
    )
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread

    load_all()
    emb = spread(read_parquet(spark, f"{sf_dir}/embeddings.parquet")).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("v").collect()[0][0]]
    res = query_ivf_index(spark, path, qv, exclude_id=0)
    got = res.collect()
    want = QUERIES["s05_ivf_topk"](spark, sf_dir).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    for g, w in zip(got, want):
        assert abs(g.cosine - w.cosine) < 1e-12

    # partition pruning reached the scan: the cell IN-list is a
    # PartitionFilter, not a post-scan DataFilter
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and any(
        "PartitionFilters" in ln and "cell" in ln.split("PartitionFilters", 1)[1][:120]
        for ln in scan_lines
    ), scan_lines
    # the driver-side probe computation must reproduce the in-plan nprobe
    # expression exactly (same fold order, same tie-break) — this is the
    # contract that makes static pruning equivalent to s05's in-plan filter
    from dbt_osmosis_spark.operators.similarity import _SPARK_PROBE

    in_plan = (
        emb.filter(F.col("vec_id") == 0)
        .selectExpr(f"{_SPARK_PROBE.format(a='v')} AS probe")
        .collect()[0]
        .probe
    )
    assert probe_cells(qv) == list(in_plan)


def test_centroid_outliers_flag_rate_and_extremity(spark, sf_dir):
    """s16: each label flags exactly ceil(n/20) vectors, and the flagged
    set is precisely the farthest tail — no flagged vector may be closer
    to its centroid than an unflagged one of the same label."""
    import math

    load_all()
    rows = QUERIES["s16_centroid_outliers"](spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    assert len(by_label) > 1
    for label, rs in by_label.items():
        n = len(rs)
        flagged = [r for r in rs if r.is_outlier == 1]
        assert len(flagged) == math.ceil(n / 20), (label, n, len(flagged))
        max_in = max(r.dist2 for r in rs if r.is_outlier == 0)
        min_out = min(r.dist2 for r in flagged)
        assert min_out >= max_in
