"""Round-7 operators: funnel (q73), basket lift (q74), PMI collocations
(t23), truncation curve (s27), centroid silhouette (s28), label
propagation (d25), pipeline funnel (p37) — semantic properties and plan
shapes beyond the oracle-parity sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.plans.audit import has_broadcast_join, uses_top_k

load_all()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def build(name):
        return QUERIES[name](spark, sf_dir)

    return build


# ---- q73 funnel ------------------------------------------------------------


def test_q73_funnel_monotone_and_anchored(q):
    rows = {r.step: r for r in q("q73_funnel").collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    n1, n2, n3 = (rows[s].n_users for s in ("1_view", "2_click", "3_purchase"))
    # each step requires the previous step's timestamp — counts can only fall
    assert n1 >= n2 >= n3 >= 0
    assert rows["1_view"].pct_bp == 10000
    for r in rows.values():
        assert 0 <= r.pct_bp <= 10000


def test_q73_funnel_step_ordering_semantics(spark, sf_dir):
    """A user whose only purchase precedes every click must not convert."""
    df = spark.createDataFrame(
        [
            # user 1: view -> click -> purchase (converts)
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 01:00:00", 1, "click"),
            (3, "2024-01-01 02:00:00", 1, "purchase"),
            # user 2: purchase BEFORE any click (must not reach step 3)
            (4, "2024-01-01 00:00:00", 2, "purchase"),
            (5, "2024-01-01 01:00:00", 2, "view"),
            (6, "2024-01-01 02:00:00", 2, "click"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        rows = {r.step: r.n_users for r in QUERIES["q73_funnel"](spark, d).collect()}
    assert rows == {"1_view": 2, "2_click": 2, "3_purchase": 1}


# ---- q74 basket lift -------------------------------------------------------


def test_q74_basket_pairs_canonical_and_supported(q):
    rows = q("q74_basket_lift").collect()
    assert rows, "no co-occurring pairs at this SF"
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_together >= 2
        assert r.lift_bp > 0
    # deterministic top-k ordering
    keys = [(-r.n_together, r.part_a, r.part_b) for r in rows]
    assert keys == sorted(keys)


def test_q74_no_cartesian_and_broadcast_dims(q):
    df = q("q74_basket_lift")
    assert has_broadcast_join(df)
    assert uses_top_k(df)


# ---- t23 PMI collocations --------------------------------------------------


def test_t23_collocations_support_floor_and_order(q):
    rows = q("t23_pmi_collocations").collect()
    assert rows
    from dbt_osmosis_spark.operators.text_ext3 import _T23_MIN_N, _T23_TOPK

    assert len(rows) <= _T23_TOPK
    for r in rows:
        assert r.n_ab >= _T23_MIN_N
        assert r.lift_bp >= 0
    lifts = [(-r.lift_bp, r.a, r.b) for r in rows]
    assert lifts == sorted(lifts)


def test_t23_lift_identity_on_constructed_corpus(spark):
    """'x y' always adjacent and exclusive -> lift = N2 / (c_x * c_y) exactly."""
    import tempfile

    rows = [(i, "x y " * 1 + "filler" + str(i % 7) + " pad" + str(i % 3), "en", "s", 10)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            (r.a, r.b): r
            for r in QUERIES["t23_pmi_collocations"](spark, d).collect()
        }
    xy = out[("x", "y")]
    # every doc contributes bigrams: (x,y), (y, filler), (filler, pad): N2 = 120
    # c_left(x) = 40, c_right(y) = 40 -> lift = 120*40*10000 DIV 1600
    assert xy.n_ab == 40
    assert xy.lift_bp == (40 * 120 * 10000) // (40 * 40)


# ---- s27 truncation curve --------------------------------------------------


def test_s27_truncation_recall_bounds(q):
    rows = q("s27_truncation_curve").collect()
    assert rows
    from dbt_osmosis_spark.operators.similarity_ext3 import (
        _DIM,
        _S27_K,
        _S27_NQ,
    )

    by_q = {}
    for r in rows:
        assert 1 <= r.n_overlap <= _S27_K
        by_q.setdefault(r.qid, {})[r.dim_len] = r.n_overlap
    assert set(by_q) == set(range(_S27_NQ))
    for dims in by_q.values():
        # the full-dimension run IS the truth set
        assert dims[_DIM] == _S27_K


# ---- s28 centroid silhouette -----------------------------------------------


def test_s28_silhouette_range_and_coverage(q, spark, sf_dir):
    rows = q("s28_centroid_silhouette").collect()
    assert rows
    total = 0
    for r in rows:
        assert 0 <= r.mean_s1_bp <= 20000
        assert r.n_vecs > 0
        total += r.n_vecs
    from dbt_osmosis_spark.sources.parquet import read_parquet

    n = read_parquet(spark, f"{sf_dir}/embeddings.parquet").count()
    # >1 label exists at every SF, so every vector has a valid `b`
    assert total == n


# ---- d25 label propagation -------------------------------------------------


def test_d25_lpa_conserves_nodes_and_labels_are_members(q, spark, sf_dir):
    rows = q("d25_label_propagation").collect()
    from dbt_osmosis_spark.operators.caching import keep_cached
    from dbt_osmosis_spark.operators.dedup import minhash_signatures, verified_pairs
    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    vp = verified_pairs(minhash_signatures(docs).transform(keep_cached)).collect()
    nodes = {r.doc_a for r in vp} | {r.doc_b for r in vp}
    if not nodes:
        assert not rows
        return
    assert sum(r.n_members for r in rows) == len(nodes)
    for r in rows:
        assert r.community in nodes  # labels are real doc ids
        assert r.min_member <= r.max_member


def test_d25_splits_a_chain_that_cc_collapses(spark):
    """On a path graph A-B-C-D-E, 3-round LPA with min-tie-break must not
    produce one giant community rooted at an endpoint; CC would return a
    single component. (Checks the operator answers a different question
    than d06.)"""
    import tempfile

    # texts engineered to chain-overlap: consecutive docs share >half their
    # 3-shingles, non-consecutive share few
    texts = []
    words = [f"tok{i}" for i in range(24)]
    for i in range(5):
        seg = words[i * 4 : i * 4 + 12]
        texts.append(" ".join(seg))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = QUERIES["d25_label_propagation"](spark, d).collect()
    if rows:  # edges exist: communities partition the nodes
        seen = sum(r.n_members for r in rows)
        assert seen <= 5
        assert all(r.n_members >= 1 for r in rows)


# ---- p37 pipeline funnel ---------------------------------------------------


def test_p37_funnel_monotone(q):
    rows = {r.stage: r for r in q("p37_pipeline_funnel").collect()}
    order = ["0_raw", "1_length", "2_lang", "3_exact_dedup", "4_decontam"]
    assert set(rows) == set(order)
    counts = [rows[s].n_docs for s in order]
    assert counts == sorted(counts, reverse=True)
    assert rows["0_raw"].pct_bp == 10000
    for r in rows.values():
        assert 0 <= r.pct_bp <= 10000


def test_p37_broadcasts_eval_shingles_no_cartesian(q):
    df = q("p37_pipeline_funnel")
    assert has_broadcast_join(df)


# ---- t24 vocab coverage curve ---------------------------------------------


def test_t24_coverage_monotone_in_vocab_size(q):
    rows = q("t24_vocab_coverage_curve").collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.covered_bp <= 10000
        assert r.covered <= 10**12
        by_src.setdefault(r.source, []).append((r.v_size, r.covered_bp, r.covered))
    for curve in by_src.values():
        curve.sort()
        covs = [c for _, c, _ in curve]
        assert covs == sorted(covs), "coverage must grow with vocab size"


# ---- s29 PQ distortion -----------------------------------------------------


def test_s29_distortion_report_shape(q):
    from dbt_osmosis_spark.operators.similarity import _PQ_K, _PQ_M

    rows = q("s29_pq_distortion").collect()
    assert len(rows) == _PQ_M
    n_vecs = {r.n_vecs for r in rows}
    assert len(n_vecs) == 1  # every subspace encodes every vector
    for r in rows:
        assert 1 <= r.n_codes_used <= _PQ_K
        # hot-code share can't be below the uniform floor
        assert r.top_code_share_bp >= 10000 // _PQ_K
        assert r.mean_qerr_q >= 0


# ---- m13 payload shard packing ---------------------------------------------


def test_m13_shards_partition_corpus_in_order(q, spark, sf_dir):
    from dbt_osmosis_spark.operators.multimodal_ext import _M13_SHARD_BYTES
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = sorted(q("m13_payload_shard_packing").collect(), key=lambda r: r.shard_id)
    assert rows
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    total_docs = docs.count()
    total_bytes = docs.select(
        F.sum(F.octet_length(F.encode(F.col("text"), "UTF-8"))).alias("b")
    ).collect()[0].b
    assert sum(r.n_payloads for r in rows) == total_docs
    assert sum(r.shard_bytes for r in rows) == total_bytes
    # shards hold contiguous, non-overlapping doc-id spans in order
    for a, b in zip(rows, rows[1:]):
        assert a.max_doc < b.min_doc
    # byte budget: a shard exceeds S only via its last payload straddling
    max_payload = docs.select(
        F.max(F.octet_length(F.encode(F.col("text"), "UTF-8"))).alias("m")
    ).collect()[0].m
    for r in rows:
        assert r.shard_bytes <= _M13_SHARD_BYTES + max_payload


# ---- d26 prefix-filter exact join ------------------------------------------


def test_d26_equals_d02_pair_for_pair(q):
    """Prefix filtering is an OPTIMIZATION, not an approximation: the
    candidate prefix join must recover exactly d02's qualifying pairs
    (completeness: any J >= t pair shares an indexed prefix token)."""
    d02 = {(r.doc_a, r.doc_b): r.jaccard for r in q("d02_ngram_jaccard_pairs").collect()}
    d26 = {(r.doc_a, r.doc_b): r.jaccard for r in q("d26_prefix_filter_pairs").collect()}
    assert d26 == d02


# ---- q75 histogram quantile sketch -----------------------------------------


def test_q75_upper_edge_bound(q):
    """The histogram estimate is the upper edge of the bin holding the
    ceil(p*n)-th order statistic, so it can never undershoot the exact
    interpolated percentile; error is bounded by one bin width."""
    rows = q("q75_histogram_quantile_eval").collect()
    assert len(rows) == 9  # 3 flags x 3 percentiles
    for r in rows:
        assert r.est_v >= r.exact_v
        assert 0 <= r.rel_err < 0.10


# ---- q76 z-order layout ----------------------------------------------------


def test_q76_zorder_skips_more_files_than_linear_sort(spark, tmp_path):
    """The point of Z-ordering: for a predicate selective in BOTH
    dimensions, fewer files' (user, hour) bounding boxes intersect the
    query rectangle than under a linear user-sort (whose every file
    spans all 24 hours). Verified from real parquet footers at sf0.01."""
    import glob

    import pyarrow.parquet as pq

    from dbt_osmosis_spark.operators.relational import t as _t
    from dbt_osmosis_spark.operators.relational_ext4 import (
        _Q76_FILES,
        _Q76_H1,
        _Q76_H2,
        _Q76_UMAX,
        _q76_layout_path,
        build_zorder_events,
    )

    sf = "/root/testdata/sf0.01"  # enough users for 2-D selectivity
    build_zorder_events(spark, sf)
    lin = str(tmp_path / "linear")
    ev = _t(spark, sf, "events").withColumn("hr", F.hour("ts").cast("bigint"))
    ev.repartitionByRange(_Q76_FILES, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(lin)

    def files_touched(path):
        touched = total = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            if md.num_rows == 0:
                continue
            umin = umax = hmin = hmax = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                cols = {g.column(i).path_in_schema: g.column(i) for i in range(g.num_columns)}
                us, hs = cols["user_id"].statistics, cols["hr"].statistics
                umin = us.min if umin is None else min(umin, us.min)
                umax = us.max if umax is None else max(umax, us.max)
                hmin = hs.min if hmin is None else min(hmin, hs.min)
                hmax = hs.max if hmax is None else max(hmax, hs.max)
            total += 1
            if umin < _Q76_UMAX and not (hmax < _Q76_H1 or hmin > _Q76_H2):
                touched += 1
        return touched, total

    z_touched, z_total = files_touched(_q76_layout_path(sf))
    l_touched, l_total = files_touched(lin)
    assert z_total >= _Q76_FILES // 2 and l_total >= _Q76_FILES // 2
    # the layouts hold identical data; only the clustering differs
    assert z_touched < l_touched, (z_touched, l_touched)


# ---- q77 capped running balance --------------------------------------------


def test_q77_identity_matches_direct_recurrence(q, spark, sf_dir):
    """B_i = max(0, B_{i-1} + d_i) computed directly in Python per user
    must equal the windowed identity S_i - min(0, min_j S_j) the operator
    uses — for every user, including floor-hit counts."""
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = (
        read_parquet(spark, f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "ts",
            "event_id",
            "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 1e6) AS BIGINT)"
            " WHEN event_type = 'error' THEN -CAST(round(value * 1e6) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END AS d",
        )
        .collect()
    )
    per_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        b, hits = per_user.get(r.user_id, (0, 0))
        nb = b + r.d
        if nb < 0:
            nb, hits = 0, hits + 1
        per_user[r.user_id] = (nb, hits)
    got = {r.user_id: (r.final_balance_u, r.n_floor_hits) for r in q("q77_capped_running_balance").collect()}
    assert got == per_user
    assert all(b >= 0 for b, _ in got.values())


# ---- q78 CUPED A/B ---------------------------------------------------------


def test_q78_cuped_reduces_variance(q, spark, sf_dir):
    """The whole point of CUPED: across users, the adjusted metric's
    variance must not exceed the raw metric's (theta is the OLS argmin).
    Also: adjustment must not change the pooled mean (up to quantization)."""
    import statistics

    from dbt_osmosis_spark.sources.parquet import read_parquet
    from pyspark.sql import functions as FF

    rows = q("q78_cuped_adjusted_ab").collect()
    assert len(rows) == 2 and {r.variant for r in rows} == {0, 1}
    # recompute per-user raw/adjusted values to check the variance claim
    e = read_parquet(spark, f"{sf_dir}/events.parquet")
    bounds = e.agg(
        FF.expr("MIN(unix_micros(ts))").alias("lo_us"),
        FF.expr("MAX(unix_micros(ts))").alias("hi_us"),
    ).selectExpr("(lo_us + hi_us) DIV 2 AS m_us")
    cents = "CAST((SUM(CASE WHEN {cmp} THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END) + 5000) DIV 10000 AS BIGINT)"
    pu = (
        e.crossJoin(FF.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            FF.expr(cents.format(cmp="unix_micros(ts) < m_us")).alias("x"),
            FF.expr(cents.format(cmp="unix_micros(ts) >= m_us")).alias("y"),
        )
        .collect()
    )
    xs = [r.x for r in pu]
    ys = [r.y for r in pu]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    adj = [y - theta * (x - xbar) for x, y in zip(xs, ys)]
    assert statistics.pvariance(adj) <= statistics.pvariance([float(v) for v in ys]) + 1e-9
    assert abs(statistics.fmean(adj) - statistics.fmean([float(v) for v in ys])) < 1e-6


# ---- p38 padding waste curve -----------------------------------------------


def test_p38_waste_monotonicity_and_bounds(q):
    rows = q("p38_padding_waste_curve").collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.waste_bp < 10000
        assert r.n_seqs >= 1
        by_src.setdefault(r.source, []).append((r.seq_len, r.n_seqs))
    for curve in by_src.values():
        curve.sort()
        seqs = [s for _, s in curve]
        # longer sequences can only mean fewer-or-equal chunks
        assert seqs == sorted(seqs, reverse=True)


# ---- s30 embedding health --------------------------------------------------


def test_s30_health_clean_corpus(q, spark, sf_dir):
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = q("s30_embedding_health").collect()
    assert rows
    total = sum(r.n_vecs for r in rows)
    n = read_parquet(spark, f"{sf_dir}/embeddings.parquet").count()
    assert total == n
    for r in rows:
        # the synthetic corpus is clean: the audit must say so
        assert r.n_zero == 0 and r.n_nonfinite == 0 and r.n_wrong_dim == 0
        assert 0 < r.min_norm_q <= r.mean_norm_q <= r.max_norm_q
        assert r.n_dup_vectors >= 0


def test_s30_health_flags_constructed_degenerates(spark, tmp_path):
    """A zero vector, a NaN component, a short vector and a duplicated
    vector must each be counted by the audit."""
    import math

    good = [0.1] * 64
    rows = [
        (0, good, 1), (1, good, 1),            # duplicate pair
        (2, [0.0] * 64, 1),                     # zero norm
        (3, [math.nan] + [0.1] * 63, 1),        # non-finite
        (4, [0.2] * 32, 1),                     # wrong dim
        (5, [0.3] * 64, 2),                     # clean, other label
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path)
    df.write.parquet(f"{d}/embeddings.parquet")
    out = {r.label: r for r in QUERIES["s30_embedding_health"](spark, d).collect()}
    assert out[1].n_dup_vectors == 1
    assert out[1].n_zero == 1
    assert out[1].n_nonfinite == 1
    assert out[1].n_wrong_dim == 1
    assert out[2].n_dup_vectors == 0 and out[2].n_zero == 0


# ---- p39 quality/dup calibration -------------------------------------------


def test_p39_deciles_partition_corpus(q, spark, sf_dir):
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = q("p39_quality_dup_calibration").collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    n = (
        read_parquet(spark, f"{sf_dir}/documents.parquet")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .count()
    )
    assert sum(r.n_docs for r in rows) == n
    # exact-ceil deciles: sizes differ by at most 1
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert 0 <= r.dup_bp <= 10000


# ---- plan-shape pins for the round-7 surface -------------------------------


def test_round7_exchange_budgets(q):
    """Exchange-count ceilings measured at 1x/10x/30x (SCALE.md) — a
    refactor that adds a shuffle should fail here, not at the next scale
    probe."""
    from dbt_osmosis_spark.plans.audit import exchange_count

    budgets = {
        "q73_funnel": 11,
        "q75_histogram_quantile_eval": 8,
        "q77_capped_running_balance": 2,
        "q78_cuped_adjusted_ab": 7,
        "t24_vocab_coverage_curve": 8,
        "s28_centroid_silhouette": 5,
        "s29_pq_distortion": 3,
        "s30_embedding_health": 3,
        "m13_payload_shard_packing": 5,
        "p38_padding_waste_curve": 2,
    }
    for name, budget in budgets.items():
        assert exchange_count(q(name)) <= budget, name


# ---- d27 residual-dup audit -------------------------------------------------


def test_d27_kept_duplication_not_worse_than_full(q):
    rows = {r.corpus: r for r in q("d27_residual_dup_audit").collect()}
    assert set(rows) == {"0_full", "1_kept"}
    full, kept = rows["0_full"], rows["1_kept"]
    assert kept.n_docs <= full.n_docs
    # dedup can only reduce independent-detector duplication
    assert kept.n_dup_groups <= full.n_dup_groups
    assert kept.n_docs_in_dups <= full.n_docs_in_dups


# ---- q79 KMV set algebra ---------------------------------------------------


def test_q79_set_algebra_sanity_and_error_bounds(q):
    rows = q("q79_kmv_set_algebra").collect()
    assert len(rows) == 10  # C(5 event types, 2)
    for r in rows:
        assert r.exact_inter <= r.exact_union
        assert r.est_union > 0
        # KMV k=64 -> RSE ~ 13%; allow a generous 3-sigma band
        assert abs(r.est_union - r.exact_union) / r.exact_union < 0.5, r
        if r.exact_inter > 0:
            assert abs(r.est_inter - r.exact_inter) / r.exact_inter < 0.8, r


# ---- d28 k-core ------------------------------------------------------------


def test_d28_bounded_peel_reached_fixpoint_and_core_property(q, spark, sf_dir):
    """Every surviving node must retain degree >= k inside the core, and
    on this corpus the bounded 4-round peel must already be the fixpoint
    (a fifth peel removes nothing)."""
    from dbt_osmosis_spark.operators.caching import keep_cached
    from dbt_osmosis_spark.operators.dedup import minhash_signatures, verified_pairs
    from dbt_osmosis_spark.operators.dedup_ext2 import _D28_K
    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = q("d28_kcore_hubs").collect()
    core = {r.doc_id for r in rows}
    for r in rows:
        assert r.core_degree >= _D28_K
    # fixpoint: recompute degrees inside the returned core directly
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    vp = verified_pairs(minhash_signatures(docs).transform(keep_cached)).collect()
    deg = {}
    for p in vp:
        if p.doc_a in core and p.doc_b in core:
            deg[p.doc_a] = deg.get(p.doc_a, 0) + 1
            deg[p.doc_b] = deg.get(p.doc_b, 0) + 1
    assert set(deg) == core
    assert all(d >= _D28_K for d in deg.values())
    # and the reported degrees are exactly the induced degrees
    assert {r.doc_id: r.core_degree for r in rows} == deg


# ---- q80 revenue bridge -----------------------------------------------------


def test_q80_bridge_reconciles_to_revenue_delta(q, spark, sf_dir):
    """The decomposition is an identity: volume + price + joint + rounding
    must equal the common-part revenue delta, and adding new/exited lines
    must equal the total period delta (all in exact cents)."""
    from dbt_osmosis_spark.operators.relational import t as _t
    from dbt_osmosis_spark.operators.relational_ext4 import _Q80_Y1, _Q80_Y2

    rows = {r.bridge_line: r.amount_cents for r in q("q80_revenue_bridge").collect()}
    li = _t(spark, sf_dir, "lineitem")
    per = (
        li.filter(F.expr(f"year(l_shipdate) IN ({_Q80_Y1}, {_Q80_Y2})"))
        .groupBy(F.col("l_partkey").alias("part"), F.expr("year(l_shipdate)").alias("y"))
        .agg(F.expr("CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)").alias("r"))
        .collect()
    )
    r1 = {p.part: p.r for p in per if p.y == _Q80_Y1}
    r2 = {p.part: p.r for p in per if p.y == _Q80_Y2}
    common = set(r1) & set(r2)
    common_delta = sum(r2[p] for p in common) - sum(r1[p] for p in common)
    decomposed = sum(rows[k] for k in ("1_volume", "2_price", "3_joint", "4_rounding"))
    # floor-division of the scaled lines loses < 1 cent per line
    assert abs(decomposed - common_delta) <= 4
    total_delta = sum(r2.values()) - sum(r1.values())
    assert abs(sum(rows.values()) - total_delta) <= 6


# ---- m14 shard integrity ----------------------------------------------------


def test_m14_checksum_detects_single_payload_change(spark, tmp_path):
    """Mutating ONE payload must change exactly its shard's checksum and
    no other row — the incremental-verification contract."""
    import pyspark.sql.functions as FF

    from dbt_osmosis_spark.sources.parquet import read_parquet

    base = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    base.write.parquet(f"{d1}/documents.parquet")
    victim = base.agg(FF.min("doc_id")).collect()[0][0]
    base.withColumn(
        "text",
        FF.when(FF.col("doc_id") == victim, FF.concat(FF.col("text"), FF.lit("X"))).otherwise(
            FF.col("text")
        ),
    ).write.parquet(f"{d2}/documents.parquet")
    m1 = {r.shard_id: r.shard_checksum for r in QUERIES["m14_shard_integrity_manifest"](spark, d1).collect()}
    m2 = {r.shard_id: r.shard_checksum for r in QUERIES["m14_shard_integrity_manifest"](spark, d2).collect()}
    # the +1 byte can shift shard boundaries only AT and AFTER the victim's
    # shard; shards before it must be untouched
    changed = [s for s in m1 if m1.get(s) != m2.get(s)]
    assert changed, "checksum failed to detect the mutation"
    assert min(changed) >= 0
    untouched = [s for s in m1 if s < min(changed)]
    for s in untouched:
        assert m1[s] == m2[s]


# ---- q81 compaction ---------------------------------------------------------


def test_q81_compaction_file_contract(q, spark, sf_dir):
    """Compaction must actually consolidate: far fewer files than the
    fragmented layout, sized near the target, and byte-complete (total
    rows preserved — the oracle already pins values)."""
    import glob

    from dbt_osmosis_spark.operators.relational_ext4 import (
        _Q81_FRAGMENTS,
        _Q81_TARGET_BYTES,
        _q81_paths,
    )

    q("q81_compaction").collect()  # runs the build
    frag, compacted = _q81_paths(sf_dir)
    frag_files = glob.glob(f"{frag}/part-*.parquet")
    comp_files = glob.glob(f"{compacted}/part-*.parquet")
    assert len(frag_files) == _Q81_FRAGMENTS
    frag_bytes = sum(map(__import__("os").path.getsize, frag_files))
    expect = max(1, -(-frag_bytes // _Q81_TARGET_BYTES))
    assert len(comp_files) == expect
    assert len(comp_files) < len(frag_files)
    n_frag = spark.read.parquet(frag).count()
    n_comp = spark.read.parquet(compacted).count()
    assert n_frag == n_comp


# ---- q82 session paths -------------------------------------------------------


def test_q82_paths_are_valid_type_trigrams(q):
    rows = q("q82_session_paths").collect()
    assert rows
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        parts = r.path3.split(">")
        assert len(parts) == 3 and all(p in types for p in parts)
        assert r.n_occurrences >= 1
    counts = [(-r.n_occurrences, r.path3) for r in rows]
    assert counts == sorted(counts)


# ---- t26 cross-doc n-gram share ----------------------------------------------


def test_t26_share_bounds_and_corpus_coverage(q, spark, sf_dir):
    rows = q("t26_crossdoc_ngram_share").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_repeated <= r.n_postings
        assert 0 <= r.repeated_bp <= 10000
    # total postings = total distinct 5-grams per doc across the corpus
    from dbt_osmosis_spark.operators.text import spark_shingles_sql, tokens
    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    n = (
        docs.withColumn("w", tokens())
        .filter(F.size("w") >= 5)
        .select(F.explode(F.expr(spark_shingles_sql("w", 5))).alias("g"))
        .count()
    )
    assert sum(r.n_postings for r in rows) == n


# ---- d29 modularity scoreboard -----------------------------------------------


def test_d29_modularity_bounds_and_methods(q):
    rows = {r.method: r for r in q("d29_modularity_scoreboard").collect()}
    assert set(rows) == {"cc", "lpa"}
    for r in rows.values():
        # Q in [-1/2, 1] -> bp in [-5000, 10000]
        assert -5000 <= r.q_bp <= 10000
        assert r.n_communities >= 1
    # LPA can only split CC components, never merge across them
    assert rows["lpa"].n_communities >= rows["cc"].n_communities


# ---- q83 KMV hierarchical merge ----------------------------------------------


def test_q83_merge_equals_direct_daily_sketch(q, spark, sf_dir):
    """The lossless-merge property itself: the estimate from merging
    hourly sketches must equal a DIRECT daily sketch's estimate exactly
    (k-min of union == k-min of unioned k-min sets)."""
    from pyspark.sql.window import Window as W

    from dbt_osmosis_spark.operators.relational import t as _t
    from dbt_osmosis_spark.operators.relational_ext3 import _Q69_SPARK_H
    from dbt_osmosis_spark.operators.relational_ext4 import _Q83_K, _Q83_SPACE

    rows = {r.day: r for r in q("q83_kmv_hierarchical_merge").collect()}
    e = _t(spark, sf_dir, "events")
    keys = e.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    hashed = keys.select("day", F.expr(_Q69_SPARK_H).alias("h")).distinct()
    rk = F.row_number().over(W.partitionBy("day").orderBy("h"))
    direct = (
        hashed.withColumn("rk", rk)
        .filter(F.col("rk") <= _Q83_K)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk"))
        .collect()
    )
    for d in direct:
        est = (
            float(d.n_kept)
            if d.n_kept < _Q83_K
            else (_Q83_K - 1) * _Q83_SPACE / d.hk
        )
        assert rows[d.day].merged_estimate == est, d.day
